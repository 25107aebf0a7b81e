"""Standalone golden-diff debug driver (not a test).

Replicates tests/test_golden_e2e.py's fixture but persists everything under
--out so the diff can be iterated on without re-running the torch overfit.
"""
import argparse
import json
import os
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def build(out):
    import torch
    from tests.ref_harness import (install_reference_stubs, patch_cuda_noop,
                                   reference_validate, build_reference_loader,
                                   overfit_reference_model)
    install_reference_stubs()
    patch_cuda_noop()

    data_root = os.path.join(out, "data")
    from i2rnet_tpu.data.synthetic import make_synthetic_coco
    if not os.path.exists(os.path.join(out, ".data_done")):
        make_synthetic_coco(data_root, num_images=6, num_joints=17,
                            max_persons=3, image_set="val2017")
        open(os.path.join(out, ".data_done"), "w").close()

    from i2rnet_tpu.presets import tiny_test_config
    cfg = tiny_test_config(num_joints=17).clone()
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = data_root
    cfg.DATASET.TEST_SET = "val2017"
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.BLUR_KERNEL = 5
    cfg.TEST.BATCH_SIZE_PER_GPU = 2
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.DETAIL_EVAL = False
    cfg.DEBUG.DEBUG = False
    cfg.PRINT_FREQ = 1000
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg = cfg.freeze()

    sd_path = os.path.join(out, "overfit_sd2.pt")
    torch.manual_seed(0)
    from models import interformer_pureMulti as ref_model_mod
    tmodel = ref_model_mod.get_pose_net(cfg, is_train=False)
    if os.path.exists(sd_path):
        tmodel.load_state_dict(torch.load(sd_path, weights_only=False))
        print("[dbg] loaded cached overfit state dict")
    else:
        _, fit_loader = build_reference_loader(cfg, data_root, batch_size=2)
        from i2rnet_tpu.data.coco import COCODataset
        fit_loss = overfit_reference_model(
            cfg, tmodel, fit_loader, flip_pairs=COCODataset.flip_pairs,
            lr_schedule=[(3e-3, 600), (1e-3, 600), (3e-4, 300)])
        print(f"[dbg] overfit loss: {fit_loss:.6f}")
        torch.save(tmodel.state_dict(), sd_path)
    tmodel.eval()

    import jax  # noqa
    from i2rnet_tpu.convert.torch_import import convert_state_dict
    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.data.coco import COCODataset
    from i2rnet_tpu.registry import get_model_builder

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables, unmatched = convert_state_dict(sd, "interformer_pureMulti")
    assert not [u for u in unmatched if u != "pos_embedding"], unmatched

    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    dataset = COCODataset(cfg, data_root, "val2017", is_train=False)
    our_out = os.path.join(out, "our_out")
    name_value, our_ap = validate(cfg, dataset, model, variables, our_out)
    our_res_file = os.path.join(our_out, "results",
                                "keypoints_val2017_results.json")

    import cv2 as _cv2
    _real_imread = _cv2.imread
    _cv2.imread = (lambda p, flags=_cv2.IMREAD_COLOR:
                   _real_imread(p, flags).astype(np.float32) / 255.0)
    try:
        ref_out = os.path.join(out, "ref_out")
        ref_ap, ref_res_file = reference_validate(cfg, data_root, tmodel,
                                                  ref_out, batch_size=2)
    finally:
        _cv2.imread = _real_imread

    print(f"[dbg] ref_ap={ref_ap:.6f} our_ap={our_ap:.6f}")
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(dict(ref_ap=float(ref_ap), our_ap=float(our_ap),
                       ref_res_file=ref_res_file,
                       our_res_file=our_res_file), f)


def diff(out):
    with open(os.path.join(out, "summary.json")) as f:
        s = json.load(f)
    with open(s["ref_res_file"]) as f:
        ref = json.load(f)
    with open(s["our_res_file"]) as f:
        ours = json.load(f)
    print(f"ref entries={len(ref)} ours={len(ours)} "
          f"ref_ap={s['ref_ap']:.6f} our_ap={s['our_ap']:.6f}")

    def key(r):
        c = r.get("center", [0, 0])
        return (r["image_id"], round(float(c[0]), 1), round(float(c[1]), 1))

    ia, ib = {}, {}
    for r in ref:
        ia.setdefault(key(r), []).append(r)
    for r in ours:
        ib.setdefault(key(r), []).append(r)
    only_ref = set(ia) - set(ib)
    only_ours = set(ib) - set(ia)
    if only_ref:
        print("ONLY REF:", sorted(only_ref))
    if only_ours:
        print("ONLY OURS:", sorted(only_ours))
    for k in sorted(set(ia) & set(ib)):
        for ea, eb in zip(ia[k], ib[k]):
            ka = np.asarray(ea["keypoints"], np.float64).reshape(-1, 3)
            kb = np.asarray(eb["keypoints"], np.float64).reshape(-1, 3)
            dxy = np.abs(ka[:, :2] - kb[:, :2]).max()
            dconf = np.abs(ka[:, 2] - kb[:, 2]).max()
            ds = abs(ea["score"] - eb["score"])
            flag = " <<<<" if dxy > 0.05 else ""
            print(f"{k}: n_ref={len(ia[k])} n_ours={len(ib[k])} "
                  f"dxy={dxy:.4f} dconf={dconf:.5f} dscore={ds:.5f}{flag}")
            if dxy > 1.0:
                print("  ref kp xy:", np.round(ka[:4], 2).tolist())
                print("  our kp xy:", np.round(kb[:4], 2).tolist())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/golden_dbg")
    ap.add_argument("--skip-build", action="store_true")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    if not a.skip_build:
        build(a.out)
    diff(a.out)
