"""Golden end-to-end pipeline diff against the ACTUAL reference implementation.

VERDICT r3 item 1: module-level parity ("every module matches") is not the
same claim as product-level parity ("the pipeline matches"). This test runs
the reference's own eval chain — ``tools/test.py:126-165`` ->
``core/function.py:105-287`` (``validate``) -> ``core/inference.py:90-112``
(DARK decode) -> ``dataset/coco.py:345-509`` (rescoring, OKS-NMS, result
JSON, COCO AP) — with the real torch modules from ``/root/reference/lib`` on
the synthetic COCO fixture, exports the SAME weights through the converter,
runs OUR eval chain (``core/validate.py`` + ``data/coco.py``) on the SAME
images, and diffs the two result JSONs entry by entry (the reference's own
golden mechanism, ``trans_json.py:16-41``) plus the final AP.

Both sides score with our from-scratch ``ops/cocoeval`` (the reference's
pycocotools is stubbed onto it), so the AP comparison isolates the
*pipeline* (patch grouping -> host/device warps -> forward -> flip test ->
decode -> inverse affine -> rescoring -> NMS), not the evaluator.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, pytest.mark.parity]


# Eight product configurations through the SAME product-level diff:
# * pure_multi — the vanilla I²R-Net (single forward path, conv PE);
# * tph_two_stage — the flagship two-stage recipe (TransPose-H first stage
#   -> InterFormer, sine PE, deconv upsample, INTER_SUPERVISION dict
#   output), whose pipeline semantics (dict 'multi' selection in
#   function.py:138/154, two-stage flip test) module-level parity alone
#   does not cover;
# * hrt_two_stage — the HRFormer two-stage recipe (tiny HRT arch on both
#   sides, drop_path 0) covering the glue no module-level parity test
#   reaches: repeated 3x3/s2 max-pool down to TRANS_SIZE
#   (interformer.py:260-264/290), log2-chained stride-2 deconv upsample
#   (interformer.py:67-127), first-stage residual add (:314-315), and the
#   converter's singleformer.backbone.* HRT routing;
# * detector_boxes — the detector eval branch (TEST.USE_GT_BBOX=False):
#   detections JSON -> IMAGE_THRE filter (lib/dataset/coco.py:319) ->
#   single-person records -> rescoring -> OKS-NMS with REAL duplicate
#   detections that must be suppressed identically on both sides
#   (coco.py:377-412);
# * crowdpose — the CrowdPose product (r5): 14-joint skeleton + sigmas,
#   crowdpose file layout (json/crowdpose_test.json, flat images/{id}.jpg),
#   the 6-digit image-id parse (crowdpose.py:351), oks_nms with
#   num_joints=14 (crowdpose.py:379-387), and the crowdposetools protocol
#   (AP easy/medium/hard crowdIndex bands, crowdpose.py:461-489);
# * tph_2stage — the legacy two-stage model backing the released
#   interformer_coco_tph_192_p4_b4.yaml (NAME interformer_2stage): its own
#   DETR-encoder copies, pool_or_deconv upsampling and the DOMAIN_TRANS
#   1x1-conv residual pair (interformer_2stage.py:277-279,413-416),
#   product-diffed through the full eval chain (module-level parity:
#   tests/test_torch_parity.py::test_interformer_2stage_forward_parity);
# * ochuman — the OCHuman product (r5): image_set naming the annotation
#   JSON directly (root/{set}, ochuman.py:116-125), flat 6-digit image
#   paths (ochuman.py:253-259) and the [-10:-4] id parse (ochuman.py:330),
#   17-joint COCO protocol on overlapping-person fixtures, and the
#   unconditional scoring quirk (the reference's 'test'-skip guard is
#   commented out, ochuman.py:371-383 — our _skip_scoring override);
# * main_target — validate_main_target (function.py:289-468) vs our
#   validate(main_target=True): per-person nearest-neighbor groups with the
#   target first (collater.py:35-46), only person 0 of each group scored.
#   NOTE the shipped test.py:139 passes collater(0, ...) whose max_patch=0
#   never splits, which shape-crashes validate_main_target on multi-person
#   GT eval (function.py:400-404); this family drives the collater as the
#   commented-out test.py:138 (and the train path, train.py:144) construct
#   it — max_patch=cfg.DATASET.MAX_PATCH — the configuration the
#   main_target branch was written for.
@pytest.fixture(scope="module",
                params=[pytest.param("pure_multi",
                                     marks=pytest.mark.parity_core),
                        "tph_two_stage", "hrt_two_stage", "tph_2stage",
                        "detector_boxes", "crowdpose", "ochuman",
                        "main_target"])
def golden(request, tmp_path_factory):
    """Run both pipelines once per family; tests assert on different facets."""
    family = request.param
    from tests.ref_harness import (install_reference_stubs, patch_cuda_noop,
                                   reference_validate)
    install_reference_stubs()
    patch_cuda_noop()

    root = tmp_path_factory.mktemp("golden")
    data_root = str(root / "data")
    if family == "crowdpose":
        from i2rnet_tpu.data.synthetic import make_synthetic_crowdpose
        make_synthetic_crowdpose(data_root, num_images=6, max_persons=3,
                                 image_set="test")
        num_joints, test_set, ds_name = 14, "test", "crowdpose"
    elif family == "ochuman":
        from i2rnet_tpu.data.synthetic import make_synthetic_ochuman
        # the released naming: *_test_range_*.json WITH public GT — drives
        # the unconditional-scoring quirk on both sides
        ann_name = "ochuman_coco_format_test_range_0.00_1.00.json"
        make_synthetic_ochuman(data_root, num_images=6, max_persons=3,
                               ann_name=ann_name)
        num_joints, test_set, ds_name = 17, ann_name, "OCHuman"
    else:
        from i2rnet_tpu.data.synthetic import make_synthetic_coco
        make_synthetic_coco(data_root, num_images=6, num_joints=17,
                            max_persons=3, image_set="val2017")
        num_joints, test_set, ds_name = 17, "val2017", "coco"

    from i2rnet_tpu.presets import tiny_test_config
    cfg = tiny_test_config(num_joints=num_joints).clone()
    cfg.MODEL.INIT_WEIGHTS = False
    if family == "tph_two_stage":
        # Tiny two-stage arch, mirroring the released recipe's knobs
        # (experiments/coco/interformer/*TransPoseH*.yaml) at test scale —
        # same settings the module-level parity test uses
        # (tests/test_torch_parity.py::test_interformer_tph_forward_parity).
        cfg.MODEL.NAME = "interformer"
        cfg.MODEL.SINGLEFORMER = "transpose_h"
        cfg.MODEL.ENCODER_LAYERS = 1
        cfg.MODEL.ENCODER_MULTI_LAYERS = 1
        cfg.MODEL.UPSAMPLE_TYPE = "deconv"
        cfg.MODEL.USE_MULTI_POS = False
        cfg.MODEL.POS_EMBEDDING = "sine"
        cfg.MODEL.HRNET_RES_LAYER = 0
        cfg.MODEL.INTER_SUPERVISION = True
    if family == "tph_2stage":
        # the released interformer_coco_tph_192_p4_b4.yaml composition at
        # test scale, mirroring test_interformer_2stage_forward_parity;
        # DOMAIN_TRANS=True drives the 1x1-conv residual pair through the
        # product chain
        cfg.MODEL.NAME = "interformer_2stage"
        cfg.MODEL.SINGLEFORMER = "transpose_h"
        cfg.MODEL.ENCODER_LAYERS = 1
        cfg.MODEL.ENCODER_MULTI_LAYERS = 2
        cfg.MODEL.UPSAMPLE_TYPE = "deconv"
        cfg.MODEL.USE_MULTI_POS = False
        cfg.MODEL.POS_EMBEDDING = "sine"
        cfg.MODEL.HRNET_RES_LAYER = 0
        cfg.MODEL.INTER_SUPERVISION = True
        cfg.MODEL.DOMAIN_TRANS = True
    golden_hrt_arch = None
    if family == "hrt_two_stage":
        # Tiny HRT two-stage, mirroring the released recipe's knobs
        # (experiments/coco/interformer_coco_hrt_192_p2_b12.yaml) at test
        # scale: 4x max-pool to TRANS_SIZE, 2 chained stride-2 deconvs
        # back up, INTER_SUPERVISION dict output. drop_path 0 so the
        # overfit is deterministic.
        from tests.test_hrformer import TINY_ARCH
        golden_hrt_arch = {**TINY_ARCH, "drop_path_rate": 0.0}
        cfg.MODEL.NAME = "interformer"
        cfg.MODEL.SINGLEFORMER = "hrformer"
        cfg.MODEL.SINGLEFORMER_FIX = False
        cfg.MODEL.ENCODER_MULTI_LAYERS = 1
        cfg.MODEL.UPSAMPLE_TYPE = "deconv"
        cfg.MODEL.USE_MULTI_POS = False
        cfg.MODEL.POS_EMBEDDING = "sine"
        cfg.MODEL.INTER_SUPERVISION = True
    cfg.DATASET.DATASET = ds_name
    cfg.DATASET.ROOT = data_root
    cfg.DATASET.TEST_SET = test_set
    if family == "main_target":
        cfg.DATASET.PATCH_MODE = "main_target"
        cfg.DATASET.MAX_PATCH = 2
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.BLUR_KERNEL = 5       # odd, < heatmap size (12x16)
    cfg.TEST.BATCH_SIZE_PER_GPU = 2
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.DETAIL_EVAL = False
    cfg.DEBUG.DEBUG = False
    cfg.PRINT_FREQ = 1000
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    if family == "detector_boxes":
        # The overfit below needs GT joints, so fit on the GT-box config
        # and point only the two eval runs at the detections file.
        fit_cfg = cfg.clone().freeze()
        from i2rnet_tpu.data.synthetic import make_synthetic_detections
        det_file = make_synthetic_detections(data_root, image_set="val2017")
        cfg.TEST.USE_GT_BBOX = False
        cfg.TEST.COCO_BBOX_FILE = det_file
        cfg.TEST.IMAGE_THRE = 0.3   # the 0.1-score dets must be filtered
        cfg = cfg.freeze()
    else:
        cfg = cfg.freeze()
        fit_cfg = cfg

    # ---- reference side: real torch modules, real host pipeline ----
    # A randomly-initialized net's heatmaps are noise: argmax is unstable
    # under 1e-3 forward differences and AP is 0 on both sides. Overfit the
    # fixture first (reference JointsMSELoss + Adam, deterministic) so the
    # decode pipeline operates on real peaks — as it would with released
    # checkpoints.
    from tests.ref_harness import (build_reference_loader,
                                   overfit_reference_model)
    torch.manual_seed(0)
    if family in ("tph_two_stage", "hrt_two_stage"):
        from models import interformer as ref_model_mod
    elif family == "tph_2stage":
        from models import interformer_2stage as ref_model_mod
    else:
        from models import interformer_pureMulti as ref_model_mod
    main_target = family == "main_target"
    if family == "hrt_two_stage":
        # The reference's models.hrformer.get_pose_net hardcodes the
        # HRFormer-B extra (hrformer.py:2487-2533) — far too big to overfit
        # on CPU. Substitute the tiny arch through the same wrapper
        # (HRFormer(extra, head_in, num_joints, 0), hrformer.py:2470-2480)
        # the two-stage constructor eval()s (interformer.py:139-141).
        import models.hrformer as ref_hrf
        ref_extra = {"drop_path_rate": 0.0,
                     "stage1": dict(num_modules=1, num_branches=1,
                                    block="BOTTLENECK", num_blocks=(2,),
                                    num_channels=(64,), num_heads=[2],
                                    num_mlp_ratios=[4])}
        for s in ("stage2", "stage3", "stage4"):
            c = dict(golden_hrt_arch[s])
            c["block"] = "TRANSFORMER_BLOCK"
            ref_extra[s] = c
        mp_ref = pytest.MonkeyPatch()
        mp_ref.setattr(
            ref_hrf, "get_pose_net",
            lambda c, is_train, model_path, e2e: ref_hrf.HRFormer(
                ref_extra, 16, c.MODEL.NUM_JOINTS, 0))
        try:
            tmodel = ref_model_mod.get_pose_net(cfg, is_train=False)
        finally:
            mp_ref.undo()
    else:
        tmodel = ref_model_mod.get_pose_net(cfg, is_train=False)
    _, fit_loader = build_reference_loader(fit_cfg, data_root, batch_size=2,
                                           dataset_name=ds_name)
    # Flip-equivariant schedule: without it the flip-test average has twin
    # peaks and the decode sits on an argmax knife edge; without the long
    # tail joints 13/14 stay near-flat (conf ~0.2) and DARK's Taylor step
    # divides by a near-singular Hessian (reference coordinates come out at
    # thousands of px — in BOTH implementations). With it every joint
    # carries a sharp peak and the fixture AP is ~0.56 on both sides.
    from i2rnet_tpu.registry import get_dataset_class
    ds_cls = get_dataset_class(ds_name)
    fit_loss = overfit_reference_model(
        fit_cfg, tmodel, fit_loader, flip_pairs=ds_cls.flip_pairs,
        lr_schedule=[(3e-3, 600), (1e-3, 600), (3e-4, 300)])
    print(f"\n[golden] overfit loss: {fit_loss:.6f}")
    tmodel.eval()

    # ---- our side: converted weights, TPU-native pipeline ----
    import jax

    from i2rnet_tpu.convert.torch_import import convert_state_dict
    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.registry import get_model_builder

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables, unmatched = convert_state_dict(sd, cfg.MODEL.NAME)
    assert not [u for u in unmatched if u != "pos_embedding"], unmatched

    if family == "hrt_two_stage":
        # build the first stage at the same tiny arch; the singleformer
        # module is resolved from the registry at build time
        import functools

        from i2rnet_tpu.models.hrformer import build_hrformer
        from i2rnet_tpu.registry import MODEL_REGISTRY
        mp_reg = pytest.MonkeyPatch()
        mp_reg.setitem(MODEL_REGISTRY, "hrformer",
                       functools.partial(build_hrformer, arch=golden_hrt_arch))
        try:
            model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
        finally:
            mp_reg.undo()
    else:
        model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    dataset = ds_cls(cfg, data_root, test_set, is_train=False)
    our_out = str(root / "our_out")
    name_value, our_ap = validate(cfg, dataset, model, variables, our_out)
    our_res_file = os.path.join(our_out, "results",
                                f"keypoints_{test_set}_results.json")

    # ---- reference eval run ----
    # cv2.warpAffine re-quantizes uint8 inputs to uint8 AFTER interpolation
    # — a ±0.5/255 noise floor cv2 adds that our float device warp does not
    # have (and should not copy). Feed the reference float pixels for the
    # diff so both pipelines interpolate the same underlying uint8 image in
    # float; everything else runs the reference's code verbatim.
    import cv2 as _cv2
    mp = pytest.MonkeyPatch()
    _real_imread = _cv2.imread
    mp.setattr(_cv2, "imread",
               lambda p, flags=_cv2.IMREAD_COLOR:
               _real_imread(p, flags).astype(np.float32) / 255.0)
    try:
        ref_out = str(root / "ref_out")
        ref_ap, ref_res_file, ref_name_value = reference_validate(
            cfg, data_root, tmodel, ref_out, batch_size=2,
            dataset_name=ds_name, main_target=main_target,
            collater_max_patch=cfg.DATASET.MAX_PATCH if main_target else 0)
    finally:
        mp.undo()

    with open(ref_res_file) as f:
        ref_results = json.load(f)
    with open(our_res_file) as f:
        our_results = json.load(f)
    return dict(cfg=cfg, family=family, ref_ap=float(ref_ap),
                our_ap=float(our_ap),
                ref_name_value=ref_name_value, our_name_value=dict(name_value),
                ref_results=ref_results, our_results=our_results,
                ref_res_file=ref_res_file, our_res_file=our_res_file)


def _index(results):
    """Match key: (image_id, center) — the reference trans_json semantics."""
    idx = {}
    for r in results:
        c = r.get("center", [0, 0])
        key = (r["image_id"], round(float(c[0]), 1), round(float(c[1]), 1))
        idx.setdefault(key, []).append(r)
    return idx


def test_golden_result_json_entrywise(golden):
    """Every reference result entry has a counterpart with near-identical
    keypoint coordinates and rescored score."""
    ia, ib = _index(golden["ref_results"]), _index(golden["our_results"])
    assert set(ia.keys()) == set(ib.keys()), (
        f"entry sets differ: only-ref={set(ia) - set(ib)} "
        f"only-ours={set(ib) - set(ia)}")

    max_xy, max_conf, max_score = 0.0, 0.0, 0.0
    xy_deltas = []
    n = 0
    for key, ea_list in ia.items():
        eb_list = ib[key]
        assert len(ea_list) == len(eb_list), key
        for ea, eb in zip(ea_list, eb_list):
            ka = np.asarray(ea["keypoints"], np.float64).reshape(-1, 3)
            kb = np.asarray(eb["keypoints"], np.float64).reshape(-1, 3)
            d = np.abs(ka[:, :2] - kb[:, :2]).max(axis=1)
            xy_deltas.extend(d.tolist())
            max_xy = max(max_xy, float(d.max()))
            max_conf = max(max_conf, float(np.abs(ka[:, 2] - kb[:, 2]).max()))
            max_score = max(max_score, abs(ea["score"] - eb["score"]))
            n += 1
    xy_deltas = np.asarray(xy_deltas)
    print(f"\n[golden] {n} matched entries / {xy_deltas.size} joints; "
          f"max |xy delta| = {max_xy:.4f} px "
          f"(mean {xy_deltas.mean():.4f}, p90 {np.percentile(xy_deltas, 90):.4f}), "
          f"max |conf delta| = {max_conf:.5f}, max |score delta| = {max_score:.5f}")
    # Tolerance floor, measured (r4): on BIT-IDENTICAL inputs the two conv
    # stacks (torch CPU vs XLA) disagree by up to 8e-3 in heatmap value with
    # overfit weights — while the two warps agree to 7e-5 — so the xy bound
    # is the DARK decode's sensitivity to ~1e-2 heatmap noise, not pipeline
    # drift. Pipeline-level bugs this test exists to catch (patch grouping,
    # flip/shift semantics, affine frames, rescoring) show up as >=1
    # heatmap-pixel (4 px) systematic shifts; 1.5 px max / 0.3 px mean is
    # far below that and far above the f32 noise floor.
    assert max_xy < 1.5
    assert float(xy_deltas.mean()) < 0.3
    assert max_conf < 1e-2
    assert max_score < 2e-3


def test_golden_ap_equal(golden):
    """Final AP of the full product agrees to 1e-3 (same evaluator on both
    sides; any pipeline drift would cross OKS thresholds discretely)."""
    print(f"\n[golden] reference AP={golden['ref_ap']:.6f} "
          f"ours AP={golden['our_ap']:.6f}")
    assert golden["ref_ap"] > 0.3  # the fixture must carry real peaks
    assert abs(golden["ref_ap"] - golden["our_ap"]) < 1e-3


def test_golden_crowdpose_bands(golden):
    """CrowdPose only: the reference's own name_value table (through the
    crowdposetools stats layout, crowdpose.py:480-489) agrees with ours on
    every band — including AP (easy)/(medium)/(hard) stratified by
    crowdIndex."""
    if golden["family"] != "crowdpose":
        pytest.skip("crowdpose-only facet")
    ref_nv, our_nv = golden["ref_name_value"], golden["our_name_value"]
    keys = ["AP", "Ap .5", "AP .75", "AR", "AR .5", "AR .75",
            "AP (easy)", "AP (medium)", "AP (hard)"]
    assert set(keys) <= set(ref_nv), sorted(ref_nv)
    assert set(keys) <= set(our_nv), sorted(our_nv)
    print("\n[golden] crowdpose bands: " + ", ".join(
        f"{k}: ref={ref_nv[k]:.4f} ours={our_nv[k]:.4f}" for k in keys))
    for k in keys:
        assert abs(float(ref_nv[k]) - float(our_nv[k])) < 1e-3, k
    # the band stratification must be non-degenerate: at least two bands
    # carry detections (fixture cycles crowdIndex through all three)
    bands = [float(ref_nv[k]) for k in ("AP (easy)", "AP (medium)",
                                        "AP (hard)")]
    assert sum(b >= 0 for b in bands) >= 2, bands


def test_golden_trans_json_tool(golden):
    """The ported diff tool itself (tools/trans_json.py) passes on the pair."""
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools", "trans_json.py"),
         golden["ref_res_file"], golden["our_res_file"], "--atol", "1.5"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout
