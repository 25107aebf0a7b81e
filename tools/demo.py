#!/usr/bin/env python
"""Single-image inference demo (reference ``demo.ipynb`` as a script).

Takes an image and one or more person boxes (or uses the whole image), runs
the flagship model, decodes keypoints, renders the skeletons.

Usage:
    python tools/demo.py --image img.jpg [--boxes x,y,w,h [x,y,w,h ...]]
        [--cfg experiment.yaml] [--checkpoint ckpt] [--out demo_out.jpg]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--boxes", nargs="*", default=None,
                   help="person boxes as x,y,w,h (default: whole image)")
    p.add_argument("--cfg", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="demo_out.jpg")
    args = p.parse_args()

    import jax

    from i2rnet_tpu.ops.decode import get_final_preds
    from i2rnet_tpu.ops.preprocess import device_preprocess
    from i2rnet_tpu.registry import get_model_builder
    from i2rnet_tpu.utils.vis import draw_skeleton

    if args.cfg:
        from i2rnet_tpu.config import load_config
        cfg = load_config(args.cfg)
    else:
        from i2rnet_tpu.presets import w48_pure_en6
        cfg = w48_pure_en6("coco")

    model = get_model_builder(cfg.MODEL.NAME)(cfg)

    img_bgr = cv2.imread(args.image)
    img = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    src_h, src_w = img.shape[:2]
    boxes = ([list(map(float, b.split(","))) for b in args.boxes]
             if args.boxes else [[0, 0, src_w, src_h]])

    iw, ih = cfg.MODEL.IMAGE_SIZE
    hw_, hh_ = cfg.MODEL.HEATMAP_SIZE
    n = len(boxes)
    from i2rnet_tpu.serving import boxes_to_person_meta
    centers, scales, affines, rects = boxes_to_person_meta(boxes, (iw, ih))

    from i2rnet_tpu.ops.preprocess import np_rotate_bound_resize_affine
    mask_aff = np_rotate_bound_resize_affine(src_w, src_h, 0.0, iw, ih)
    # border-saturate the ramp bounds (data-pipeline convention)
    rects[:, 0] = np.where(rects[:, 0] <= -1, -1e9, rects[:, 0])
    rects[:, 1] = np.where(rects[:, 1] <= -1, -1e9, rects[:, 1])
    rects[:, 2] = np.where(rects[:, 2] >= src_w, 1e9, rects[:, 2])
    rects[:, 3] = np.where(rects[:, 3] >= src_h, 1e9, rects[:, 3])
    raw = {
        "images": img[None],
        "crop_affines": affines[None],
        "boxes": rects[None],
        "mask_affines": np.broadcast_to(mask_aff, (n, 2, 3)).copy()[None],
        "joints_hm": np.zeros((1, n, cfg.MODEL.NUM_JOINTS, 2), np.float32),
        "joints_vis": np.zeros((1, n, cfg.MODEL.NUM_JOINTS), np.float32),
        "person_valid": np.ones((1, n), bool),
    }
    batch = device_preprocess(raw, (iw, ih), (hw_, hh_), cfg.MODEL.SIGMA)

    if args.checkpoint:
        if args.checkpoint.endswith(".pth"):
            from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint
            variables = convert_torch_checkpoint(args.checkpoint, cfg)
        else:
            from i2rnet_tpu.utils.checkpoint import load_variables
            variables = load_variables(args.checkpoint)
    else:
        print("warning: no checkpoint — random weights (demo plumbing only)")
        variables = model.init(jax.random.PRNGKey(0), batch["images"],
                               batch["pos_masks"], batch["person_valid"],
                               train=False)

    heat = model.apply(variables, batch["images"], batch["pos_masks"],
                       batch["person_valid"], train=False)["multi"]
    k = heat.shape[2]
    coords, maxvals = get_final_preds(
        np.asarray(heat).reshape(n, k, hh_, hw_),
        centers, scales,
        blur_kernel=cfg.TEST.BLUR_KERNEL, heatmap_size=(hw_, hh_))

    out = img_bgr.copy()
    for i in range(n):
        kp = np.concatenate([np.asarray(coords)[i], np.asarray(maxvals)[i]], axis=1)
        out = draw_skeleton(out, kp, conf_thresh=0.0 if not args.checkpoint else 0.2)
    cv2.imwrite(args.out, out)
    print(f"wrote {args.out}; keypoints:\n{np.asarray(coords)}")


if __name__ == "__main__":
    main()
