"""Stress the host-side evaluator at COCO-val scale (VERDICT r4 item 8).

The reference runs its full evaluate() chain — rescoring, OKS-NMS, result
JSON write, pycocotools COCOeval, optional KeypointEvaluator crowd report —
after every validation epoch on the real val2017 set (~5k images, ~20k
detections after the detector stage; ``lib/dataset/coco.py:345-509``). Our
fixtures only ever scored <=400 images, so superlinear behavior anywhere in
``data/coco.py::evaluate`` -> ``ops/nms.py`` -> ``ops/cocoeval.py`` ->
``utils/detail_eval.py`` would be invisible. This tool synthesizes a result
set at real magnitude and times each phase.

Usage:  python tools/bench_eval_scale.py [--images 5000] [--dets-per-gt 1.4]
Prints a phase table and ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_fixture(root: str, num_images: int, rng: np.random.RandomState,
                  num_joints: int = 17, image_set: str = "val2017"):
    """Annotation JSON at val scale — no pixel files (evaluate never reads
    them). Person counts mimic COCO-val crowding: 1-8 per image."""
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        img_id = 200000 + i
        w, h = 640, 480
        images.append({"id": img_id, "file_name": f"{img_id:012d}.jpg",
                       "height": h, "width": w})
        for _ in range(int(rng.choice([1, 1, 2, 2, 3, 4, 6, 8]))):
            pw, ph = rng.randint(60, 200), rng.randint(120, 360)
            x0 = rng.randint(0, w - pw)
            y0 = rng.randint(0, h - ph)
            kps = []
            n_vis = 0
            for j in range(num_joints):
                vis = 2 if rng.rand() > 0.15 else 0
                kps.extend([int(x0 + rng.rand() * pw),
                            int(y0 + (j + 0.5) / num_joints * ph), vis])
                n_vis += bool(vis)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": n_vis,
                "bbox": [float(x0), float(y0), float(pw), float(ph)],
                "area": float(pw * ph), "iscrowd": 0})
            ann_id += 1
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    with open(os.path.join(root, "annotations",
                           f"person_keypoints_{image_set}.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person",
                                   "keypoints": [f"j{k}" for k in range(num_joints)],
                                   "skeleton": []}]}, f)
    return images, annotations


def synth_predictions(annotations, rng, dup_frac=0.4, noise_px=4.0,
                      num_joints=17):
    """One prediction per GT (near-correct) + ``dup_frac`` duplicates that
    OKS-NMS must suppress — the val-scale detector-output shape."""
    preds, boxes, img_ids = [], [], []
    for a in annotations:
        gt = np.asarray(a["keypoints"], np.float32).reshape(-1, 3)
        for jitter in ([noise_px] + ([2 * noise_px] if rng.rand() < dup_frac
                                     else [])):
            p = gt.copy()
            p[:, :2] += rng.randn(num_joints, 2) * jitter
            p[:, 2] = np.clip(0.85 + 0.1 * rng.randn(num_joints), 0.05, 1.0)
            preds.append(p)
            x, y, w, h = a["bbox"]
            c = np.array([x + w / 2, y + h / 2], np.float32)
            s = np.array([w / 200.0, h / 200.0], np.float32)
            boxes.append(np.array([c[0], c[1], s[0], s[1],
                                   float(w * h), 0.95], np.float32))
            img_ids.append(a["image_id"])
    return (np.stack(preds), np.stack(boxes), np.asarray(img_ids))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--detail", action="store_true",
                    help="also time the DETAIL_EVAL crowd report")
    args = ap.parse_args()

    from i2rnet_tpu.data.coco import COCODataset
    from i2rnet_tpu.presets import tiny_test_config

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        images, annotations = build_fixture(td, args.images, rng)
        preds, boxes, img_ids = synth_predictions(annotations, rng)
        t_build = time.perf_counter() - t0

        cfg = tiny_test_config(num_joints=17).clone()
        cfg.DATASET.DATASET = "coco"
        cfg.DATASET.TEST_SET = "val2017"
        cfg.TEST.DETAIL_EVAL = bool(args.detail)
        cfg = cfg.freeze()
        ds = COCODataset(cfg, td, "val2017", is_train=False)

        t0 = time.perf_counter()
        name_value, ap_val = ds.evaluate(cfg, preds, os.path.join(td, "out"),
                                         boxes, img_ids)
        t_eval = time.perf_counter() - t0

        # phase split: rerun scoring alone on the written result file
        res_file = os.path.join(td, "out", "results",
                                "keypoints_val2017_results.json")
        t0 = time.perf_counter()
        ds._score(res_file)
        t_score = time.perf_counter() - t0

        n_res = len(json.load(open(res_file)))

    print(f"images={args.images} gt={len(annotations)} dets={len(preds)} "
          f"kept={n_res}")
    print(f"fixture build    : {t_build:7.2f} s")
    print(f"evaluate() total : {t_eval:7.2f} s  "
          f"(rescoring+NMS+write+score{'+detail' if args.detail else ''})")
    print(f"  scoring alone  : {t_score:7.2f} s  (ops/cocoeval full protocol)")
    print(f"  NMS+write      : {t_eval - t_score:7.2f} s  (approx, by difference)")
    print(f"AP={ap_val:.4f}")
    print(json.dumps({
        "metric": "eval_wall_s_at_val_scale", "value": round(t_eval, 2),
        "unit": "s", "detail": {
            "images": args.images, "gt": len(annotations),
            "detections": int(len(preds)), "kept": n_res,
            "score_s": round(t_score, 2),
            "nms_write_s": round(t_eval - t_score, 2),
            "detail_eval": bool(args.detail), "ap": round(float(ap_val), 4),
        }}))


if __name__ == "__main__":
    main()
