"""Evaluation loop: sharded-model inference -> on-device decode -> AP.

Replaces reference ``lib/core/function.py:105-287`` (``validate``): the numpy
flip/blur/taylor hot loops run on device; accumulation mirrors the reference
buffers — all_preds [M, K, 3] (x, y, conf), all_boxes [M, 6] (center, scale,
area = prod(scale*200), score) over the *valid* persons of every batch.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import numpy as np

from i2rnet_tpu.core.train import make_eval_step
from i2rnet_tpu.data.prefetch import prefetch_batches
from i2rnet_tpu.ops.decode import get_final_preds

logger = logging.getLogger(__name__)


def validate(cfg, dataset, model, variables, output_dir: str,
             batch_images: Optional[int] = None, max_batches: Optional[int] = None,
             eval_step_fn=None, main_target: Optional[bool] = None,
             mesh=None):
    """Run full evaluation; returns (name_value dict, perf_indicator).

    ``eval_step_fn(variables, batch) -> heatmaps`` may be injected (tests use
    an oracle that returns the GT heatmaps to validate the decode/eval path).

    ``main_target`` replicates reference ``validate_main_target``
    (``lib/core/function.py:289-468``): each batch item is one target person
    plus its nearest neighbors, and only the target (person index 0) is
    scored. Defaults to PATCH_MODE == 'main_target', matching the dispatch in
    reference ``tools/test.py:159-164``.
    """
    if main_target is None:
        main_target = cfg.DATASET.PATCH_MODE == "main_target"
    if jax.process_count() > 1:
        # every process scores the full (gathered) result set; give each its
        # own results dir so the write->re-read in dataset.evaluate never
        # races across hosts sharing a filesystem
        import os
        output_dir = os.path.join(output_dir, f"proc{jax.process_index()}")
    if batch_images is None:
        batch_images = cfg.TEST.BATCH_SIZE_PER_GPU
        if mesh is not None:
            # per-chip batch size scales with the data axis, like the
            # reference's per-GPU TEST.BATCH_SIZE_PER_GPU under DDP
            batch_images *= int(mesh.shape.get("data", 1))
    blur_kernel = cfg.TEST.BLUR_KERNEL
    debug_dump = bool(cfg.DEBUG.DEBUG)
    # DEBUG image dumps need full heatmaps on the host, so debug mode uses
    # the unfused (heatmaps-out) eval step (reference function.py:240-241)
    fused_decode = eval_step_fn is None and not debug_dump
    if eval_step_fn is None and debug_dump:
        eval_step_fn = make_eval_step(
            model, flip_pairs=dataset.flip_pairs,
            flip_test=cfg.TEST.FLIP_TEST,
            shift_heatmap=False, decode=False)
    eval_step = eval_step_fn or make_eval_step(
        model,
        flip_pairs=dataset.flip_pairs,
        flip_test=cfg.TEST.FLIP_TEST,
        # cfg.TEST.SHIFT_HEATMAP is intentionally ignored: the reference's
        # validate() never applies the HRNet 1px shift even though the
        # released YAMLs set the key (lib/core/function.py:142-162)
        shift_heatmap=False,
        decode=True,
        blur_kernel=blur_kernel,
        heatmap_size=(dataset.heatmap_width, dataset.heatmap_height),
        post_process=cfg.TEST.POST_PROCESS,
    )

    all_preds, all_boxes, all_image_ids = [], [], []
    n_batches = 0
    t0 = time.time()
    persons_done = 0
    batches = (dataset.eval_batches_main_target(batch_images) if main_target
               else dataset.eval_batches(batch_images))

    # Pipeline depth for the fused path: keep up to this many dispatched
    # device batches in flight before materializing the oldest one's
    # keypoints, so the host assembles batch i+1 (and the runtime enqueues
    # it) while the device still runs batch i. Depth 0 = fully synchronous.
    pipeline_depth = max(0, int(cfg.TPU.get("EVAL_PIPELINE", 2)))
    in_flight: list = []

    def finish(entry):
        nonlocal persons_done
        coords, maxvals, valid, centers, scales, scores, image_ids, n = entry
        coords = np.asarray(coords)
        maxvals = np.asarray(maxvals)
        area = np.prod(scales * 200.0, axis=1)
        if main_target:
            # only the target person (index 0 of each item) is scored
            target_only = np.zeros_like(valid)
            target_only[0::n] = valid[0::n]
            valid = target_only
        sel = np.nonzero(valid)[0]
        preds = np.concatenate([coords, maxvals], axis=2)  # [b*n, K, 3]
        all_preds.append(preds[sel])
        all_boxes.append(np.stack([
            centers[sel, 0], centers[sel, 1],
            scales[sel, 0], scales[sel, 1],
            area[sel], scores[sel],
        ], axis=1))
        all_image_ids.extend(image_ids[sel].tolist())
        persons_done += len(sel)

    def assemble(_idx, items, n_bucket):
        # pad trailing partial batches so the static (B, N) shape is stable;
        # padded rows are marked invalid so they never reach the evaluator
        n_real = len(items)
        if n_real < batch_images:
            items = list(items) + [items[-1]] * (batch_images - n_real)
        raw, meta = dataset.make_raw_batch(items, n_bucket)
        if n_real < batch_images:
            raw["person_valid"][n_real:] = False
        return raw, meta

    workers = max(0, getattr(cfg, "WORKERS", 0))
    for raw, meta in prefetch_batches(batches, assemble, num_workers=workers):
        if mesh is not None:
            # shard eval over the data axis (replaces the reference's
            # rank-0-only validation, lib/core/function.py:106-107). Every
            # process assembles the identical global batch; each device
            # takes its rows.
            from i2rnet_tpu.parallel.mesh import shard_global_batch  # lazy
            raw = shard_global_batch(mesh, raw)
        batch = dataset.device_batch(raw)
        b, n = raw["person_valid"].shape
        centers = meta["center"].reshape(b * n, 2)
        scales = meta["scale"].reshape(b * n, 2)
        if fused_decode:
            # fully fused: model + flip test + DARK decode in one program;
            # only [P, K, 3] keypoints come back to the host
            coords, maxvals = eval_step(variables, batch, centers, scales)
            if mesh is not None and jax.process_count() > 1:
                # multi-host: the decoded keypoints are sharded across
                # processes; all-gather so every host accumulates the full
                # result set (vs the reference idling non-zero ranks)
                from i2rnet_tpu.parallel.mesh import gather_global
                coords, maxvals = gather_global(mesh, (coords, maxvals))
        else:
            heat = eval_step(variables, batch)  # [B, N, K, h, w] (test oracle)
            if mesh is not None and jax.process_count() > 1:
                from i2rnet_tpu.parallel.mesh import gather_global
                heat = gather_global(mesh, heat)
            k = heat.shape[2]
            flat_heat = np.asarray(heat).reshape(b * n, k, heat.shape[3], heat.shape[4])
            coords, maxvals = get_final_preds(
                flat_heat, centers, scales, blur_kernel=blur_kernel,
                heatmap_size=(dataset.heatmap_width, dataset.heatmap_height),
                post_process=cfg.TEST.POST_PROCESS)
            if (debug_dump and n_batches % max(cfg.PRINT_FREQ, 1) == 0
                    and jax.process_count() == 1):
                import os

                from i2rnet_tpu.utils.vis import save_debug_images
                dbg_dir = os.path.join(output_dir, "debug")
                os.makedirs(dbg_dir, exist_ok=True)
                sx = dataset.image_width / dataset.heatmap_width
                sy = dataset.image_height / dataset.heatmap_height
                meta_dbg = {
                    "joints": raw["joints_hm"] * np.array([sx, sy], np.float32),
                    "joints_vis": raw["joints_vis"][..., None],
                }
                save_debug_images(cfg, batch, meta_dbg, batch["target"], heat,
                                  os.path.join(dbg_dir, f"val_{n_batches}"))

        entry = (coords, maxvals, raw["person_valid"].reshape(b * n),
                 centers, scales, meta["score"].reshape(b * n),
                 meta["image_id"].reshape(b * n), n)
        if fused_decode and pipeline_depth > 0:
            in_flight.append(entry)
            if len(in_flight) > pipeline_depth:
                finish(in_flight.pop(0))
        else:
            finish(entry)

        n_batches += 1
        if max_batches is not None and n_batches >= max_batches:
            break

    for entry in in_flight:
        finish(entry)
    dt = time.time() - t0
    logger.info("validate: %d persons in %.1fs (%.1f persons/s incl. host IO)",
                persons_done, dt, persons_done / max(dt, 1e-9))

    all_preds = np.concatenate(all_preds, axis=0)
    all_boxes = np.concatenate(all_boxes, axis=0)
    name_value, perf = dataset.evaluate(cfg, all_preds, output_dir,
                                        all_boxes, all_image_ids)
    return name_value, perf
