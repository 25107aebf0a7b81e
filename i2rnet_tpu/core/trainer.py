"""Full training driver: epochs, DP mesh, validation, checkpointing.

The TPU-native equivalent of reference ``tools/ddp_train.py:101-263``:
* device mesh + batch sharding instead of process-group DDP,
* per-epoch cosine LR (optax schedule),
* AUTO_RESUME from the newest Orbax checkpoint,
* rank-0-style logging + TensorBoard scalars (tensorboardX),
* validate each epoch, track best AP, write model_best / final_state.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import numpy as np

from i2rnet_tpu.core.pretrained import (frozen_predicate_for_cfg,
                                        load_pretrained)
from i2rnet_tpu.core.train import make_train_step
from i2rnet_tpu.core.train_state import create_train_state, make_optimizer
from i2rnet_tpu.core.validate import validate
from i2rnet_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from i2rnet_tpu.registry import get_dataset_class, get_model_builder
from i2rnet_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint, save_final_state)
from i2rnet_tpu.utils.logging import AverageMeter, metric_table

logger = logging.getLogger(__name__)


def estimate_steps_per_epoch(dataset, batch_images: int) -> int:
    return max(1, len(dataset) // batch_images)


def train_loop(cfg, output_dir: str, tb_log_dir: Optional[str] = None,
               max_epochs: Optional[int] = None,
               max_steps_per_epoch: Optional[int] = None,
               validate_every: int = 1):
    """Run the training job described by ``cfg``. Returns final TrainState."""
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    batch_images = cfg.TRAIN.BATCH_SIZE_PER_GPU * n_dev
    logger.info("mesh: %s (%d devices), global batch %d images",
                mesh.devices.shape, n_dev, batch_images)

    ds_cls = get_dataset_class(cfg.DATASET.DATASET)
    train_ds = ds_cls(cfg, cfg.DATASET.ROOT, cfg.DATASET.TRAIN_SET, is_train=True)
    val_ds = ds_cls(cfg, cfg.DATASET.ROOT, cfg.DATASET.TEST_SET, is_train=False)

    model = get_model_builder(cfg.MODEL.NAME)(cfg)

    steps_per_epoch = estimate_steps_per_epoch(train_ds, batch_images)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    tx, sched = make_optimizer(cfg, steps_per_epoch)

    # init on a probe batch
    rng = np.random.RandomState(cfg.SEED)
    items, nb = next(train_ds.train_batches(min(2, batch_images), rng))
    raw, _ = train_ds.make_raw_batch(items, nb, rng)
    probe = train_ds.device_batch(raw)
    variables = model.init(jax.random.PRNGKey(cfg.SEED), probe["images"],
                           probe["pos_masks"], probe["person_valid"], train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # factory-time pretrained / first-stage loading (reference
    # transpose_h.py:691-706, interformer_pureMulti.py:816-821)
    variables = load_pretrained(cfg, variables)

    state = create_train_state(model, variables, tx,
                               frozen_predicate=frozen_predicate_for_cfg(cfg))

    begin_epoch = cfg.TRAIN.BEGIN_EPOCH
    best_perf = -1.0
    if cfg.AUTO_RESUME:
        ckpt = latest_checkpoint(output_dir)
        if ckpt:
            payload = load_checkpoint(ckpt, target={
                "epoch": 0, "perf": 0.0, "params": state.params,
                "batch_stats": state.batch_stats, "opt_state": state.opt_state,
                "step": 0, "meta": {"model": "", "train_global_steps": 0,
                                    "valid_global_steps": 0}})
            state = state.replace(params=payload["params"],
                                  batch_stats=payload["batch_stats"],
                                  opt_state=payload["opt_state"],
                                  step=payload["step"])
            begin_epoch = payload["epoch"] + 1
            best_perf = payload["perf"]
            logger.info("=> auto-resumed from %s (epoch %d)", ckpt, begin_epoch)

    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_train_step(model, tx, loss_weights=cfg.MODEL.LOSS_WEIGHTS,
                              use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT,
                              use_ohkm=cfg.LOSS.USE_OHKM, topk=cfg.LOSS.TOPK,
                              return_heatmaps=cfg.DEBUG.DEBUG,
                              frozen_predicate=frozen_predicate_for_cfg(cfg),
                              remat=cfg.TPU.REMAT)

    writer = None
    if tb_log_dir:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(tb_log_dir)
        except Exception:
            pass

    end_epoch = max_epochs if max_epochs is not None else cfg.TRAIN.END_EPOCH
    key = jax.random.PRNGKey(cfg.SEED + 1)
    global_step = int(state.step)

    with mesh:
        for epoch in range(begin_epoch, end_epoch):
            epoch_rng = np.random.RandomState(cfg.SEED + 1000 + epoch)
            loss_m, acc_m, batch_t = AverageMeter(), AverageMeter(), AverageMeter()
            pending = []
            t0 = time.time()

            def make_batch(idx, items, nb, _epoch=epoch):
                r = np.random.RandomState((cfg.SEED + 1) * 100003 + _epoch * 10007 + idx)
                raw, _ = train_ds.make_raw_batch(items, nb, r)
                return raw

            from i2rnet_tpu.data.prefetch import prefetch_batches
            # DistributedSampler analog: each host reads its interleaved
            # shard of the image db and feeds its local slice of the global
            # batch (reference tools/ddp_train.py:191-193)
            batches = prefetch_batches(
                train_ds.train_batches(batch_images // jax.process_count(),
                                       epoch_rng,
                                       shard_index=jax.process_index(),
                                       num_shards=jax.process_count()),
                make_batch, num_workers=max(0, cfg.WORKERS))
            for i, raw in enumerate(batches):
                if max_steps_per_epoch and i >= max_steps_per_epoch:
                    break
                batch = shard_batch(mesh, jax.tree_util.tree_map(
                    np.asarray, train_ds.device_batch(raw)))
                key, sub = jax.random.split(key)
                state, metrics = step_fn(state, batch, sub)
                # keep metrics on device; materializing every step would
                # force a host sync and serialize the input pipeline
                pending.append(metrics)
                batch_t.update(time.time() - t0)
                t0 = time.time()
                global_step += 1
                if i % cfg.PRINT_FREQ == 0:
                    for m in pending:
                        lv = float(m["loss"])
                        if not np.isfinite(lv):
                            # failure detection: halt before a NaN poisons
                            # the checkpoint chain (no reference equivalent)
                            raise FloatingPointError(
                                f"non-finite loss {lv} at epoch {epoch} step {i}")
                        loss_m.update(lv)
                        acc_m.update(float(m["acc"]))
                    pending.clear()
                    lr = float(sched(state.step))
                    logger.info(
                        "Epoch [%d][%d/%d] time %.3fs loss %.5f (%.5f) "
                        "acc %.3f (%.3f) lr %.2e",
                        epoch, i, steps_per_epoch, batch_t.avg,
                        loss_m.val, loss_m.avg, acc_m.val, acc_m.avg, lr)
                    if writer:
                        writer.add_scalar("train_loss", loss_m.val, global_step)
                        writer.add_scalar("train_acc", acc_m.val, global_step)
                    if cfg.DEBUG.DEBUG:
                        # reference function.py:100-102: debug image dumps
                        # every PRINT_FREQ steps
                        import os

                        from i2rnet_tpu.utils.vis import save_debug_images
                        dbg_dir = os.path.join(output_dir, "debug")
                        os.makedirs(dbg_dir, exist_ok=True)
                        sx = train_ds.image_width / train_ds.heatmap_width
                        sy = train_ds.image_height / train_ds.heatmap_height
                        meta_dbg = {
                            "joints": raw["joints_hm"] * np.array([sx, sy], np.float32),
                            "joints_vis": raw["joints_vis"][..., None],
                        }
                        save_debug_images(
                            cfg, batch, meta_dbg, batch["target"],
                            metrics["heatmaps_pred"],
                            os.path.join(dbg_dir, f"train_{epoch}_{i}"))

            for m in pending:  # drain metrics deferred past the last print
                loss_m.update(float(m["loss"]))
                acc_m.update(float(m["acc"]))
            pending.clear()

            perf = -1.0
            if (epoch + 1) % validate_every == 0:
                variables = {"params": state.params, "batch_stats": state.batch_stats}
                # sharded eval over the data axis — all chips participate,
                # improving on the reference's rank-0-only validation
                # (lib/core/function.py:106-107)
                name_value, perf = validate(cfg, val_ds, model, variables,
                                            output_dir, mesh=mesh)
                logger.info("\n%s", metric_table(name_value, cfg.MODEL.NAME))
                if writer:
                    for k, v in name_value.items():
                        writer.add_scalar(f"valid_{k}", v, epoch)

            is_best = perf > best_perf
            best_perf = max(best_perf, perf)
            save_checkpoint(output_dir, epoch, state, perf, is_best,
                            model_name=cfg.MODEL.NAME,
                            train_global_steps=global_step)
            logger.info("=> epoch %d done, perf %.4f (best %.4f)",
                        epoch, perf, best_perf)

    save_final_state(output_dir, state)
    if writer:
        writer.close()
    return state
