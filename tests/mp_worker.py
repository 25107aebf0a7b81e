"""Multi-process worker for the true multi-host validation tests.

Launched as ``python tests/mp_worker.py <mode> <pid> <nprocs> <port> <dir>``
by ``tests/test_multiprocess.py``. Each process brings 2 virtual CPU devices
(so 2 processes form a 4-device global mesh) and talks to its peers through
JAX's distributed runtime with gloo CPU collectives — the closest available
stand-in for a multi-host TPU pod (SURVEY.md §2.6: the DDP/NCCL analog).

Modes:
* ``train``     — 3 component-level sharded train steps on fixed synthetic
                  batches; dumps per-step losses + a param checksum per leaf.
* ``validate``  — full sharded ``validate`` over a synthetic COCO set;
                  dumps the metric dict.
* ``trainloop`` — end-to-end ``train_loop`` (per-host shard feeding, sharded
                  in-training validate, process-0-only checkpointing).
"""

import json
import os
import sys


def main():
    mode, pid, nprocs, port, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    # the axon sitecustomize pre-imports jax pinned to the TPU backend
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)

    import numpy as np

    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 2 * nprocs, jax.devices()

    out = {}
    if mode == "train":
        out = run_train(pid, nprocs)
    elif mode == "validate":
        out = run_validate(pid, workdir)
    elif mode == "trainloop":
        out = run_trainloop(pid, workdir)
    else:
        raise SystemExit(f"unknown mode {mode}")

    with open(os.path.join(workdir, f"result_{mode}_{pid}.json"), "w") as f:
        json.dump(out, f)
    # keep the distributed shutdown barrier tight: both processes reach
    # interpreter exit together regardless of host-side work skew
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mp_worker_done")
    print(f"proc {pid} mode {mode}: OK", flush=True)


def make_train_fixture(cfg, n_steps: int, batch_images: int):
    """Deterministic synthetic batches shared by every process and by the
    single-process oracle in the parent test."""
    import numpy as np

    w, h = cfg.MODEL.IMAGE_SIZE
    hw, hh = cfg.MODEL.HEATMAP_SIZE
    k = cfg.MODEL.NUM_JOINTS
    n = 2
    rng = np.random.RandomState(1234)
    batches = []
    for _ in range(n_steps):
        batches.append({
            "images": rng.rand(batch_images, n, h, w, 3).astype(np.float32),
            "pos_masks": (rng.rand(batch_images, n, h, w, 1) > 0.5)
            .astype(np.float32),
            "person_valid": rng.rand(batch_images, n) > 0.2,
            "target": rng.rand(batch_images, n, k, hh, hw).astype(np.float32),
            "target_weight": np.ones((batch_images, n, k), np.float32),
        })
    for b in batches:  # every item keeps at least one valid person
        b["person_valid"][:, 0] = True
    return batches


def train_steps(cfg, batches, mesh, local_slice=None):
    """Run the jitted train steps over ``mesh``; per-process local feeding
    when ``local_slice`` is given (the DDP data-shard contract)."""
    import jax
    import numpy as np
    import optax

    from i2rnet_tpu.core.train import make_train_step
    from i2rnet_tpu.core.train_state import create_train_state
    from i2rnet_tpu.parallel.mesh import replicated_sharding, shard_batch
    from i2rnet_tpu.registry import get_model_builder

    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    probe = jax.tree_util.tree_map(lambda x: x[:1], batches[0])
    variables = model.init(jax.random.PRNGKey(0), probe["images"],
                           probe["pos_masks"], probe["person_valid"],
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # SGD, not adam: adam's per-element normalization turns reduction-order
    # fp noise in near-zero grads into full-lr update differences, which
    # would make cross-process parity checks meaningless. Small lr keeps the
    # random-init + batch-stat-BN trajectory in the linear regime so fp
    # noise (CPU conv reductions are nondeterministic) cannot amplify.
    tx = optax.sgd(0.005)
    state = create_train_state(model, variables, tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_train_step(model, tx)

    losses = []
    with mesh:
        for i, batch in enumerate(batches):
            if local_slice is not None:
                batch = jax.tree_util.tree_map(
                    lambda x: x[local_slice], batch)
            sharded = shard_batch(mesh, batch)
            state, metrics = step_fn(state, sharded,
                                     jax.random.PRNGKey(100 + i))
            losses.append(float(metrics["loss"]))
    sums = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        sums[key] = float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    return losses, sums


def _tiny_cfg(root):
    from i2rnet_tpu.presets import tiny_test_config

    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TRAIN_SET = "val2017"
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1
    cfg.TEST.BATCH_SIZE_PER_GPU = 1
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.BLUR_KERNEL = 5
    cfg.WORKERS = 0
    cfg.PRINT_FREQ = 1
    cfg.AUTO_RESUME = False
    return cfg


def run_train(pid, nprocs):
    from i2rnet_tpu.parallel.mesh import make_mesh
    from i2rnet_tpu.presets import tiny_test_config

    cfg = tiny_test_config(num_joints=5).freeze()
    batch_images = 4
    batches = make_train_fixture(cfg, n_steps=3, batch_images=batch_images)
    per = batch_images // nprocs
    local = slice(pid * per, (pid + 1) * per)
    mesh = make_mesh()
    losses, sums = train_steps(cfg, batches, mesh, local_slice=local)
    return {"losses": losses, "param_sums": sums}


def run_validate(pid, workdir):
    import jax

    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.data.coco import COCODataset
    from i2rnet_tpu.parallel.mesh import make_mesh
    from i2rnet_tpu.registry import get_model_builder

    root = os.path.join(workdir, "data")
    cfg = _tiny_cfg(root).freeze()
    ds = COCODataset(cfg, root, "val2017", is_train=False)
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    items, nb = next(ds.eval_batches(2))
    raw, _ = ds.make_raw_batch(items, nb)
    probe = ds.device_batch(raw)
    variables = model.init(jax.random.PRNGKey(0), probe["images"],
                           probe["pos_masks"], probe["person_valid"],
                           train=False)
    mesh = make_mesh()
    out_dir = os.path.join(workdir, f"val_out_{pid}")
    os.makedirs(out_dir, exist_ok=True)
    name_value, perf = validate(cfg, ds, model, variables, out_dir, mesh=mesh)
    return {"name_value": {k: float(v) for k, v in name_value.items()},
            "perf": float(perf)}


def run_trainloop(pid, workdir):
    import jax
    import numpy as np

    from i2rnet_tpu.core.trainer import train_loop

    root = os.path.join(workdir, "data")
    cfg = _tiny_cfg(root).freeze()
    # SHARED output dir: checkpointing is collective (orbax multihost, every
    # process calls save, the primary writes); eval results go to per-process
    # subdirs inside validate
    out_dir = os.path.join(workdir, "loop_out")
    os.makedirs(out_dir, exist_ok=True)
    state = train_loop(cfg, out_dir, max_epochs=1, max_steps_per_epoch=2)
    flat, _ = jax.tree_util.tree_flatten(state.params)
    checksum = float(sum(np.sum(np.abs(np.asarray(x, np.float64))) for x in flat))
    return {"param_checksum": checksum, "step": int(state.step),
            "wrote_checkpoint": os.path.isdir(
                os.path.join(out_dir, "checkpoint")),
            "proc_results": sorted(
                p for p in os.listdir(out_dir) if p.startswith("proc"))}


if __name__ == "__main__":
    main()
