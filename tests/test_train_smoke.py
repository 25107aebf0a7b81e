"""Training smoke test: tiny model overfits a synthetic batch; loss drops."""

import jax
import numpy as np

from i2rnet_tpu.core.train import make_train_step
from i2rnet_tpu.core.train_state import create_train_state, make_optimizer
from i2rnet_tpu.data.coco import COCODataset
from i2rnet_tpu.data.synthetic import make_synthetic_coco
from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.registry import get_model_builder
import pytest

pytestmark = pytest.mark.slow


def test_train_loss_decreases(tmp_path):
    root = make_synthetic_coco(str(tmp_path), num_images=4, num_joints=5,
                               max_persons=2, image_set="val2017")
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.LR_END = 1e-3
    cfg = cfg.freeze()

    ds = COCODataset(cfg, root, "val2017", is_train=True)
    model = get_model_builder(cfg.MODEL.NAME)(cfg)

    rng = np.random.RandomState(0)
    items, nb = next(ds.train_batches(2, rng))
    raw, _ = ds.make_raw_batch(items, nb, rng)
    batch = jax.tree_util.tree_map(np.asarray, ds.device_batch(raw))

    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"], train=False)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, use_target_weight=True, donate=False)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_overfit_reaches_full_ap(tmp_path):
    """End-to-end learning proof: overfitting one synthetic batch drives
    evaluation AP (decode -> inverse transform -> NMS -> evaluator) to ~1."""
    import jax

    from i2rnet_tpu.core.validate import validate

    root = make_synthetic_coco(str(tmp_path / "d"), num_images=4, num_joints=5,
                               max_persons=2, image_set="val2017")
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TRAIN_SET = "val2017"
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.DATASET.FLIP = False
    cfg.DATASET.ROT_FACTOR = 0
    cfg.DATASET.SCALE_FACTOR = 0.0
    cfg.DATASET.PROB_HALF_BODY = 0.0
    cfg.TRAIN.LR = 2e-3
    cfg.TRAIN.LR_END = 2e-3
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BLUR_KERNEL = 5
    cfg = cfg.freeze()

    ds = COCODataset(cfg, root, "val2017", is_train=True)
    ds_eval = COCODataset(cfg, root, "val2017", is_train=False)
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    rng = np.random.RandomState(0)
    items, nb = next(ds.train_batches(4, rng))
    raw, _ = ds.make_raw_batch(items, nb, rng)
    batch = jax.tree_util.tree_map(np.asarray, ds.device_batch(raw))
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"], train=False)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False)
    key = jax.random.PRNGKey(1)
    # Convergence is reached well before step 300, but the per-step PCK on
    # this tiny batch is discrete (12 scored joints) and oscillates a notch
    # under fully-overfit chaos (measured 0.88..1.0 over steps 300-400, with
    # the exact trajectory sensitive to CPU-threaded reduction order), so
    # assert on the best late-phase step rather than one arbitrary step.
    tail_acc = 0.0
    for i in range(400):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        if i >= 300:
            tail_acc = max(tail_acc, float(metrics["acc"]))
    assert tail_acc > 0.9, f"best PCK over steps 300-400: {tail_acc}"

    vars_eval = {"params": state.params, "batch_stats": state.batch_stats}
    _, perf = validate(cfg, ds_eval, model, vars_eval, str(tmp_path / "o"),
                       batch_images=4)
    assert perf > 0.8, f"AP after overfit: {perf}"


def test_singleformer_fix_freezes_first_stage(tmp_path):
    """SINGLEFORMER_FIX: the first stage's params must not change under the
    optimizer mask (jax analog of requires_grad_(False))."""
    import jax

    from i2rnet_tpu.models.interformer import build_interformer

    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.NAME = "interformer"
    cfg.MODEL.SINGLEFORMER = "transpose_h"
    cfg.MODEL.SINGLEFORMER_FIX = True
    cfg.MODEL.INTER_SUPERVISION = True
    cfg.MODEL.ENCODER_LAYERS = 1
    cfg.MODEL.ENCODER_MULTI_LAYERS = 1
    cfg.MODEL.UPSAMPLE_TYPE = "deconv"
    cfg.MODEL.USE_MULTI_POS = False
    cfg.MODEL.POS_EMBEDDING = "sine"
    cfg = cfg.freeze()

    model = build_interformer(cfg, use_pallas=False)
    rng = np.random.RandomState(0)
    b, n, k = 1, 2, 5
    batch = {
        "images": rng.rand(b, n, 64, 48, 3).astype(np.float32),
        "pos_masks": (rng.rand(b, n, 64, 48, 1) > 0.5).astype(np.float32),
        "person_valid": np.ones((b, n), bool),
        "target": rng.rand(b, n, k, 16, 12).astype(np.float32),
        "target_weight": np.ones((b, n, k), np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"], train=False)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    frozen = lambda path: path and getattr(path[0], "key", "") == "singleformer"  # noqa: E731
    state = create_train_state(model, variables, tx, frozen_predicate=frozen)
    step = make_train_step(model, tx, donate=False)
    before = jax.tree_util.tree_map(np.asarray, state.params["singleformer"])
    before_head = np.asarray(state.params["final_layer"]["kernel"])
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    after = state.params["singleformer"]
    for (pa, a), (pb, bqq) in zip(
            jax.tree_util.tree_leaves_with_path(after),
            jax.tree_util.tree_leaves_with_path(before)):
        np.testing.assert_array_equal(np.asarray(a), bqq, err_msg=str(pa))
    assert not np.array_equal(np.asarray(state.params["final_layer"]["kernel"]),
                              before_head)


def test_singleformer_fix_stops_gradients(tmp_path):
    """SINGLEFORMER_FIX also severs the backward graph (stop_gradient),
    matching torch requires_grad_(False) semantics where the first-stage
    backward is never built (reference transpose_h.py:705-706): gradients
    w.r.t. every first-stage param are exactly zero, so XLA compiles no
    first-stage backward at all."""
    from i2rnet_tpu.core.train import compute_losses
    from i2rnet_tpu.models.interformer import build_interformer

    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.NAME = "interformer"
    cfg.MODEL.SINGLEFORMER = "transpose_h"
    cfg.MODEL.SINGLEFORMER_FIX = True
    cfg.MODEL.ENCODER_LAYERS = 1
    cfg.MODEL.ENCODER_MULTI_LAYERS = 1
    cfg.MODEL.USE_MULTI_POS = False
    cfg.MODEL.POS_EMBEDDING = "sine"
    cfg = cfg.freeze()

    model = build_interformer(cfg, use_pallas=False)
    rng = np.random.RandomState(0)
    b, n, k = 1, 2, 5
    batch = {
        "images": rng.rand(b, n, 64, 48, 3).astype(np.float32),
        "pos_masks": (rng.rand(b, n, 64, 48, 1) > 0.5).astype(np.float32),
        "person_valid": np.ones((b, n), bool),
        "target": rng.rand(b, n, k, 16, 12).astype(np.float32),
        "target_weight": np.ones((b, n, k), np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"],
                           train=False)

    def loss_fn(params):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["images"], batch["pos_masks"], batch["person_valid"],
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        loss, _ = compute_losses(outputs, batch, (0.5, 0.5), True)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    for path, g in jax.tree_util.tree_leaves_with_path(grads["singleformer"]):
        np.testing.assert_array_equal(np.asarray(g), 0.0, err_msg=str(path))
    # and the trainable inter stage still receives gradients
    assert float(np.abs(np.asarray(grads["final_layer"]["kernel"])).sum()) > 0


def test_frozen_stage_eval_mode_freezes_bn_stats(tmp_path):
    """TPU.FROZEN_STAGE_EVAL_MODE: with the knob on, a SINGLEFORMER_FIX
    frozen first stage runs in eval mode inside the train step — its BN
    running stats stop updating (and the fused eval kernels may carry the
    forward). Default off keeps torch train()-mode semantics: stats move."""
    from i2rnet_tpu.models.interformer import build_interformer

    def run(frozen_eval):
        cfg = tiny_test_config(num_joints=5).clone()
        cfg.MODEL.NAME = "interformer"
        cfg.MODEL.SINGLEFORMER = "transpose_h"
        cfg.MODEL.SINGLEFORMER_FIX = True
        cfg.MODEL.ENCODER_LAYERS = 1
        cfg.MODEL.ENCODER_MULTI_LAYERS = 1
        cfg.MODEL.USE_MULTI_POS = False
        cfg.MODEL.POS_EMBEDDING = "sine"
        cfg.TPU.FROZEN_STAGE_EVAL_MODE = frozen_eval
        cfg = cfg.freeze()
        model = build_interformer(cfg, use_pallas=False)
        rng = np.random.RandomState(0)
        b, n = 1, 2
        images = rng.rand(b, n, 64, 48, 3).astype(np.float32)
        pos = (rng.rand(b, n, 64, 48, 1) > 0.5).astype(np.float32)
        valid = np.ones((b, n), bool)
        variables = model.init(jax.random.PRNGKey(0), images, pos, valid,
                               train=False)
        _, mutated = model.apply(variables, images, pos, valid, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(1)})
        before = variables["batch_stats"]["singleformer"]
        after = mutated["batch_stats"]["singleformer"]
        diffs = jax.tree_util.tree_map(
            lambda a, bb: float(np.abs(np.asarray(a) - np.asarray(bb)).max()),
            after, before)
        return max(jax.tree_util.tree_leaves(diffs))

    assert run(frozen_eval=True) == 0.0      # stats frozen
    assert run(frozen_eval=False) > 0.0      # torch-faithful default


def test_remat_gradients_match(tmp_path):
    """TPU.REMAT on: gradients identical (rematerialization is semantics-free)."""
    import jax

    from i2rnet_tpu.core.loss import joints_mse_loss

    rng = np.random.RandomState(0)
    b, n, k = 1, 2, 5
    batch = {
        "images": rng.rand(b, n, 64, 48, 3).astype(np.float32),
        "pos_masks": (rng.rand(b, n, 64, 48, 1) > 0.5).astype(np.float32),
        "person_valid": np.ones((b, n), bool),
        "target": rng.rand(b, n, k, 16, 12).astype(np.float32),
        "target_weight": np.ones((b, n, k), np.float32),
    }

    grads = {}
    for remat in (False, True):
        cfg = tiny_test_config(num_joints=5).clone()
        cfg.TPU.REMAT = remat
        cfg = cfg.freeze()
        model = get_model_builder(cfg.MODEL.NAME)(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch["images"],
                               batch["pos_masks"], batch["person_valid"],
                               train=False)

        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                              batch["images"], batch["pos_masks"],
                              batch["person_valid"], train=False)
            return joints_mse_loss(out["multi"], batch["target"],
                                   batch["target_weight"], batch["person_valid"])

        grads[remat] = jax.grad(loss_fn)(variables["params"])

    for (pa, a), (_, bb) in zip(
            jax.tree_util.tree_leaves_with_path(grads[True]),
            jax.tree_util.tree_leaves_with_path(grads[False])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pa))
