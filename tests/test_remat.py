"""TPU.REMAT rematerialization: identical math, less activation memory.

``jax.checkpoint`` (dots/full, step level) and ``nn.remat`` (layers, inside
the inter encoder) change WHERE activations come from in the backward pass
(recompute vs HBM), never their values — so a train step under any REMAT
setting must reproduce the default step's loss, params, and batch_stats
exactly (same rng streams, same math).
"""

import jax
import numpy as np
import pytest

from i2rnet_tpu.core.train import _remat_wrap, make_train_step
from i2rnet_tpu.core.train_state import create_train_state, make_optimizer
from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.registry import get_model_builder


def _tiny_batch(cfg, b=2, n=2):
    k = cfg.MODEL.NUM_JOINTS
    w, h = cfg.MODEL.IMAGE_SIZE
    hw, hh = cfg.MODEL.HEATMAP_SIZE
    rng = np.random.RandomState(0)
    valid = np.ones((b, n), bool)
    valid[-1, -1] = False  # one padded slot, so masking is exercised
    return {
        "images": rng.rand(b, n, h, w, 3).astype(np.float32),
        "pos_masks": (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32),
        "person_valid": valid,
        "target": rng.rand(b, n, k, hh, hw).astype(np.float32),
        "target_weight": np.ones((b, n, k), np.float32),
    }


def _one_step(remat):
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.TPU.REMAT = remat
    cfg = cfg.freeze()
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    batch = _tiny_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"],
                           train=False)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False,
                           remat=cfg.TPU.REMAT)
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    return state, metrics


@pytest.mark.slow
@pytest.mark.parametrize("remat", ["dots", "full", "layers"])
def test_remat_step_matches_default(remat):
    base_state, base_metrics = _one_step(False)
    state, metrics = _one_step(remat)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(base_metrics["loss"]), rtol=1e-6)
    # Post-Adam params: a recompute-vs-stored grad rounding of ~1e-7 passes
    # through g/(|g|+eps) and lands at ~3e-6 on isolated elements; a REAL
    # divergence (e.g. a different dropout mask under remat) shifts params
    # at the full update scale ~LR=1e-3, far above these tolerances.
    for (pa, a), (pb, bl) in zip(
            jax.tree_util.tree_leaves_with_path(base_state.params),
            jax.tree_util.tree_leaves_with_path(state.params)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(bl),
                                   rtol=1e-3, atol=2e-5, err_msg=str(pa))
    for (pa, a), (pb, bl) in zip(
            jax.tree_util.tree_leaves_with_path(base_state.batch_stats),
            jax.tree_util.tree_leaves_with_path(state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bl),
                                   rtol=1e-4, atol=1e-6, err_msg=str(pa))


def test_remat_actually_checkpoints():
    """'full' must insert a remat barrier: the jaxpr of the grad of a
    checkpointed fn contains a remat2/checkpoint primitive."""
    f = _remat_wrap(lambda x: (x ** 2).sum(), "full")
    jaxpr = jax.make_jaxpr(jax.grad(f))(np.ones((4,), np.float32))
    prims = {e.primitive.name for e in jaxpr.eqns}
    assert "remat2" in prims or "checkpoint" in prims, prims


def test_remat_rejects_unknown_value():
    with pytest.raises(ValueError, match="TPU.REMAT"):
        _remat_wrap(lambda x: x, "everything")


@pytest.mark.slow
def test_layers_remat_interformer_grad_matches():
    """'layers' plumbing through the two-stage interformer (intra + inter
    encoders both nn.remat'd): gradients match the default path."""
    from tests.test_interformer import tiny_interformer_cfg

    def grads(remat):
        cfg = tiny_interformer_cfg().clone()
        cfg.TPU.REMAT = remat
        cfg = cfg.freeze()
        model = get_model_builder(cfg.MODEL.NAME)(cfg)
        batch = _tiny_batch(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch["images"],
                               batch["pos_masks"], batch["person_valid"],
                               train=False)

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch["images"], batch["pos_masks"], batch["person_valid"],
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)})
            hm = out["multi"] if isinstance(out, dict) else out
            return (hm ** 2).mean()

        return jax.jit(jax.grad(loss))(variables["params"])

    g0, g1 = grads(False), grads("layers")
    for (pa, a), (_, bl) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bl),
                                   rtol=1e-4, atol=1e-7, err_msg=str(pa))


@pytest.mark.slow
def test_layers_remat_hrformer_grad_matches():
    """'layers' now covers HRFormer too (ADVICE r3): per-block nn.remat wired
    through HRTStage; gradients must match the non-remat path."""
    import jax.numpy as jnp

    from i2rnet_tpu.models.hrformer import HRFormer
    from tests.test_hrformer import TINY_ARCH

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 48, 3).astype(np.float32)

    def grads(remat):
        model = HRFormer(arch=TINY_ARCH, num_joints=5, remat=remat,
                         dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            (_, heat), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)})
            return (heat ** 2).mean()

        return jax.jit(jax.grad(loss))(variables["params"])

    g0, g1 = grads(False), grads(True)
    for (pa, a), (_, bl) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bl),
                                   rtol=1e-4, atol=1e-7, err_msg=str(pa))


def test_hrformer_remat_rejects_fused_budget():
    from i2rnet_tpu.presets import tiny_test_config

    cfg = tiny_test_config(num_joints=5).clone()
    cfg.TPU.REMAT = "layers"
    cfg.TPU.FUSED_TRAIN_MAX_BLOCKS = 2
    cfg.MODEL.NAME = "hrformer"
    cfg = cfg.freeze()
    with pytest.raises(ValueError, match="FUSED_TRAIN_MAX_BLOCKS"):
        get_model_builder("hrformer")(cfg)


def test_make_train_step_rejects_bad_remat_early():
    """A REMAT typo must fail at step construction, not at first trace
    (ADVICE r3)."""
    cfg = tiny_test_config(num_joints=5)
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    with pytest.raises(ValueError, match="TPU.REMAT"):
        make_train_step(model, tx, remat="layer")
