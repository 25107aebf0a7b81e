"""Pallas fused MHSA vs the XLA reference implementation (interpret mode)."""

import numpy as np
import pytest

from i2rnet_tpu.ops.attention import masked_mhsa_xla
from i2rnet_tpu.ops.pallas.mhsa import masked_mhsa_pallas


@pytest.mark.parametrize("b,s,c,h", [(2, 36, 16, 2), (1, 300, 96, 1),
                                     (2, 130, 24, 8)])
def test_pallas_matches_xla(rng, b, s, c, h):
    q = rng.randn(b, s, c).astype(np.float32)
    k = rng.randn(b, s, c).astype(np.float32)
    v = rng.randn(b, s, c).astype(np.float32)
    mask = rng.rand(b, s) > 0.8
    mask[:, 0] = False  # at least one valid key per row

    ref = np.asarray(masked_mhsa_xla(q, k, v, h, mask))
    got = np.asarray(masked_mhsa_pallas(q, k, v, h, mask, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pallas_no_mask(rng):
    q = rng.randn(1, 64, 32, ).astype(np.float32)
    ref = np.asarray(masked_mhsa_xla(q, q, q, 4, None))
    got = np.asarray(masked_mhsa_pallas(q, q, q, 4, None, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_path_is_differentiable(rng):
    """masked_mhsa(use_pallas=True) has gradients matching the XLA path
    (Pallas forward + XLA-derived custom VJP)."""
    import jax
    import jax.numpy as jnp

    from i2rnet_tpu.ops.attention import masked_mhsa

    q = jnp.asarray(rng.randn(2, 40, 16).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 40) > 0.8)

    def loss(fn_flag):
        def f(q):
            o = masked_mhsa(q, q, q, 2, mask, use_pallas=fn_flag)
            return jnp.sum(o**2)
        return jax.grad(f)(q)

    g_pallas = np.asarray(loss(True))
    g_xla = np.asarray(loss(False))
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-5)


def test_pallas_kernel_present_in_jitted_forward(rng):
    """TPU.USE_PALLAS_ATTENTION=true must put a pallas_call in the traced
    forward — guards against a silent fallback re-routing to XLA
    (round-1 VERDICT item 8)."""
    import jax

    from i2rnet_tpu.presets import tiny_test_config
    from i2rnet_tpu.registry import get_model_builder

    cfg = tiny_test_config(num_joints=5)
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=True)
    images = rng.rand(1, 2, 64, 48, 3).astype(np.float32)
    pos = (rng.rand(1, 2, 64, 48, 1) > 0.5).astype(np.float32)
    valid = np.ones((1, 2), bool)
    variables = model.init(jax.random.PRNGKey(0), images, pos, valid,
                           train=False)

    jaxpr = str(jax.make_jaxpr(
        lambda im, pm, v: model.apply(variables, im, pm, v, train=False)
    )(images, pos, valid))
    assert "masked_mhsa_pallas" in jaxpr, "Pallas MHSA missing from forward"
    assert "encoder_ffn_fused" in jaxpr, "fused FFN tail missing from forward"

    off = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    jaxpr_off = str(jax.make_jaxpr(
        lambda im, pm, v: off.apply(variables, im, pm, v, train=False)
    )(images, pos, valid))
    assert "masked_mhsa_pallas" not in jaxpr_off
