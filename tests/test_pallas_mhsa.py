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
