"""Fused training FFN-tail kernel (ops/pallas/encoder_ffn_train.py).

Same oracle strategy as the flash-attention train tests: the TPU PRNG is
not emulable under the Pallas interpreter, so the kernel accepts explicit
uint32 bits; tests feed IDENTICAL bits to the kernel and to a plain-XLA
reimplementation of the post-norm DETR FFN tail with dropout (reference
``lib/models/attention.py:100-112``) and require forward AND gradient
agreement across x and all eight parameters — covering the one-kernel
backward including both dropout masks, the relu gate, both LayerNorm VJPs,
and the cross-tile parameter-grad accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2rnet_tpu.ops.pallas.encoder_ffn_train import (ROW_TILE, _threshold,
                                                     encoder_ffn_train,
                                                     encoder_ffn_train_auto)

C, F = 96, 192
CP, FP = 128, 256
RATE = 0.3


def _params(seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(C, F) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(F) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(F, C) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
            jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(C) * 0.1, jnp.float32))


def _bits(rows, seed=1):
    rng = np.random.RandomState(seed)
    rp = ((rows + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    return (jnp.asarray(rng.randint(0, 2 ** 32, (rp, FP),
                                    np.uint64).astype(np.uint32)),
            jnp.asarray(rng.randint(0, 2 ** 32, (rp, CP),
                                    np.uint64).astype(np.uint32)))


def _oracle(x, params, bits, rate):
    n1s, n1b, w1, b1, w2, b2, n2s, n2b = params

    def ln(v, g, b):
        m = v.mean(-1, keepdims=True)
        var = ((v - m) ** 2).mean(-1, keepdims=True)
        return (v - m) * jax.lax.rsqrt(var + 1e-5) * g + b

    rows = int(np.prod(x.shape[:-1]))
    n = ln(x, n1s, n1b)
    a = jnp.maximum(n @ w1 + b1, 0.0)
    if rate > 0.0:
        t = np.uint32(_threshold(rate))
        k1 = (bits[0][:rows, :F] >= t).reshape(x.shape[:-1] + (F,))
        k2 = (bits[1][:rows, :C] >= t).reshape(x.shape[:-1] + (C,))
        inv = 1.0 / (1.0 - rate)
        a = jnp.where(k1, a * inv, 0.0)
    y = a @ w2 + b2
    if rate > 0.0:
        y = jnp.where(k2, y * inv, 0.0)
    return ln(n + y, n2s, n2b)


@pytest.mark.parametrize("shape", [(2, 700), (1, 1024), (3, 150)])
def test_fwd_matches_oracle_with_identical_bits(shape):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(*shape, C), jnp.float32)
    params = _params()
    bits = _bits(int(np.prod(shape)))
    out = encoder_ffn_train(x, *params, RATE, dropout_bits=bits,
                            interpret=True)
    ref = _oracle(x, params, bits, RATE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_grads_match_oracle_all_args():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 700, C), jnp.float32)
    params = _params()
    bits = _bits(1400)
    g = jnp.asarray(rng.randn(2, 700, C), jnp.float32)

    def run_k(x, *p):
        return (encoder_ffn_train(x, *p, RATE, dropout_bits=bits,
                                  interpret=True) * g).sum()

    def run_o(x, *p):
        return (_oracle(x, p, bits, RATE) * g).sum()

    gk = jax.grad(run_k, argnums=tuple(range(9)))(x, *params)
    go = jax.grad(run_o, argnums=tuple(range(9)))(x, *params)
    names = ["x", "n1s", "n1b", "w1", "b1", "w2", "b2", "n2s", "n2b"]
    for nm, a, b in zip(names, gk, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {nm}")


def test_rate_zero_matches_plain_tail():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 300, C), jnp.float32)
    params = _params()
    out = encoder_ffn_train(x, *params, 0.0, interpret=True)
    ref = _oracle(x, params, None, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_auto_dispatch_cpu_generates_bits_and_differs_by_rng():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 500, C), jnp.float32)
    params = _params()
    o1 = encoder_ffn_train_auto(x, *params, RATE, jax.random.PRNGKey(0))
    o1b = encoder_ffn_train_auto(x, *params, RATE, jax.random.PRNGKey(0))
    o2 = encoder_ffn_train_auto(x, *params, RATE, jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(o1), np.asarray(o1b))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert np.isfinite(np.asarray(o1)).all()


def test_encoder_layer_fused_train_matches_unfused_at_rate0():
    """Integration: the layer's fused-train path == the flax path when the
    dropout masks can't differ (rate 0), both values and input grads."""
    from i2rnet_tpu.models.encoder import TransformerEncoderLayer

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 120, C), jnp.float32)

    def build(fused):
        return TransformerEncoderLayer(
            C, 2, F, dropout_rate=0.0, use_pallas=True,
            fused_ffn_train=fused)

    params = build(True).init(jax.random.PRNGKey(0), x,
                              deterministic=False)

    def run(fused, x):
        return build(fused).apply(params, x, deterministic=False,
                                  rngs={"dropout": jax.random.PRNGKey(7)})

    out_f = run(True, x)
    out_u = run(False, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=2e-5, rtol=1e-5)

    gf = jax.grad(lambda x: (run(True, x) ** 2).sum())(x)
    gu = jax.grad(lambda x: (run(False, x) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                               atol=5e-4, rtol=5e-4)


def test_encoder_layer_fused_train_invoked(monkeypatch):
    """The fused path is actually taken in a train-mode layer call."""
    import i2rnet_tpu.ops.pallas.encoder_ffn_train as mod
    from i2rnet_tpu.models.encoder import TransformerEncoderLayer

    calls = []
    orig = mod.encoder_ffn_train_auto

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(mod, "encoder_ffn_train_auto", spy)

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 120, C), jnp.float32)
    layer = TransformerEncoderLayer(C, 2, F, dropout_rate=0.1,
                                    use_pallas=True, fused_ffn_train=True)
    params = layer.init(jax.random.PRNGKey(0), x, deterministic=False)
    out = layer.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert calls, "fused FFN train path was not invoked"
    assert np.isfinite(np.asarray(out)).all()
