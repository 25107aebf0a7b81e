"""Custom-VJP fused window-attention TRAINING kernel == unfused math.

Checks the Pallas forward AND the hand-written Pallas backward of
``ops/pallas/hrformer_block_train.py`` against jax autodiff through the
plain-jnp reference (the same math the unfused HRFormerBlock attention
sub-block computes), on padding shapes, with droppath scales including
dropped samples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2rnet_tpu.ops.pallas.hrformer_block_train import window_attn_block_train

pytestmark = pytest.mark.slow

HEADS, WINDOW = 2, 7


def _ref(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo):
    """Plain-jnp mirror: LN -> center-pad -> 7x7 window regroup -> MHSA
    (q scaled, biases active on pad tokens) -> unwindow -> x + s*attn."""
    p, h, w, c = x.shape
    d = c // HEADS
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * g1 + b1

    pad_h, pad_w = (-h) % WINDOW, (-w) % WINDOW
    ypad = jnp.pad(y, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                       (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    nh, nw = hp // WINDOW, wp // WINDOW
    t = WINDOW * WINDOW
    tok = ypad.reshape(p, nh, WINDOW, nw, WINDOW, c).transpose(0, 1, 3, 2, 4, 5)
    tok = tok.reshape(p, nh * nw, t, c)

    q = tok @ wq + bq
    k = tok @ wk + bk
    v = tok @ wv + bv
    qh = q.reshape(p, -1, t, HEADS, d).transpose(0, 1, 3, 2, 4) / np.sqrt(d)
    kh = k.reshape(p, -1, t, HEADS, d).transpose(0, 1, 3, 2, 4)
    vh = v.reshape(p, -1, t, HEADS, d).transpose(0, 1, 3, 2, 4)
    pr = jax.nn.softmax(jnp.einsum("pnhqd,pnhkd->pnhqk", qh, kh), -1)
    o = jnp.einsum("pnhqk,pnhkd->pnhqd", pr, vh)
    o = o.transpose(0, 1, 3, 2, 4).reshape(p, nh * nw, t, c)
    a = o @ wo + bo
    a = a.reshape(p, nh, nw, WINDOW, WINDOW, c).transpose(0, 1, 3, 2, 4, 5)
    a = a.reshape(p, hp, wp, c)[:, pad_h // 2: pad_h // 2 + h,
                                pad_w // 2: pad_w // 2 + w, :]
    return x + s[:, None, None, None] * a


# geometries cover: pad on both axes (10,9), no pad on w (14,7), and a
# 3-strip case with no h-pad (21,10) — the strip grid's row offsets and
# the (sample, strip) accumulator ordering only show up at nh >= 3
@pytest.mark.parametrize("h,w", [(10, 9), (14, 7), (21, 10)])
def test_fused_train_attn_forward_and_grads_match(h, w, rng):
    p, c = 3, 16
    x = rng.randn(p, h, w, c).astype(np.float32)
    s = np.array([1.25, 0.0, 1.25], np.float32)  # one droppath-dropped sample
    g1 = rng.randn(c).astype(np.float32) * 0.1 + 1.0
    b1 = rng.randn(c).astype(np.float32) * 0.1
    mk = lambda *sh: (rng.randn(*sh) * 0.2).astype(np.float32)  # noqa: E731
    wq, bq = mk(c, c), mk(c)
    wk, bk = mk(c, c), mk(c)
    wv, bv = mk(c, c), mk(c)
    wo, bo = mk(c, c), mk(c)
    params = (g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)
    cot = rng.randn(p, h, w, c).astype(np.float32)

    def loss_fused(x, *params):
        out = window_attn_block_train(x, s, *params, heads=HEADS,
                                      window=WINDOW, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(x, *params):
        return jnp.sum(_ref(x, s, *params) * cot)

    out_f = window_attn_block_train(x, s, *params, heads=HEADS,
                                    window=WINDOW, interpret=True)
    out_r = _ref(x, s, *params)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    # the dropped sample passes x through untouched
    np.testing.assert_array_equal(np.asarray(out_f)[1], x[1])

    gf = jax.grad(loss_fused, argnums=tuple(range(11)))(x, *params)
    gr = jax.grad(loss_ref, argnums=tuple(range(11)))(x, *params)
    names = ["x", "g1", "b1", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_fused_train_attn_in_block_matches_unfused(rng, monkeypatch):
    """HRFormerBlock with fused_train_attn=True == the unfused block in
    train mode (droppath 0 so no rng-stream difference; BN-free attention
    half is bit-comparable, MLP half identical module path).

    The fused-train path normally engages only at >= MIN_FUSED_TRAIN_TOKENS
    (2048) tokens; lower the threshold so this small geometry actually
    exercises the kernel, and assert it was invoked (a silent fall-through
    to the unfused path would make the comparison vacuous)."""
    import i2rnet_tpu.models.hrformer as hrf
    import i2rnet_tpu.ops.pallas.hrformer_block_train as kmod

    monkeypatch.setattr(hrf, "MIN_FUSED_TRAIN_TOKENS", 1)
    calls = []
    orig = kmod.window_attn_block_train

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "window_attn_block_train", spy)

    p, h, w, c = 2, 10, 9, 16
    x = rng.randn(p, h, w, c).astype(np.float32)

    def run(fused):
        blk = hrf.HRFormerBlock(c, HEADS, WINDOW, mlp_ratio=2.0,
                                drop_path=0.0, fused_train_attn=fused)
        v = blk.init(jax.random.PRNGKey(0), x, None, False)
        out, _ = blk.apply(v, x, None, True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return np.asarray(out)

    fused_out = run(True)
    assert calls, "fused-train kernel was never invoked (path not taken)"
    np.testing.assert_allclose(fused_out, run(False), rtol=3e-5, atol=3e-5)
