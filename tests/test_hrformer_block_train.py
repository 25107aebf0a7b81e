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


def test_fused_train_full_model_grads_match_unfused(rng, monkeypatch):
    """FULL tiny HRFormer with fused_train_attn: loss, parameter grads and
    BN batch_stats of one train step == the unfused path.

    The in-block test above pins one kernel call; this pins the STAGE-level
    wiring the full train program relies on — the MIN_FUSED_TRAIN_TOKENS
    gate across branches of different geometry, per-block param extraction
    at every stage, and batch-stats mutation flowing through the fused
    attention sub-block. drop_path_rate 0 so the two paths consume no
    dropout rng (with droppath on, the fused path draws its Bernoulli at
    the block instead of inside DropPath — same distribution, different
    stream — so outputs are only distributionally equal)."""
    import i2rnet_tpu.models.hrformer as hrf
    import i2rnet_tpu.ops.pallas.hrformer_block_train as kmod
    from tests.test_hrformer import TINY_ARCH

    monkeypatch.setattr(hrf, "MIN_FUSED_TRAIN_TOKENS", 1)
    calls = []
    orig = kmod.window_attn_block_train

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "window_attn_block_train", spy)

    arch = {k: (dict(v) if isinstance(v, dict) else 0.0)
            for k, v in TINY_ARCH.items()}  # drop_path_rate -> 0.0
    x = jnp.asarray(rng.rand(2, 64, 48, 3).astype(np.float32))
    base = hrf.HRFormer(arch=arch, num_joints=5, dtype=jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x, None, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    cot_f = jnp.asarray(rng.rand(2, 16, 12, 16).astype(np.float32))
    cot_h = jnp.asarray(rng.rand(2, 5, 16, 12).astype(np.float32))

    def step(fused):
        model = hrf.HRFormer(arch=arch, num_joints=5,
                             fused_train_attn=fused, dtype=jnp.float32)

        def loss_fn(p):
            (feat, heat), mut = model.apply(
                {"params": p, "batch_stats": stats}, x, None, True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(feat * cot_f) + jnp.sum(heat * cot_h), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, mut["batch_stats"]

    loss_f, grads_f, stats_f = step(True)
    assert calls, "fused-train kernel never invoked at full-model level"
    loss_u, grads_u, stats_u = step(False)

    np.testing.assert_allclose(np.asarray(loss_f), np.asarray(loss_u),
                               rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(grads_f)
    flat_u = dict(jax.tree_util.tree_leaves_with_path(grads_u))
    # stem grads sit below ~12 blocks of backward; f32 accumulation-order
    # differences between the Pallas and XLA backward reach a few 1e-3 of
    # the leaf's grad SCALE there, concentrated on small-magnitude elements
    # — compare against the leaf max, not elementwise (wiring bugs give
    # O(1)-of-scale mismatches, far outside this)
    for path, leaf in flat_f:
        name = jax.tree_util.keystr(path)
        # skip leaves whose TRUE grad is exactly 0 and which therefore
        # carry only f32 cancellation noise in both paths: k_proj bias
        # (softmax is invariant to a uniform key bias) and the three MlpDWBN
        # conv biases, each directly followed by a BN that subtracts the
        # batch mean
        if ("['k_proj']['bias']" in name
                or any(f"['{m}']['bias']" in name
                       for m in ("fc1", "dw3x3", "fc2"))):
            continue
        a, b = np.asarray(leaf), np.asarray(flat_u[path])
        tol = 2e-3 * np.abs(b).max() + 1e-4
        np.testing.assert_array_less(np.abs(a - b).max(), tol, err_msg=name)
    for path, leaf in jax.tree_util.tree_leaves_with_path(stats_f):
        ref = dict(jax.tree_util.tree_leaves_with_path(stats_u))[path]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_fused_train_max_blocks_caps_kernel_instances(rng, monkeypatch):
    """TPU.FUSED_TRAIN_MAX_BLOCKS fuses exactly the first K eligible blocks
    (plan B for the remote compile helper's memory cap — each fused block
    adds a fwd + two bwd Mosaic kernel instances). The capped model's loss
    and batch_stats must equal the unfused path (each fused block is
    math-exact), and the kernel must be invoked exactly K times."""
    import i2rnet_tpu.models.hrformer as hrf
    import i2rnet_tpu.ops.pallas.hrformer_block_train as kmod
    from tests.test_hrformer import TINY_ARCH

    monkeypatch.setattr(hrf, "MIN_FUSED_TRAIN_TOKENS", 1)
    calls = []
    orig = kmod.window_attn_block_train

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "window_attn_block_train", spy)

    arch = {k: (dict(v) if isinstance(v, dict) else 0.0)
            for k, v in TINY_ARCH.items()}  # drop_path_rate -> 0.0
    x = jnp.asarray(rng.rand(2, 64, 48, 3).astype(np.float32))
    base = hrf.HRFormer(arch=arch, num_joints=5, dtype=jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x, None, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def step(fused, max_blocks=-1):
        model = hrf.HRFormer(arch=arch, num_joints=5, fused_train_attn=fused,
                             fused_train_max_blocks=max_blocks,
                             dtype=jnp.float32)
        (feat, heat), mut = model.apply(
            {"params": params, "batch_stats": stats}, x, None, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        return (np.asarray(jnp.sum(feat)) + np.asarray(jnp.sum(heat)),
                mut["batch_stats"])

    cap = 3
    loss_c, stats_c = step(True, max_blocks=cap)
    assert len(calls) == cap, (
        f"cap={cap} but kernel invoked {len(calls)} times")
    calls.clear()
    loss_u, stats_u = step(False)
    assert not calls
    np.testing.assert_allclose(loss_c, loss_u, rtol=1e-5)
    for path, leaf in jax.tree_util.tree_leaves_with_path(stats_c):
        ref = dict(jax.tree_util.tree_leaves_with_path(stats_u))[path]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
