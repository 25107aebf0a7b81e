"""Tests for the HRFormer-B first stage (tiny arch) and its composition."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from i2rnet_tpu.models.hrformer import (
    HRFORMER_B_ARCH,
    HRFormer,
    MlpDWBN,
    WindowRPEAttention,
    window_partition,
    window_unpartition,
    _rpe_index,
)

pytestmark = pytest.mark.slow

TINY_ARCH = {
    "drop_path_rate": 0.1,
    "stage2": dict(num_modules=1, num_branches=2, num_blocks=(1, 1),
                   num_channels=(16, 32), num_heads=(2, 2),
                   num_mlp_ratios=(2, 2), num_window_sizes=(7, 7)),
    "stage3": dict(num_modules=1, num_branches=3, num_blocks=(1, 1, 1),
                   num_channels=(16, 32, 64), num_heads=(2, 2, 2),
                   num_mlp_ratios=(2, 2, 2), num_window_sizes=(7, 7, 7)),
    "stage4": dict(num_modules=1, num_branches=4, num_blocks=(1, 1, 1, 1),
                   num_channels=(16, 32, 64, 128), num_heads=(2, 2, 2, 2),
                   num_mlp_ratios=(2, 2, 2, 2), num_window_sizes=(7, 7, 7, 7)),
}


def test_window_partition_roundtrip(rng):
    x = rng.rand(2, 16, 12, 8).astype(np.float32)
    win, info = window_partition(jnp.asarray(x), 7)
    assert win.shape == (2 * 3 * 2, 49, 8)  # 16->21 (3 win), 12->14 (2 win)
    back = np.asarray(window_unpartition(win, 7, info))
    np.testing.assert_allclose(back, x)


def test_rpe_index_properties():
    idx = _rpe_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    assert np.all(np.diag(idx) == idx[0, 0])  # zero offset everywhere on diag


def test_use_rpe_attention_matches_numpy_oracle(rng):
    """use_rpe=True oracle (VERDICT r2 weak #3): the Swin-style relative
    position bias, constructed INDEPENDENTLY here from per-pair coordinate
    offsets (bias[q,k] = table[(dy+W-1)*(2W-1) + (dx+W-1)]), must reproduce
    the module's attention output through a plain-numpy forward. This is the
    train-from-scratch intent path the reference quirk disables
    (hrformer.py:880-888)."""
    W, heads, c = 7, 2, 16
    t = W * W
    x = rng.rand(4, t, c).astype(np.float32)
    attn = WindowRPEAttention(num_heads=heads, window=W, use_rpe=True,
                              dtype=jnp.float32)
    v = attn.init(jax.random.PRNGKey(3), x)
    # non-degenerate table
    table = rng.randn((2 * W - 1) ** 2, heads).astype(np.float32)
    v = {"params": {**v["params"], "rpe_table": jnp.asarray(table)}}
    out = np.asarray(attn.apply(v, x))

    # independent bias construction from (dy, dx) offsets
    ys, xs = np.divmod(np.arange(t), W)
    bias = np.zeros((heads, t, t), np.float32)
    for q in range(t):
        for k in range(t):
            dy, dx = ys[q] - ys[k], xs[q] - xs[k]
            bias[:, q, k] = table[(dy + W - 1) * (2 * W - 1) + (dx + W - 1)]

    p = v["params"]
    d = c // heads

    def dense(name, z):
        return z @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])

    q = dense("q_proj", x).reshape(4, t, heads, d).transpose(0, 2, 1, 3)
    k = dense("k_proj", x).reshape(4, t, heads, d).transpose(0, 2, 1, 3)
    vv = dense("v_proj", x).reshape(4, t, heads, d).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d) + bias[None]
    e = np.exp(logits - logits.max(-1, keepdims=True))
    pr = e / e.sum(-1, keepdims=True)
    o = (pr @ vv).transpose(0, 2, 1, 3).reshape(4, t, c)
    expected = dense("out_proj", o)
    np.testing.assert_allclose(out, expected, rtol=2e-5, atol=2e-5)

    # and the quirk gate: use_rpe=False must IGNORE the table entirely
    attn0 = WindowRPEAttention(num_heads=heads, window=W, use_rpe=False,
                               dtype=jnp.float32)
    out0 = np.asarray(attn0.apply(v, x))
    v_zero = {"params": {**v["params"],
                         "rpe_table": jnp.zeros_like(v["params"]["rpe_table"])}}
    out0_zero = np.asarray(attn0.apply(v_zero, x))
    np.testing.assert_array_equal(out0, out0_zero)


def test_window_attention_shapes(rng):
    x = rng.rand(6, 49, 16).astype(np.float32)
    attn = WindowRPEAttention(num_heads=2, window=7, dtype=jnp.float32)
    v = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(v, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_mlpdwbn(rng):
    x = rng.rand(2, 8, 6, 16).astype(np.float32)
    m = MlpDWBN(hidden=32, out=16, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 8, 6, 16)


def test_hrformer_forward_and_contract(rng):
    model = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=jnp.float32)
    x = rng.rand(2, 64, 48, 3).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), x, None, train=False)
    feat, heat = model.apply(v, x, None, train=False)
    assert feat.shape == (2, 16, 12, 16)
    assert heat.shape == (2, 5, 16, 12)
    assert np.isfinite(np.asarray(feat)).all()

    # train mode with drop-path rng + batch stats mutation
    (feat, heat), mut = model.apply(v, x, None, train=True,
                                    mutable=["batch_stats"],
                                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in mut


def test_hrformer_b_arch_dims():
    # full arch sanity: head dims divide channels
    for s in ("stage2", "stage3", "stage4"):
        cfg = HRFORMER_B_ARCH[s]
        for c, h in zip(cfg["num_channels"], cfg["num_heads"]):
            assert c % h == 0


def test_interformer_with_hrformer(rng):
    from i2rnet_tpu.models.interformer import InterFormer
    tiny_extra = {
        "DECONV_WITH_BIAS": False, "NUM_DECONV_LAYERS": 1,
        "NUM_DECONV_FILTERS": [16], "NUM_DECONV_KERNELS": [4],
        "FINAL_CONV_KERNEL": 1,
    }
    single = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=jnp.float32)
    model = InterFormer(
        extra=tiny_extra, singleformer=single, num_joints=5, d_model=16,
        dim_feedforward=32, n_head=2, encoder_multi_layers=1,
        trans_size=(4, 3), heatmap_size=(12, 16), upsample_type="deconv",
        inter_supervision=True, dtype=jnp.float32,
    )
    images = rng.rand(1, 2, 64, 48, 3).astype(np.float32)
    pos = (rng.rand(1, 2, 64, 48, 1) > 0.5).astype(np.float32)
    valid = np.array([[True, False]])
    v = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    out = model.apply(v, images, pos, valid, train=False)
    assert out["multi"].shape == (1, 2, 5, 16, 12)
    assert out["single"].shape == (1, 2, 5, 16, 12)
    assert np.all(np.asarray(out["multi"])[0, 1] == 0)


def test_mlpdwbn_fused_matches_unfused(rng):
    """Fused Pallas MlpDWBN (BN-folded eval) == unfused flax path."""
    x = rng.rand(2, 8, 6, 16).astype(np.float32) * 2 - 1
    m_ref = MlpDWBN(hidden=32, out=16, dtype=jnp.float32)
    v = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    # give BN stats non-trivial values so folding is actually exercised
    import jax.tree_util as jtu
    stats = jax.tree_util.tree_map(lambda a: a, v["batch_stats"])
    for norm in stats:
        stats[norm]["mean"] = jnp.asarray(rng.randn(*stats[norm]["mean"].shape),
                                          jnp.float32) * 0.1
        stats[norm]["var"] = jnp.asarray(rng.rand(*stats[norm]["var"].shape),
                                         jnp.float32) + 0.5
    v = {"params": v["params"], "batch_stats": stats}

    ref = np.asarray(m_ref.apply(v, x, train=False))
    m_fused = MlpDWBN(hidden=32, out=16, use_fused_eval=True, dtype=jnp.float32)
    got = np.asarray(m_fused.apply(v, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_hrformer_fused_eval_matches(rng):
    """Full tiny HRFormer: fused_eval_mlp on == off (eval mode)."""
    x = rng.rand(2, 64, 48, 3).astype(np.float32)
    base = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x, None, train=False)
    feat0, heat0 = base.apply(v, x, None, train=False)
    fused = HRFormer(arch=TINY_ARCH, num_joints=5, fused_eval_mlp=True,
                     dtype=jnp.float32)
    feat1, heat1 = fused.apply(v, x, None, train=False)
    np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(heat1), np.asarray(heat0),
                               rtol=1e-4, atol=1e-5)


def test_hrformer_block_fused_matches_unfused(rng):
    """Whole-block fused kernels (LN1+window-MHSA+res, LN2+MlpDWBN+res) ==
    unfused flax path, including non-multiple-of-7 padding shapes."""
    from i2rnet_tpu.models.hrformer import HRFormerBlock

    for (h, w, c, heads) in [(18, 13, 16, 2), (14, 14, 32, 4), (7, 6, 24, 3)]:
        x = (rng.rand(2, h, w, c).astype(np.float32) * 2 - 1)
        base = HRFormerBlock(channels=c, num_heads=heads, window=7,
                             mlp_ratio=2.0, dtype=jnp.float32)
        v = base.init(jax.random.PRNGKey(c), x, train=False)
        # non-trivial BN stats so folding is exercised
        stats = v["batch_stats"]
        for norm in stats["mlp"]:
            stats["mlp"][norm]["mean"] = jnp.asarray(
                rng.randn(*stats["mlp"][norm]["mean"].shape), jnp.float32) * 0.1
            stats["mlp"][norm]["var"] = jnp.asarray(
                rng.rand(*stats["mlp"][norm]["var"].shape), jnp.float32) + 0.5
        v = {"params": v["params"], "batch_stats": stats}
        ref = np.asarray(base.apply(v, x, train=False))
        fused = HRFormerBlock(channels=c, num_heads=heads, window=7,
                              mlp_ratio=2.0, fused_eval_block=True,
                              dtype=jnp.float32)
        got = np.asarray(fused.apply(v, x, train=False))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"shape {(h, w, c, heads)}")


def test_hrformer_block_onepass_matches_unfused(rng, monkeypatch):
    """Single-pass whole-block kernel (attn + MLP in one HBM pass) ==
    unfused flax path, on padding shapes with non-trivial BN stats.
    Spies on the kernel so a silent fall-through to the two-kernel path
    cannot make this comparison vacuous."""
    import i2rnet_tpu.ops.pallas.hrformer_block as kmod
    from i2rnet_tpu.models.hrformer import HRFormerBlock

    calls = []
    orig = kmod.full_block_fused

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "full_block_fused", spy)

    for (h, w, c, heads) in [(18, 13, 16, 2), (7, 6, 24, 3)]:
        x = (rng.rand(2, h, w, c).astype(np.float32) * 2 - 1)
        base = HRFormerBlock(channels=c, num_heads=heads, window=7,
                             mlp_ratio=2.0, dtype=jnp.float32)
        v = base.init(jax.random.PRNGKey(c), x, train=False)
        stats = v["batch_stats"]
        for norm in stats["mlp"]:
            stats["mlp"][norm]["mean"] = jnp.asarray(
                rng.randn(*stats["mlp"][norm]["mean"].shape), jnp.float32) * 0.1
            stats["mlp"][norm]["var"] = jnp.asarray(
                rng.rand(*stats["mlp"][norm]["var"].shape), jnp.float32) + 0.5
        v = {"params": v["params"], "batch_stats": stats}
        ref = np.asarray(base.apply(v, x, train=False))
        onepass = HRFormerBlock(channels=c, num_heads=heads, window=7,
                                mlp_ratio=2.0, fused_eval_block=True,
                                fused_eval_onepass=True, dtype=jnp.float32)
        got = np.asarray(onepass.apply(v, x, train=False))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"shape {(h, w, c, heads)}")
    assert calls, "one-pass kernel was never invoked (path not taken)"


def test_onepass_vmem_gate_falls_back_to_two_kernels(rng, monkeypatch):
    """Above MAX_ONEPASS_TOKENS the one-pass kernel must NOT engage (its
    combined VMEM footprint holds the 4C hidden AND attention
    intermediates) — the block falls back to the two-kernel fused path."""
    import i2rnet_tpu.ops.pallas.hrformer_block as kmod
    from i2rnet_tpu.models.hrformer import HRFormerBlock

    # real geometries: 256x192 branch0 (70x49 padded = 3430) fuses,
    # 384x288 branch0 (98x77 padded = 7546) does not
    assert kmod.block_onepass_fits_vmem(64, 48)
    assert not kmod.block_onepass_fits_vmem(96, 72)

    monkeypatch.setattr(kmod, "MAX_ONEPASS_TOKENS", 10)
    one_calls, two_calls = [], []
    orig_one, orig_two = kmod.full_block_fused, kmod.window_attn_block_fused
    monkeypatch.setattr(kmod, "full_block_fused",
                        lambda *a, **k: one_calls.append(1) or orig_one(*a, **k))
    monkeypatch.setattr(kmod, "window_attn_block_fused",
                        lambda *a, **k: two_calls.append(1) or orig_two(*a, **k))

    x = rng.rand(1, 10, 9, 16).astype(np.float32)
    blk = HRFormerBlock(channels=16, num_heads=2, window=7, mlp_ratio=2.0,
                        fused_eval_block=True, fused_eval_onepass=True,
                        dtype=jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    blk.apply(v, x, train=False)
    assert not one_calls, "one-pass kernel engaged above MAX_ONEPASS_TOKENS"
    assert two_calls, "two-kernel fused path not taken on fallback"


def test_hrformer_onepass_full_model(rng, monkeypatch):
    """Full tiny HRFormer: FUSED_BLOCK_EVAL_ONEPASS == the two-kernel
    fused path == unfused (eval mode)."""
    import i2rnet_tpu.ops.pallas.hrformer_block as kmod

    calls = []
    orig = kmod.full_block_fused

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "full_block_fused", spy)

    x = rng.rand(2, 64, 48, 3).astype(np.float32)
    base = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x, None, train=False)
    feat0, heat0 = base.apply(v, x, None, train=False)
    onepass = HRFormer(arch=TINY_ARCH, num_joints=5, fused_eval_block=True,
                       fused_eval_onepass=True, dtype=jnp.float32)
    feat1, heat1 = onepass.apply(v, x, None, train=False)
    assert calls, "one-pass kernel never invoked at full-model level"
    np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(heat1), np.asarray(heat0),
                               rtol=1e-4, atol=1e-5)


def test_hrformer_fused_block_eval_full_model(rng):
    """Full tiny HRFormer: fused_eval_block on == off (eval mode)."""
    x = rng.rand(2, 64, 48, 3).astype(np.float32)
    base = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x, None, train=False)
    feat0, heat0 = base.apply(v, x, None, train=False)
    fused = HRFormer(arch=TINY_ARCH, num_joints=5, fused_eval_block=True,
                     dtype=jnp.float32)
    feat1, heat1 = fused.apply(v, x, None, train=False)
    np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(heat1), np.asarray(heat0),
                               rtol=1e-4, atol=1e-5)


def test_einsum_attn_layout_matches(rng):
    """TPU.WINDOW_ATTN_EINSUM: the batch-dim dot_general attention layout is
    numerically the same program as window_partition + per-head transposes —
    same params, same outputs, same grads (train mode, dropout keys fixed).
    """
    x = rng.rand(2, 64, 48, 3).astype(np.float32)
    base = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=jnp.float32)
    ein = HRFormer(arch=TINY_ARCH, num_joints=5, einsum_attn=True,
                   dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x, None, train=False)
    # param trees identical (the layouts share every projection)
    v2 = ein.init(jax.random.PRNGKey(0), x, None, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    feat0, heat0 = base.apply(v, x, None, train=False)
    feat1, heat1 = ein.apply(v, x, None, train=False)
    np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(heat1), np.asarray(heat0),
                               rtol=1e-4, atol=1e-5)

    def loss(m):
        def f(params):
            vv = {"params": params, "batch_stats": v["batch_stats"]}
            out, mut = m.apply(vv, x, None, train=True,
                               rngs={"dropout": jax.random.PRNGKey(7)},
                               mutable=["batch_stats"])
            feat, heat = out
            return jnp.sum(heat.astype(jnp.float32) ** 2)
        return jax.grad(f)(v["params"])
    g0, g1 = loss(base), loss(ein)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_einsum_attn_use_rpe_matches(rng):
    """The RPE bias reshaped onto (p,q,r,s) equals the flat [T,T] addition."""
    from i2rnet_tpu.models.hrformer import window_partition, window_unpartition
    x = rng.rand(3, 14, 14, 8).astype(np.float32)
    attn = WindowRPEAttention(num_heads=2, window=7, use_rpe=True,
                              dtype=jnp.float32)
    win, info = window_partition(jnp.asarray(x), 7)
    v = attn.init(jax.random.PRNGKey(1), win)
    flat = window_unpartition(attn.apply(v, win), 7, info)
    spatial = attn.apply(v, jnp.asarray(x))   # 4D einsum-native path
    np.testing.assert_allclose(np.asarray(spatial), np.asarray(flat),
                               rtol=1e-5, atol=1e-6)
