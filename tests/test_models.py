"""Model-layer tests: shapes, masking invariance, torch deconv parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2rnet_tpu.models.encoder import TransformerEncoder
from i2rnet_tpu.models.layers import DeconvBlock, MaskedBatchNorm
from i2rnet_tpu.models.pure_multi import PureMultiInterFormer

TINY_EXTRA = {
    "DECONV_WITH_BIAS": False,
    "NUM_DECONV_LAYERS": 1,
    "NUM_DECONV_FILTERS": [16],
    "NUM_DECONV_KERNELS": [4],
    "FINAL_CONV_KERNEL": 1,
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [8, 16], "FUSE_METHOD": "SUM"},
    "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [8, 16, 32], "FUSE_METHOD": "SUM"},
}


def tiny_model(**kw):
    kwargs = dict(
        extra=TINY_EXTRA, num_joints=5, d_model=16, dim_feedforward=32,
        n_head=2, encoder_layers=2, trans_size=(4, 3), heatmap_size=(12, 16),
        use_multi_pos=True, multi_pos_mode="conv", use_pallas=False,
        dtype=jnp.float32,
    )
    kwargs.update(kw)
    return PureMultiInterFormer(**kwargs)


def _batch(rng, b=2, n=3, h=64, w=48):
    images = rng.rand(b, n, h, w, 3).astype(np.float32)
    pos = (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32)
    valid = np.ones((b, n), bool)
    return images, pos, valid


def test_pure_multi_forward_shapes(rng):
    model = tiny_model()
    images, pos, valid = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    out = model.apply(variables, images, pos, valid, train=False)
    assert out["multi"].shape == (2, 3, 5, 16, 12)
    assert np.isfinite(np.asarray(out["multi"])).all()


def test_pure_multi_padding_invariance(rng):
    """Outputs for valid persons must be identical whether or not padded
    persons are present — the core guarantee of the static-shape design."""
    model = tiny_model()
    images, pos, _ = _batch(rng, b=2, n=3)
    valid_full = np.array([[True, True, False], [True, False, False]])
    variables = model.init(jax.random.PRNGKey(0), images, pos, valid_full, train=False)

    # garbage in padded slots must not leak into valid outputs
    images2 = images.copy()
    pos2 = pos.copy()
    images2[0, 2] = 99.0
    images2[1, 1:] = -55.0
    pos2[0, 2] = 1.0

    out1 = np.asarray(model.apply(variables, images, pos, valid_full, train=False)["multi"])
    out2 = np.asarray(model.apply(variables, images2, pos2, valid_full, train=False)["multi"])
    np.testing.assert_allclose(out1[0, :2], out2[0, :2], atol=1e-5)
    np.testing.assert_allclose(out1[1, :1], out2[1, :1], atol=1e-5)
    # padded outputs are zeroed
    assert np.all(out1[0, 2] == 0) and np.all(out1[1, 1:] == 0)


def test_pure_multi_train_step_updates_batch_stats(rng):
    model = tiny_model()
    images, pos, valid = _batch(rng, b=1, n=2)
    variables = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    out, mutated = model.apply(variables, images, pos, valid, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in mutated
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_masked_batchnorm_matches_subset(rng):
    """Masked BN train-mode output on valid rows == unmasked BN on the subset."""
    bn = MaskedBatchNorm()
    x = rng.rand(6, 4, 4, 3).astype(np.float32)
    mask = np.array([1, 1, 1, 0, 0, 0], np.float32)
    v = bn.init(jax.random.PRNGKey(0), x, mask=mask, train=True)
    y_masked, _ = bn.apply(v, x, mask=mask, train=True, mutable=["batch_stats"])
    y_subset, _ = bn.apply(v, x[:3], train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_masked)[:3], np.asarray(y_subset),
                               rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.rand(4, 5, 6, 3).astype(np.float32)
    bn = MaskedBatchNorm(momentum=0.1)
    v = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, stats = bn.apply(v, x, train=True, mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(3, momentum=0.1)
    tbn.train()
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ty = tbn(tx).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)


def test_deconv_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.rand(2, 5, 4, 3).astype(np.float32)  # NHWC
    block = DeconvBlock(7, kernel=4, use_bias=False, dtype=jnp.float32)
    v = block.init(jax.random.PRNGKey(0), x, train=False)

    tconv = torch.nn.ConvTranspose2d(3, 7, 4, stride=2, padding=1, bias=False)
    w_torch = tconv.weight.detach().numpy()  # [Cin, Cout, kh, kw]
    # our HWIO conv kernel == torch weight spatially flipped, axes moved
    w_ours = np.flip(w_torch, axis=(2, 3)).transpose(2, 3, 0, 1).copy()
    v = jax.tree_util.tree_map(lambda a: a, v)
    params = dict(v["params"])
    params["kernel"] = jnp.asarray(w_ours)
    v = {"params": params, "batch_stats": v["batch_stats"]}

    ours = np.asarray(block.apply(
        v, x, train=False))  # includes BN(eval: mean0/var1) + relu
    with torch.no_grad():
        t = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        tbn = torch.nn.BatchNorm2d(7)
        tbn.eval()
        t = torch.relu(tbn(t)).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == t.shape == (2, 10, 8, 7)
    np.testing.assert_allclose(ours, t, rtol=1e-4, atol=1e-5)


def test_encoder_vs_torch_multihead_attention(rng):
    """One post-norm encoder layer matches torch's TransformerEncoderLayer
    semantics via nn.MultiheadAttention (eval mode, no dropout)."""
    torch = pytest.importorskip("torch")
    b, s, c, heads = 2, 7, 8, 2
    x = rng.rand(b, s, c).astype(np.float32)
    pad = np.zeros((b, s), bool)
    pad[0, 5:] = True

    enc = TransformerEncoder(num_layers=1, num_heads=heads, dim_feedforward=16,
                             dtype=jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x, key_padding_mask=pad, deterministic=True)
    p = v["params"]["layer0"]

    tl = torch.nn.TransformerEncoderLayer(c, heads, 16, dropout=0.0,
                                          activation="relu", batch_first=True)
    tl.eval()
    sd = tl.state_dict()
    qw = np.asarray(p["self_attn"]["q_proj"]["kernel"]).T
    kw = np.asarray(p["self_attn"]["k_proj"]["kernel"]).T
    vw = np.asarray(p["self_attn"]["v_proj"]["kernel"]).T
    sd["self_attn.in_proj_weight"] = torch.from_numpy(np.concatenate([qw, kw, vw], 0).copy())
    sd["self_attn.in_proj_bias"] = torch.from_numpy(np.concatenate([
        np.asarray(p["self_attn"]["q_proj"]["bias"]),
        np.asarray(p["self_attn"]["k_proj"]["bias"]),
        np.asarray(p["self_attn"]["v_proj"]["bias"])], 0).copy())
    sd["self_attn.out_proj.weight"] = torch.from_numpy(np.asarray(p["self_attn"]["out_proj"]["kernel"]).T.copy())
    sd["self_attn.out_proj.bias"] = torch.from_numpy(np.asarray(p["self_attn"]["out_proj"]["bias"]).copy())
    sd["linear1.weight"] = torch.from_numpy(np.asarray(p["linear1"]["kernel"]).T.copy())
    sd["linear1.bias"] = torch.from_numpy(np.asarray(p["linear1"]["bias"]).copy())
    sd["linear2.weight"] = torch.from_numpy(np.asarray(p["linear2"]["kernel"]).T.copy())
    sd["linear2.bias"] = torch.from_numpy(np.asarray(p["linear2"]["bias"]).copy())
    sd["norm1.weight"] = torch.from_numpy(np.asarray(p["norm1"]["scale"]).copy())
    sd["norm1.bias"] = torch.from_numpy(np.asarray(p["norm1"]["bias"]).copy())
    sd["norm2.weight"] = torch.from_numpy(np.asarray(p["norm2"]["scale"]).copy())
    sd["norm2.bias"] = torch.from_numpy(np.asarray(p["norm2"]["bias"]).copy())
    tl.load_state_dict(sd)

    ours = np.asarray(enc.apply(v, x, key_padding_mask=pad, deterministic=True))
    with torch.no_grad():
        theirs = tl(torch.from_numpy(x),
                    src_key_padding_mask=torch.from_numpy(pad)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_tensor_parallel_param_specs(rng):
    """FFN kernels get megatron-style specs; everything else replicates."""
    from jax.sharding import PartitionSpec as P

    from i2rnet_tpu.parallel.mesh import make_mesh, tensor_parallel_param_specs

    model = tiny_model()
    images, pos, valid = _batch(rng, b=1, n=2)
    variables = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    specs = tensor_parallel_param_specs(variables["params"], mesh)

    flat = dict(jax.tree_util.tree_leaves_with_path(specs))
    import jax.tree_util as jtu
    got = {jtu.keystr(p): s for p, s in jax.tree_util.tree_leaves_with_path(specs)}
    l1 = [k for k in got if "linear1" in k and "kernel" in k]
    l2 = [k for k in got if "linear2" in k and "kernel" in k]
    assert l1 and l2
    assert all(got[k] == P(None, "model") for k in l1)
    assert all(got[k] == P("model", None) for k in l2)
    biases = [k for k in got if k.endswith("['bias']")]
    assert all(got[k] == P() for k in biases)


def test_encoder_fused_ffn_matches_unfused(rng):
    """Post-norm encoder layer: fused LN1->FFN->residual->LN2 Pallas tail ==
    flax ops (eval)."""
    import jax
    import jax.numpy as jnp

    from i2rnet_tpu.models.encoder import TransformerEncoder

    b, s, c = 2, 100, 24
    src = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    mask = jnp.zeros((b, s), bool).at[:, -7:].set(True)
    base = TransformerEncoder(2, 2, 48, use_pallas=False, fused_ffn_eval=False,
                              dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), src, mask, None, True)
    ref = np.asarray(base.apply(v, src, mask, None, True))
    fused = TransformerEncoder(2, 2, 48, use_pallas=False, fused_ffn_eval=True,
                               dtype=jnp.float32)
    got = np.asarray(fused.apply(v, src, mask, None, True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_encoder_fused_ffn_gradients_match(rng):
    """The fused FFN's custom VJP (XLA backward) matches the unfused path's
    gradients through an eval-mode call."""
    import jax
    import jax.numpy as jnp

    from i2rnet_tpu.models.encoder import TransformerEncoder

    b, s, c = 1, 50, 16
    src = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    base = TransformerEncoder(1, 2, 32, use_pallas=False, fused_ffn_eval=False,
                              dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), src, None, None, True)
    fused = TransformerEncoder(1, 2, 32, use_pallas=False, fused_ffn_eval=True,
                               dtype=jnp.float32)

    def loss(params, mod):
        out = mod.apply({"params": params}, src, None, None, True)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(lambda p: loss(p, base))(v["params"])
    g_fused = jax.grad(lambda p: loss(p, fused))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                                 rtol=2e-3, atol=1e-5),
        g_fused, g_ref)
