"""Flash training-attention kernel (ops/pallas/mhsa_train.py).

Oracle strategy: the Pallas interpreter cannot emulate the TPU PRNG, so the
kernel accepts an explicit uint32 bits array (``dropout_bits``).  Tests feed
IDENTICAL bits to the kernel and to a plain-XLA reimplementation of the
torch attention-weight-dropout semantics (reference
``lib/models/attention.py:451-454``) and require exact forward AND gradient
agreement — covering the custom-VJP backward kernel including the dropout
mask, softmax VJP, and dk/dv grid accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2rnet_tpu.ops.pallas.mhsa_train import _threshold, masked_mhsa_train

B, S, C, H = 2, 100, 64, 2
BLOCK_Q = 64
S_PAD = 128  # S rounded up to BLOCK_Q


def _data(seed=0, masked=True):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.75) if masked else None
    bits = jnp.asarray(
        rng.randint(0, 2 ** 32, size=(B * H, S_PAD, S_PAD),
                    dtype=np.uint64).astype(np.uint32))
    g = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    return q, k, v, mask, bits, g


def _oracle(q, k, v, mask, bits, rate):
    """Unfused XLA attention with the SAME keep mask as the kernel."""
    d = C // H
    qh = q.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], -1e30, logits)
    w = jax.nn.softmax(logits, axis=-1)
    if rate > 0.0:
        keep = (bits.reshape(B, H, S_PAD, S_PAD)[:, :, :S, :S]
                >= np.uint32(_threshold(rate)))
        w = jnp.where(keep, w / (1.0 - rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, S, C)


def _kernel(q, k, v, mask, bits, rate):
    return masked_mhsa_train(q, k, v, H, key_padding_mask=mask,
                             dropout_rate=rate, dropout_bits=bits,
                             block_q=BLOCK_Q, interpret=True)


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("rate", [0.0, 0.1, 0.5])
def test_forward_matches_xla_given_bits(masked, rate):
    q, k, v, mask, bits, _ = _data(masked=masked)
    np.testing.assert_allclose(_kernel(q, k, v, mask, bits, rate),
                               _oracle(q, k, v, mask, bits, rate),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("rate", [0.0, 0.1])
def test_grads_match_xla_given_bits(rate):
    q, k, v, mask, bits, g = _data(masked=True)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_, mask, bits, rate) * g)

    go = jax.grad(loss(_oracle), argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(loss(_kernel), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", go, gk):
        np.testing.assert_allclose(b, a, atol=5e-6, rtol=1e-4,
                                   err_msg=f"d{name}")


def test_dropout_zero_equals_eval_path():
    from i2rnet_tpu.ops.attention import masked_mhsa_xla
    q, k, v, mask, _, _ = _data(masked=True)
    out = masked_mhsa_train(q, k, v, H, key_padding_mask=mask,
                            dropout_rate=0.0, block_q=BLOCK_Q, interpret=True)
    np.testing.assert_allclose(out, masked_mhsa_xla(q, k, v, H, mask),
                               atol=2e-6, rtol=1e-5)


def test_dispatch_generates_bits_on_cpu():
    """masked_mhsa_flash_train draws bits outside the kernel on interpret
    backends; output must be a valid dropout sample: zeros appear, and
    E[out] stays near the no-dropout output (1/(1-p) rescale)."""
    from i2rnet_tpu.ops.attention import (masked_mhsa_flash_train,
                                          masked_mhsa_xla)
    q, k, v, mask, _, _ = _data(masked=False)
    rate = 0.25
    outs = [masked_mhsa_flash_train(q, k, v, H, None, dropout_rate=rate,
                                    dropout_rng=jax.random.PRNGKey(i))
            for i in range(16)]
    assert not np.allclose(outs[0], outs[1])  # different rngs -> different
    mean = np.mean([np.asarray(o) for o in outs], axis=0)
    ref = np.asarray(masked_mhsa_xla(q, k, v, H, None))
    # unbiasedness: the sample mean tracks the deterministic output
    corr = np.corrcoef(mean.ravel(), ref.ravel())[0, 1]
    assert corr > 0.95, corr


def test_encoder_layer_flash_train_grad_finite():
    """Integration: TransformerEncoder training forward+backward through the
    flash path (CPU interpret, bits drawn by the dispatch)."""
    from i2rnet_tpu.models.encoder import TransformerEncoder
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(2, 96, 32), jnp.float32)
    mask = jnp.asarray(rng.rand(2, 96) > 0.8)
    enc = TransformerEncoder(num_layers=2, num_heads=2, dim_feedforward=64,
                             use_pallas=True, flash_train=True)
    variables = enc.init(jax.random.PRNGKey(0), src, mask,
                         deterministic=True)

    def loss(params):
        out = enc.apply({"params": params}, src, mask, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
