"""Fused masked multi-head self-attention Pallas kernel.

The hot op of both relation encoders (intra: 3072 tokens/person; inter:
N_max*192 tokens/image with key-padding). One kernel fuses
QK^T -> +mask -> softmax -> @V per (batch*head, q-block), keeping the logits
tile in VMEM instead of materializing [B, H, S, S] in HBM — the main
bandwidth win over the unfused path at these sequence lengths.

Layout: heads are folded into the batch ([B*H, S, D]); D is zero-padded to
the 128-lane width; S is padded to the q-block size. K/V for one (b, h) fit
comfortably in VMEM at these sizes (S <= ~4k, D <= 128), so each program
reads its q tile and the full K/V, computes a [BLOCK_Q, S] logits tile, and
writes the [BLOCK_Q, D] output tile.

Numerical semantics match :func:`i2rnet_tpu.ops.attention.masked_mhsa_xla`
(additive -1e30 at padded keys, f32 softmax).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)            # [BQ, D]
    k = k_ref[0].astype(jnp.float32)            # [S, D]
    v = v_ref[0].astype(jnp.float32)            # [S, D]
    bias = mask_ref[0].astype(jnp.float32)      # [1, S] additive

    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # [BQ, S]
    logits = logits + bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def masked_mhsa_pallas(q, k, v, num_heads: int,
                       key_padding_mask: Optional[jax.Array] = None,
                       interpret: bool = False):
    """Fused masked MHSA. q/k/v [B, S, C]; mask [B, S] bool (True = pad)."""
    b, s, c = q.shape
    h = num_heads
    d = c // h
    scale = 1.0 / (d ** 0.5)

    d_pad = max(128, ((d + 127) // 128) * 128)
    s_pad = ((s + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q

    def fold(x):
        x = x.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    qf, kf, vf = fold(q), fold(k), fold(v)

    if key_padding_mask is None:
        bias = jnp.zeros((b, s), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, _NEG_INF, 0.0).astype(jnp.float32)
    bias = jnp.pad(bias, ((0, 0), (0, s_pad - s)), constant_values=_NEG_INF)
    bias = jnp.repeat(bias[:, None, :], h, axis=1).reshape(b * h, 1, s_pad)

    grid = (b * h, s_pad // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s_pad * s_pad * d_pad,
            bytes_accessed=4 * b * h * s_pad * d_pad * 4,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, bias)

    out = out[:, :s, :d].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out.reshape(b, s, c)
