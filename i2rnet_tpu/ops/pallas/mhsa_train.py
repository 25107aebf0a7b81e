"""Flash MHSA with in-kernel attention-weight dropout — the TRAINING kernel.

Why it exists: the torch-semantics training path (dropout on the softmax
probabilities, reference ``lib/models/attention.py:451-454``) forces the XLA
lowering to materialize the ``[B*H, S, S]`` probability tensor in HBM three
times per layer (forward softmax+dropout fusion, dO @ P^T, dP softmax-VJP
fusion).  At the intra-encoder geometry (112 persons x 3072 tokens) that is
~4.2 GB f32 *per op* — measured 23-25 ms each on v5e, ~430 ms of the 855 ms
TransPose-H train step.

This kernel streams the attention like the eval kernel
(:mod:`i2rnet_tpu.ops.pallas.mhsa`) — per (batch*head, q-block) program the
logits tile lives only in VMEM — and reproduces attention-weight dropout
*exactly in distribution* with the TPU's counter PRNG:

* forward: ``p = softmax(qk^T * scale + bias)``; drop each probability with
  probability ``rate`` and rescale survivors by ``1/(1-rate)`` (torch
  ``F.dropout`` semantics);
* backward: regenerates the identical dropout mask from the same
  ``(seed, program_id)`` tuple — nothing S x S ever touches HBM.

The RNG *stream* differs from ``jax.random.bernoulli`` (and from torch): each
(q-block, head) tile draws its bits from ``pltpu.prng_seed(seed0, seed1, i, j)``.
Every weight is still dropped i.i.d. with probability ``rate``, which is the
whole contract of dropout — the reference's own stream is torch-global-RNG
anyway, so no stream parity exists to preserve.  DOCUMENTED DEVIATION
(README): with ``TPU.FLASH_TRAIN_ATTENTION`` the dropout stream is
kernel-internal.

Backward math (full-row tiles make the flash "delta" trick unnecessary —
``sum_j p_j dp_j`` is computed exactly in-kernel):

    p   = softmax(l),  pd = keep ? p/(1-r) : 0,     out = pd @ V
    dV  = pd^T @ dO
    dpd = dO @ V^T,    dp = keep ? dpd/(1-r) : 0
    dl  = p * (dp - rowsum(p * dp))
    dQ  = dl @ K * scale,   dK = dl^T @ Q * scale

For CPU tests (the Pallas interpreter cannot emulate the TPU PRNG
primitives) the same kernels accept a precomputed ``[B*H, S, S]`` uint32 bits
array; tests feed identical bits to this kernel and to a plain-XLA oracle and
assert exact forward/gradient agreement.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2rnet_tpu.ops.pallas.prng import (GOLDEN, keep_mask as _keep_mask,
                                        rng_seeds as _rng_seeds,
                                        threshold as _threshold)

_NEG_INF = -1e30
DEFAULT_BLOCK_Q = 256


def _softmax_tile(q, k, bias, scale):
    """[BQ, S] f32 probabilities for one q tile (full key row in VMEM)."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits * scale + bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _tile_bits(state, shape, mode):
    """The dropout bits for this (i, j) program, by mode."""
    if mode == "prng":
        # Mosaic accepts at most TWO seed words: fold the flat program index
        # into the second via a golden-ratio multiply (odd constant ->
        # injective mod 2^32, so every (i, j) block gets a distinct stream).
        seed_ref, = state
        idx = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + idx * GOLDEN)
        return pltpu.prng_random_bits(shape)
    bits_ref, = state
    return bits_ref[0]


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, *rest,
                scale: float, rate: float, mode: str):
    state, o_ref = rest[:-1], rest[-1]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0].astype(jnp.float32)
    prob = _softmax_tile(q, k, bias, scale)
    if rate > 0.0:
        bits = _tile_bits(state, prob.shape, mode)
        prob = jnp.where(_keep_mask(bits, rate),
                         prob * (1.0 / (1.0 - rate)), 0.0)
    out = jax.lax.dot_general(prob.astype(v.dtype), v,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, *rest,
                scale: float, rate: float, mode: str):
    state = rest[:-3]
    dq_ref, dk_ref, dv_ref = rest[-3:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    bias = bias_ref[0].astype(jnp.float32)
    prob = _softmax_tile(q, k, bias, scale)                      # [BQ, S] f32

    dpd = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # dO @ V^T
    if rate > 0.0:
        bits = _tile_bits(state, prob.shape, mode)
        keep = _keep_mask(bits, rate)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, prob * inv, 0.0)
        dp = jnp.where(keep, dpd * inv, 0.0)
    else:
        pd = prob
        dp = dpd

    rowdot = jnp.sum(prob * dp, axis=-1, keepdims=True)
    dl = prob * (dp - rowdot)                                     # [BQ, S] f32
    dl_c = dl.astype(q.dtype)

    dq = jax.lax.dot_general(dl_c, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(dl_c, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0] += dk * scale
    dv = jax.lax.dot_general(pd.astype(g.dtype), g,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dv_ref[0] += dv


def _specs(s_pad, d_pad, block_q, mode):
    """(q, kv, bias, state) block specs shared by fwd and bwd."""
    qspec = pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    if mode == "prng":
        state = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    elif mode == "input":
        state = [pl.BlockSpec((1, block_q, s_pad), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    else:
        state = []
    return qspec, kv, bias, state


def _mode(rate, bits):
    return "none" if rate == 0.0 else ("input" if bits is not None else "prng")


def _state_ops(mode, seeds, bits):
    return {"prng": [seeds], "input": [bits], "none": []}[mode]


def _call_fwd(rate, scale, block_q, interpret, qf, kf, vf, bias, seeds, bits):
    bh, s_pad, d_pad = qf.shape
    mode = _mode(rate, bits)
    qspec, kv, bspec, state_specs = _specs(s_pad, d_pad, block_q, mode)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, mode=mode),
        grid=(bh, s_pad // block_q),
        in_specs=[qspec, kv, kv, bspec, *state_specs],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d_pad), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * s_pad * s_pad * d_pad,
            bytes_accessed=4 * bh * s_pad * d_pad * 2,
            transcendentals=bh * s_pad * s_pad),
        interpret=interpret,
    )(qf, kf, vf, bias, *_state_ops(mode, seeds, bits))


def _call_bwd(rate, scale, block_q, interpret, qf, kf, vf, bias, seeds, bits,
              g):
    bh, s_pad, d_pad = qf.shape
    mode = _mode(rate, bits)
    qspec, kv, bspec, state_specs = _specs(s_pad, d_pad, block_q, mode)
    acc = pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate, mode=mode),
        grid=(bh, s_pad // block_q),
        in_specs=[qspec, kv, kv, bspec, qspec, *state_specs],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            acc, acc,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d_pad), qf.dtype),
            # dk/dv accumulate across q-block grid steps in f32 (matches the
            # XLA backward's f32 dot accumulation), cast at the boundary
            jax.ShapeDtypeStruct((bh, s_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, s_pad, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # j accumulates into dk/dv — must iterate sequentially
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * s_pad * s_pad * d_pad,
            bytes_accessed=4 * bh * s_pad * d_pad * 5,
            transcendentals=bh * s_pad * s_pad),
        interpret=interpret,
    )(qf, kf, vf, bias, g, *_state_ops(mode, seeds, bits))
    return dq, dk.astype(kf.dtype), dv.astype(vf.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_core(rate, scale, block_q, interpret, qf, kf, vf, bias, seeds,
                bits):
    return _call_fwd(rate, scale, block_q, interpret, qf, kf, vf, bias,
                     seeds, bits)


def _flash_fwd(rate, scale, block_q, interpret, qf, kf, vf, bias, seeds,
               bits):
    out = _call_fwd(rate, scale, block_q, interpret, qf, kf, vf, bias,
                    seeds, bits)
    return out, (qf, kf, vf, bias, seeds, bits)


def _flash_bwd(rate, scale, block_q, interpret, res, g):
    qf, kf, vf, bias, seeds, bits = res
    dq, dk, dv = _call_bwd(rate, scale, block_q, interpret, qf, kf, vf, bias,
                           seeds, bits, g)
    dseeds = None if seeds is None else jnp.zeros_like(seeds)
    dbits = None if bits is None else jnp.zeros_like(bits)
    return dq, dk, dv, jnp.zeros_like(bias), dseeds, dbits


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def masked_mhsa_train(q, k, v, num_heads: int,
                      key_padding_mask: Optional[jax.Array] = None,
                      dropout_rate: float = 0.0,
                      dropout_rng: Optional[jax.Array] = None,
                      dropout_bits: Optional[jax.Array] = None,
                      block_q: int = DEFAULT_BLOCK_Q,
                      interpret: bool = False):
    """Training-path fused MHSA with attention-weight dropout.

    q/k/v: [B, S, C] projected tensors; key_padding_mask: [B, S] bool
    (True = pad, torch convention).  ``dropout_bits`` (tests only):
    ``[B*H, S_pad, S_pad]`` uint32 — drop where ``bits < rate * 2^32``.
    Differentiable w.r.t. q, k, v.
    """
    b, s, c = q.shape
    h = num_heads
    d = c // h
    d_pad = max(128, ((d + 127) // 128) * 128)
    s_pad = ((s + block_q - 1) // block_q) * block_q
    scale = 1.0 / (d ** 0.5)

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

    seeds = None
    if dropout_rate > 0.0 and dropout_bits is None:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng or "
                             "dropout_bits")
        if interpret:
            raise NotImplementedError(
                "in-kernel PRNG dropout is TPU-only; pass dropout_bits on "
                "interpret backends")
        seeds = _rng_seeds(dropout_rng)

    out = _flash_core(float(dropout_rate), scale, block_q, interpret,
                      qf, kf, vf, bias, seeds, dropout_bits)
    out = out[:, :s, :d].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out.reshape(b, s, c)
