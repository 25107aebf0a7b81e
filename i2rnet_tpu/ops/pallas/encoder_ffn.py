"""Fused DETR-encoder FFN tail (eval mode).

Completes the north-star "MHSA + MLP as Pallas kernels" for the relation
encoders: after the attention residual, the post-norm DETR layer computes

    n   = LayerNorm1(src)
    out = LayerNorm2(n + linear2(relu(linear1(n))))

(reference ``lib/models/attention.py:100-112``). This kernel runs that whole
tail in one pass over the token rows — one HBM read of [T, C] and one write —
instead of XLA's LN->matmul->LN chain with f32 intermediates.

Eval-only (dropout is a no-op); training uses the unfused flax path.
Token rows are tiled over the grid; C/F stay unpadded in HBM (lane padding
happens in VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_rows(xf, g, b, c_real, eps):
    """LayerNorm over the last axis of [T, cp] with zero-padded lanes."""
    mean = jnp.sum(xf, -1, keepdims=True) / c_real
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, xf.shape[-1]), 1)
    diff = jnp.where(lane < c_real, xf - mean, 0.0)
    var = jnp.sum(diff * diff, -1, keepdims=True) / c_real
    return diff * jax.lax.rsqrt(var + eps) * g[None, :] + b[None, :]


def _kernel(x_ref, n1_ref, w1_ref, b1_ref, w2_ref, b2_ref, n2_ref, o_ref, *,
            c: int, eps: float):
    dt = x_ref.dtype
    x = x_ref[:]                                     # [TS, c]
    cp = _round_up(c, 128)
    xf = jnp.pad(x, ((0, 0), (0, cp - c))).astype(jnp.float32)

    n = _ln_rows(xf, n1_ref[0], n1_ref[1], c, eps)
    nb = n.astype(dt)
    h = jnp.dot(nb, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    h = jnp.maximum(h, 0.0).astype(dt)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[0]
    z = n + y                                        # residual on the normed src
    out = _ln_rows(z, n2_ref[0], n2_ref[1], c, eps)
    o_ref[:] = out.astype(dt)[:, :c]


def _ffn_jnp(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias, eps):
    """Pure-jnp mirror used for the custom VJP's backward pass."""
    def ln(v, g, b):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, -1, keepdims=True)
        var = jnp.mean((vf - mean) ** 2, -1, keepdims=True)
        return (vf - mean) * jax.lax.rsqrt(var + eps) * g + b

    n = ln(x, n1_scale, n1_bias)
    h = jnp.maximum(
        jnp.dot(n.astype(x.dtype), w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1, 0.0)
    y = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    return ln(n + y, n2_scale, n2_bias).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _ffn_ad(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias,
            eps, interpret):
    return _ffn_pallas(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale,
                       n2_bias, eps, interpret)


def _ffn_fwd(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias,
             eps, interpret):
    out = _ffn_ad(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias,
                  eps, interpret)
    return out, (x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias)


def _ffn_bwd(eps, interpret, res, g):
    # Pallas forward + XLA backward (the fused kernel is eval-path; grads
    # through eval-mode calls — e.g. saliency, remat checks — recompute via
    # the jnp mirror)
    _, vjp = jax.vjp(lambda *p: _ffn_jnp(*p, eps), *res)
    return vjp(g)


_ffn_ad.defvjp(_ffn_fwd, _ffn_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def encoder_ffn_fused(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias,
                      eps: float = 1e-5, interpret: bool = False):
    """``LN2(LN1(x) + linear2(relu(linear1(LN1(x)))))`` over token rows.

    Args: x [..., C] (leading dims flattened to rows); w1 [C, F]; w2 [F, C];
    LN params [C] f32. Returns the same shape as x. Differentiable via a
    custom VJP (XLA backward over the jnp mirror).
    """
    return _ffn_ad(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias,
                   eps, interpret)


def _ffn_pallas(x, n1_scale, n1_bias, w1, b1, w2, b2, n2_scale, n2_bias,
                eps, interpret):
    lead = x.shape[:-1]
    c = x.shape[-1]
    f = w1.shape[-1]
    cp = _round_up(c, 128)
    fp = _round_up(f, 128)
    dt = x.dtype

    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, c)
    rp = _round_up(rows, ROW_TILE)
    x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)))

    n1 = jnp.stack([jnp.pad(n1_scale.astype(jnp.float32), (0, cp - c)),
                    jnp.pad(n1_bias.astype(jnp.float32), (0, cp - c))])
    n2 = jnp.stack([jnp.pad(n2_scale.astype(jnp.float32), (0, cp - c)),
                    jnp.pad(n2_bias.astype(jnp.float32), (0, cp - c))])
    w1p = jnp.pad(w1.astype(dt), ((0, cp - c), (0, fp - f)))
    b1p = jnp.pad(b1.astype(jnp.float32), (0, fp - f))[None, :]
    w2p = jnp.pad(w2.astype(dt), ((0, fp - f), (0, cp - c)))
    b2p = jnp.pad(b2.astype(jnp.float32), (0, cp - c))[None, :]

    def rep(w):
        return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                            memory_space=pltpu.VMEM)

    args = (x2, n1, w1p, b1p, w2p, b2p, n2)
    out = pl.pallas_call(
        functools.partial(_kernel, c=c, eps=eps),
        grid=(rp // ROW_TILE,),
        in_specs=[pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [rep(a) for a in args[1:]],
        out_specs=pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * 2 * cp * fp,
            bytes_accessed=2 * rp * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:rows].reshape(lead + (c,))
