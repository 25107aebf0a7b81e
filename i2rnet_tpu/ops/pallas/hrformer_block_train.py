"""Fused HRFormer window-attention block for TRAINING (custom VJP).

The released two-stage recipes fine-tune the first stage jointly
(``experiments/*/interformer_*_hrt_*.yaml`` all set ``SINGLEFORMER_FIX:
false``), so the unfrozen train step matters: traced at 322.6 ms/step on
v5e, 42% generic elementwise fusions (f32 LayerNorm/GELU chains) + 17%
reductions + 15% window-relayout copies, MXU ~idle — the same traffic
profile the eval-side whole-block kernels removed from inference
(``hrformer_block.py``).

This module gives the attention half of the block — which carries no
BatchNorm, so training math equals eval math — a Pallas forward AND a
Pallas backward:

    out = x + s * unpad(WindowMHSA(LN1(x)))          (s = per-sample
                                                      droppath scale)

* forward: one HBM read of x, one write of out (``_fwd_kernel`` —
  the eval kernel plus the droppath scale).
* backward: flash-style recompute — one read of x and dy, one write of
  dx, weight/bias/LN-param grads accumulated across the sample grid in
  VMEM (TPU grid programs run sequentially, so ``@pl.when(i == 0)``
  zero-init + ``+=`` is exact).

Head-packing layout (q/k/v in per-head 128-lane blocks, 1/sqrt(d) folded
into the packed q weights) matches :func:`hrformer_block.pack_head_weights`;
:func:`unpack_head_grads` maps packed grads back to flax param shapes
(un-padding the lanes and un-folding the q scale).

The MlpDWBN half keeps the unfused path in training: its three BatchNorms
need cross-sample batch statistics, which a per-sample kernel cannot
produce in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2rnet_tpu.ops.pallas.hrformer_block import (LANE, _ln, _rep, _round_up,
                                                  pack_head_weights)


def _geometry(h, w, window):
    pad_h, pad_w = (-h) % window, (-w) % window
    pt, pl_ = pad_h // 2, pad_w // 2
    hp, wp = h + pad_h, w + pad_w
    nh, nw = hp // window, wp // window
    return pad_h, pad_w, pt, pl_, hp, wp, nh, nw


def _fwd_kernel(x_ref, s_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, o_ref, *,
                h: int, w: int, c: int, heads: int, window: int):
    dt = x_ref.dtype
    x = x_ref[0]
    cp = _round_up(c, LANE)
    hp_blk = heads * LANE
    pad_h, pad_w, pt, pl_, hp, wp, nh, nw = _geometry(h, w, window)
    nwin, t = nh * nw, window * window

    xf = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c))).astype(jnp.float32)
    s = s_ref[pl.program_id(0)]
    y = _ln(xf, g1_ref[0], b1_ref[0], c)
    yb = y.astype(dt)
    ypad = jnp.pad(yb, ((pt, pad_h - pt), (pl_, pad_w - pl_), (0, 0)))
    tok = ypad.reshape(nh, window, nw, window, cp).transpose(0, 2, 1, 3, 4)
    t2 = tok.reshape(nwin * t, cp)

    def proj(wref, bref):
        o = jnp.dot(t2, wref[:], preferred_element_type=jnp.float32) + bref[0]
        return o.astype(dt).reshape(nwin, t, hp_blk)

    q3, k3, v3 = proj(wq_ref, bq_ref), proj(wk_ref, bk_ref), proj(wv_ref, bv_ref)

    outs = []
    for hi in range(heads):
        sl = slice(hi * LANE, (hi + 1) * LANE)
        logits = jax.lax.dot_general(
            q3[:, :, sl], k3[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1).astype(dt)
        outs.append(jax.lax.dot_general(
            p, v3[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
    o3 = jnp.concatenate(outs, -1)

    attn = jnp.dot(o3.reshape(nwin * t, hp_blk), wo_ref[:],
                   preferred_element_type=jnp.float32) + bo_ref[0]
    a = attn.astype(jnp.float32).reshape(nh, nw, window, window, cp)
    a = a.transpose(0, 2, 1, 3, 4).reshape(hp, wp, cp)
    o_ref[0] = x + (s * a[pt:pt + h, pl_:pl_ + w, :c]).astype(dt)


def _bwd_kernel(x_ref, dy_ref, s_ref, g1_ref, b1_ref, wq_ref, bq_ref,
                wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
                dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                dwo_ref, dbo_ref, dg1_ref, db1_ref, *,
                h: int, w: int, c: int, heads: int, window: int,
                eps: float = 1e-6):
    dt = x_ref.dtype
    x = x_ref[0]
    dy = dy_ref[0]
    s = s_ref[pl.program_id(0)]
    cp = _round_up(c, LANE)
    hp_blk = heads * LANE
    pad_h, pad_w, pt, pl_, hp, wp, nh, nw = _geometry(h, w, window)
    nwin, t = nh * nw, window * window

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    # ---- recompute forward pieces (LN, tokens, projections, softmax) ----
    xf = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c))).astype(jnp.float32)
    mean = jnp.sum(xf, -1, keepdims=True) / c
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
    diff = jnp.where(lane < c, xf - mean, 0.0)
    var = jnp.sum(diff * diff, -1, keepdims=True) / c
    rstd = jax.lax.rsqrt(var + eps)
    xhat = diff * rstd                                   # [h, w, cp]
    y = xhat * g1_ref[0][None, None, :] + b1_ref[0][None, None, :]
    yb = y.astype(dt)
    ypad = jnp.pad(yb, ((pt, pad_h - pt), (pl_, pad_w - pl_), (0, 0)))
    tok = ypad.reshape(nh, window, nw, window, cp).transpose(0, 2, 1, 3, 4)
    t2 = tok.reshape(nwin * t, cp)

    def proj(wref, bref):
        o = jnp.dot(t2, wref[:], preferred_element_type=jnp.float32) + bref[0]
        return o.astype(dt).reshape(nwin, t, hp_blk)

    q3, k3, v3 = proj(wq_ref, bq_ref), proj(wk_ref, bk_ref), proj(wv_ref, bv_ref)

    # ---- incoming grad, windowed: da = s * dy on the unpadded region ----
    dyf = jnp.pad(dy, ((0, 0), (0, 0), (0, cp - c))).astype(jnp.float32) * s
    dapad = jnp.pad(dyf, ((pt, pad_h - pt), (pl_, pad_w - pl_), (0, 0)))
    datok = dapad.reshape(nh, window, nw, window, cp).transpose(0, 2, 1, 3, 4)
    da2 = datok.reshape(nwin * t, cp)                    # f32

    dbo_ref[...] += jnp.sum(da2, axis=0, keepdims=True)
    da2b = da2.astype(dt)
    do3 = jnp.dot(da2b, wo_ref[:].T,
                  preferred_element_type=jnp.float32)    # [nwin*t, hp_blk]

    o3_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for hi in range(heads):
        sl = slice(hi * LANE, (hi + 1) * LANE)
        qh, kh, vh = q3[:, :, sl], k3[:, :, sl], v3[:, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [nwin, t, t]
        p = jax.nn.softmax(logits, axis=-1)              # f32
        pb = p.astype(dt)
        o3_parts.append(jax.lax.dot_general(
            pb, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
        doh = do3[:, sl].astype(dt).reshape(nwin, t, LANE)
        # dv = P^T do ; dP = do v^T
        dv_parts.append(jax.lax.dot_general(
            pb, doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))         # [nwin, t(k), LANE]
        dp = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [nwin, t(q), t(k)]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(dt)
        dq_parts.append(jax.lax.dot_general(
            dsb, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))         # [nwin, t, LANE]
        dk_parts.append(jax.lax.dot_general(
            dsb, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))         # [nwin, t(k), LANE]

    o3 = jnp.concatenate(o3_parts, -1).reshape(nwin * t, hp_blk)
    dq3 = jnp.concatenate(dq_parts, -1).reshape(nwin * t, hp_blk)
    dk3 = jnp.concatenate(dk_parts, -1).reshape(nwin * t, hp_blk)
    dv3 = jnp.concatenate(dv_parts, -1).reshape(nwin * t, hp_blk)

    dwo_ref[...] += jnp.dot(o3.T, da2b, preferred_element_type=jnp.float32)

    t2f = t2  # dt
    dq3b, dk3b, dv3b = (v.astype(dt) for v in (dq3, dk3, dv3))
    dwq_ref[...] += jnp.dot(t2f.T, dq3b, preferred_element_type=jnp.float32)
    dbq_ref[...] += jnp.sum(dq3, axis=0, keepdims=True)
    dwk_ref[...] += jnp.dot(t2f.T, dk3b, preferred_element_type=jnp.float32)
    dbk_ref[...] += jnp.sum(dk3, axis=0, keepdims=True)
    dwv_ref[...] += jnp.dot(t2f.T, dv3b, preferred_element_type=jnp.float32)
    dbv_ref[...] += jnp.sum(dv3, axis=0, keepdims=True)

    dt2 = (jnp.dot(dq3b, wq_ref[:].T, preferred_element_type=jnp.float32)
           + jnp.dot(dk3b, wk_ref[:].T, preferred_element_type=jnp.float32)
           + jnp.dot(dv3b, wv_ref[:].T, preferred_element_type=jnp.float32))

    # un-window back to the [h, w, cp] LN-output frame
    dtok = dt2.reshape(nh, nw, window, window, cp).transpose(0, 2, 1, 3, 4)
    dypad = dtok.reshape(hp, wp, cp)
    dy_ln = dypad[pt:pt + h, pl_:pl_ + w, :]             # f32 [h, w, cp]

    dg1_ref[...] += jnp.sum(dy_ln * xhat, axis=(0, 1))[None, :]
    db1_ref[...] += jnp.sum(dy_ln, axis=(0, 1))[None, :]

    dyg = dy_ln * g1_ref[0][None, None, :]               # zero on pad lanes
    m1 = jnp.sum(dyg, -1, keepdims=True) / c
    m2 = jnp.sum(dyg * xhat, -1, keepdims=True) / c
    # da2 already carries the droppath scale s, so dy_ln/dx_ln do too —
    # the residual path adds dy unscaled
    dx_ln = rstd * (dyg - m1 - xhat * m2)
    dx_ref[0] = dy + dx_ln[:, :, :c].astype(dt)


def unpack_head_grads(dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwo3, dbo3,
                      heads: int, c: int):
    """Packed 128-lane-per-head grads -> flax Dense param grads.

    Inverse of :func:`hrformer_block.pack_head_weights`: un-pads the head
    lanes and un-folds the 1/sqrt(d) query scaling (wq3 = s*Wq so
    dWq = s * dwq3)."""
    d = c // heads
    s = 1.0 / np.sqrt(d)

    def cols(w3, b3, scale=1.0):
        dw = jnp.concatenate(
            [w3[:c, h * LANE:h * LANE + d] for h in range(heads)], axis=1)
        db = jnp.concatenate(
            [b3[0, h * LANE:h * LANE + d] for h in range(heads)])
        return dw * scale, db * scale

    dwq, dbq = cols(dwq3, dbq3, s)
    dwk, dbk = cols(dwk3, dbk3)
    dwv, dbv = cols(dwv3, dbv3)
    dwo = jnp.concatenate(
        [dwo3[h * LANE:h * LANE + d, :c] for h in range(heads)], axis=0)
    dbo = dbo3[0, :c]
    return dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo


def _packed(x_dtype, c, heads, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo):
    cp = _round_up(c, LANE)
    wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3 = pack_head_weights(
        wq, bq, wk, bk, wv, bv, wo, bo, heads)
    g1p = jnp.pad(g1.astype(jnp.float32), (0, cp - c))[None, :]
    b1p = jnp.pad(b1.astype(jnp.float32), (0, cp - c))[None, :]
    wq3 = jnp.pad(wq3.astype(x_dtype), ((0, cp - c), (0, 0)))
    wk3 = jnp.pad(wk3.astype(x_dtype), ((0, cp - c), (0, 0)))
    wv3 = jnp.pad(wv3.astype(x_dtype), ((0, cp - c), (0, 0)))
    wo3 = jnp.pad(wo3.astype(x_dtype), ((0, 0), (0, cp - c)))
    bo3 = jnp.pad(bo3.astype(jnp.float32), ((0, 0), (0, cp - c)))
    bq3, bk3, bv3 = (v.astype(jnp.float32) for v in (bq3, bk3, bv3))
    return g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3


def _fwd_pallas(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                heads, window, interpret):
    p, h, w, c = x.shape
    dt = x.dtype
    g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3 = _packed(
        dt, c, heads, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)
    s2 = s.astype(jnp.float32).reshape(p)
    args = (x, s2, g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, c=c, heads=heads,
                          window=window),
        grid=(p,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_rep(a) for a in args[2:]],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * h * w * (4 * c * heads * LANE
                                   + 2 * heads * LANE * window * window),
            bytes_accessed=2 * p * h * w * c * x.dtype.itemsize,
            transcendentals=p * h * w * window * window * heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _bwd_pallas(x, dy, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                heads, window, interpret):
    p, h, w, c = x.shape
    dt = x.dtype
    cp = _round_up(c, LANE)
    hpb = heads * LANE
    g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3, _ = _packed(
        dt, c, heads, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)
    s2 = s.astype(jnp.float32).reshape(p)
    args = (x, dy, s2, g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3)
    f32 = jnp.float32

    def acc(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, c=c, heads=heads,
                          window=window),
        grid=(p,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_rep(a) for a in args[3:]],
        out_specs=(
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            acc((cp, hpb)), acc((1, hpb)),   # dwq, dbq
            acc((cp, hpb)), acc((1, hpb)),   # dwk, dbk
            acc((cp, hpb)), acc((1, hpb)),   # dwv, dbv
            acc((hpb, cp)), acc((1, cp)),    # dwo, dbo
            acc((1, cp)), acc((1, cp)),      # dg1, db1
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, h, w, c), dt),
            jax.ShapeDtypeStruct((cp, hpb), f32),
            jax.ShapeDtypeStruct((1, hpb), f32),
            jax.ShapeDtypeStruct((cp, hpb), f32),
            jax.ShapeDtypeStruct((1, hpb), f32),
            jax.ShapeDtypeStruct((cp, hpb), f32),
            jax.ShapeDtypeStruct((1, hpb), f32),
            jax.ShapeDtypeStruct((hpb, cp), f32),
            jax.ShapeDtypeStruct((1, cp), f32),
            jax.ShapeDtypeStruct((1, cp), f32),
            jax.ShapeDtypeStruct((1, cp), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * p * h * w * (4 * c * heads * LANE
                                   + 2 * heads * LANE * window * window),
            bytes_accessed=3 * p * h * w * c * x.dtype.itemsize,
            transcendentals=p * h * w * window * window * heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return outs


@functools.lru_cache(maxsize=None)
def _make_attn_train(heads: int, window: int, interpret: bool):
    @jax.custom_vjp
    def f(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo):
        return _fwd_pallas(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                           heads, window, interpret)

    def fwd(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo):
        out = f(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)
        return out, (x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)

    def bwd(res, dy):
        x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo = res
        (dx, dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwo3, dbo3,
         dg1p, db1p) = _bwd_pallas(x, dy.astype(x.dtype), s, g1, b1,
                                   wq, bq, wk, bk, wv, bv, wo, bo,
                                   heads, window, interpret)
        c = x.shape[-1]
        dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = unpack_head_grads(
            dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwo3, dbo3, heads, c)
        dg1 = dg1p[0, :c].astype(g1.dtype)
        db1 = db1p[0, :c].astype(b1.dtype)
        ds = jnp.zeros_like(s)  # droppath mask is a non-trained input
        return (dx, ds, dg1, db1,
                dwq.astype(wq.dtype), dbq.astype(bq.dtype),
                dwk.astype(wk.dtype), dbk.astype(bk.dtype),
                dwv.astype(wv.dtype), dbv.astype(bv.dtype),
                dwo.astype(wo.dtype), dbo.astype(bo.dtype))

    f.defvjp(fwd, bwd)
    return f


def window_attn_block_train(x, s, ln1_scale, ln1_bias, wq, bq, wk, bk,
                            wv, bv, wo, bo, heads: int, window: int = 7,
                            interpret: bool = False):
    """``x + s[:, None, None, None] * WindowMHSA(LN1(x))`` with a Pallas
    forward and Pallas backward (custom VJP).

    Args: x [P, H, W, C]; s [P] droppath scale (0 or 1/keep; ones when
    droppath is off); ln params [C] f32; q/k/v/out flax Dense params
    ([C, C] in-features-first, biases [C]). Differentiable in everything
    but ``s``.
    """
    return _make_attn_train(heads, window, interpret)(
        x, s, ln1_scale, ln1_bias, wq, bq, wk, bk, wv, bv, wo, bo)
