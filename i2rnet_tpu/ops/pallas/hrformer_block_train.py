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

Structure (chosen after measuring three failed variants — see
docs/perf/hrformer_r02.md):

* forward (``_fwd_kernel``): one HBM read of the padded x, writes out AND
  the window tokens t2 = the windowed LN output — saving t2 is what lets
  the backward skip the LayerNorm + window-relayout recompute that made a
  monolithic backward kernel take ~14 min of Mosaic compile (and OOM the
  remote compile helper inside the full train program).
* backward = two small kernels + one host relayout:
  - host: ``da2 = window(pad(dy)) * s`` (XLA relayout, same cost class as
    the unfused path's single partition);
  - ``_attn_bwd_kernel`` (K1): pure token-space matmuls + softmax
    recompute from saved t2 — projections, per-head dP/dS, all weight and
    bias grads, dt2. No transposes, no LN;
  - ``_ln_bwd_kernel`` (K2): un-window dt2, recompute per-pixel LN pieces
    from x, LN backward -> dx (+ residual dy), dgamma/dbeta.

All three kernels grid over ``(samples, window-rows)``: each invocation
handles one 7-pixel-high strip of the padded map (= ``nw`` whole windows,
which the interlaced partition keeps contiguous in token space). Window
attention never crosses strips, and LayerNorm is per-pixel, so the strip
decomposition is exact. The point is Mosaic COMPILE cost: the helper
process that compiles TPU programs has a hard memory budget that scales
with total kernel IR, and whole-sample bodies (``nh*nw`` batched dots
unrolled per head) made one instance of this triple cost more than the
entire 88-instance fused-eval program — 14 train instances SIGKILLed it
(docs/perf/hrformer_r03.md). Strip bodies are ~``nh``x smaller; runtime
is unchanged (same total FLOPs/traffic, weights stay VMEM-resident
across grid steps).

Weight/bias/LN grads accumulate into VMEM output refs across the
(sample, strip) grid (TPU grid programs run sequentially:
``@pl.when(first)`` zero-init + ``+=`` is exact). Head packing (q/k/v in 128-lane head blocks, 1/sqrt(d)
folded into the packed q weights) matches
:func:`hrformer_block.pack_head_weights`; :func:`unpack_head_grads` maps
packed grads back to flax param shapes. Pad-token semantics match the
reference PadBlock (``hrformer.py:938-966``): pad tokens are exactly zero
after LN and attend through the projection biases.

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

from i2rnet_tpu.ops.pallas.hrformer_block import (LANE, _round_up,
                                                  pack_head_weights)


def _rep(w):
    return pl.BlockSpec(w.shape, lambda i, g: (0,) * w.ndim,
                        memory_space=pltpu.VMEM)


def _geometry(h, w, window):
    pad_h, pad_w = (-h) % window, (-w) % window
    pt, pl_ = pad_h // 2, pad_w // 2
    hp, wp = h + pad_h, w + pad_w
    nh, nw = hp // window, wp // window
    return pad_h, pad_w, pt, pl_, hp, wp, nh, nw


def _pad_hw(x, pt, pad_h, pl_, pad_w):
    return jnp.pad(x, ((0, 0), (pt, pad_h - pt), (pl_, pad_w - pl_), (0, 0)))


def _host_window(ypad, window, nh, nw):
    """[P, hp, wp, C] -> [P, nh*nw*window*window, C] window tokens."""
    p, _, _, ch = ypad.shape
    t = ypad.reshape(p, nh, window, nw, window, ch).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(p, nh * nw * window * window, ch)


# --------------------------------------------------------------------------
# forward: one window-row strip per step, emits out and the window tokens t2
# --------------------------------------------------------------------------

def _fwd_kernel(x_ref, s_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, o_ref, t2_ref, *,
                h: int, w: int, c: int, heads: int, window: int,
                eps: float = 1e-6):
    dt = x_ref.dtype
    x = x_ref[0]                                     # [window, wp, c] strip
    cp = _round_up(c, LANE)
    hp_blk = heads * LANE
    _, _, pt, pl_, hp, wp, nh, nw = _geometry(h, w, window)
    t = window * window
    s = s_ref[pl.program_id(0)]
    row0 = pl.program_id(1) * window                 # strip's first map row

    # per-pixel LN with pad-after-LN semantics (pad positions -> exact 0)
    xf = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c))).astype(jnp.float32)
    mean = jnp.sum(xf, -1, keepdims=True) / c
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
    diff = jnp.where(lane < c, xf - mean, 0.0)
    var = jnp.sum(diff * diff, -1, keepdims=True) / c
    y = diff * jax.lax.rsqrt(var + eps) * g1_ref[0][None, None, :] \
        + b1_ref[0][None, None, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (window, wp, 1), 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, (window, wp, 1), 1)
    valid = (row >= pt) & (row < pt + h) & (col >= pl_) & (col < pl_ + w)
    yb = jnp.where(valid, y, 0.0).astype(dt)

    tok = yb.reshape(window, nw, window, cp).transpose(1, 0, 2, 3)
    t2 = tok.reshape(nw * t, cp)
    t2_ref[0, 0] = t2

    def proj(wref, bref):
        o = jnp.dot(t2, wref[:], preferred_element_type=jnp.float32) + bref[0]
        return o.astype(dt).reshape(nw, t, hp_blk)

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

    attn = jnp.dot(o3.reshape(nw * t, hp_blk), wo_ref[:],
                   preferred_element_type=jnp.float32) + bo_ref[0]
    a = attn.astype(jnp.float32).reshape(nw, window, window, cp)
    a = a.transpose(1, 0, 2, 3).reshape(window, wp, cp)
    o_ref[0] = x + (s * a[:, :, :c]).astype(dt)


# --------------------------------------------------------------------------
# backward K1: token-space attention grads (no transposes, no LN)
# --------------------------------------------------------------------------

def _attn_bwd_kernel(t2_ref, da2_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                     wv_ref, bv_ref, wo_ref,
                     dt2_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                     dwv_ref, dbv_ref, dwo_ref, dbo_ref, *,
                     nw_strip: int, t: int, heads: int):
    """One (sample, window-row strip) per step; ``nw_strip`` = windows in
    the strip (NOT the sample's full window count)."""
    nwin = nw_strip
    dt = t2_ref.dtype
    hp_blk = heads * LANE

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        for ref in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                    dwo_ref, dbo_ref):
            ref[...] = jnp.zeros_like(ref)

    t2 = t2_ref[0, 0]                                # [nwin*t, cp] dt
    da2b = da2_ref[0, 0]                             # [nwin*t, cp] dt (s-scaled)
    da2f = da2b.astype(jnp.float32)

    def proj(wref, bref):
        o = jnp.dot(t2, wref[:], preferred_element_type=jnp.float32) + bref[0]
        return o.astype(dt).reshape(nwin, t, hp_blk)

    q3, k3, v3 = proj(wq_ref, bq_ref), proj(wk_ref, bk_ref), proj(wv_ref, bv_ref)

    dbo_ref[...] += jnp.sum(da2f, axis=0, keepdims=True)
    do3 = jnp.dot(da2b, wo_ref[:].T,
                  preferred_element_type=jnp.float32)  # [nwin*t, hp_blk]

    o3_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for hi in range(heads):
        sl = slice(hi * LANE, (hi + 1) * LANE)
        qh, kh, vh = q3[:, :, sl], k3[:, :, sl], v3[:, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [nwin, t, t]
        p = jax.nn.softmax(logits, axis=-1)
        pb = p.astype(dt)
        o3_parts.append(jax.lax.dot_general(
            pb, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
        doh = do3[:, sl].astype(dt).reshape(nwin, t, LANE)
        dv_parts.append(jax.lax.dot_general(
            pb, doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))       # [nwin, t(k), LANE]
        dp = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [nwin, t(q), t(k)]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(dt)
        dq_parts.append(jax.lax.dot_general(
            dsb, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))       # [nwin, t, LANE]
        dk_parts.append(jax.lax.dot_general(
            dsb, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))       # [nwin, t(k), LANE]

    o3 = jnp.concatenate(o3_parts, -1).reshape(nwin * t, hp_blk)
    dq3 = jnp.concatenate(dq_parts, -1).reshape(nwin * t, hp_blk)
    dk3 = jnp.concatenate(dk_parts, -1).reshape(nwin * t, hp_blk)
    dv3 = jnp.concatenate(dv_parts, -1).reshape(nwin * t, hp_blk)

    dwo_ref[...] += jnp.dot(o3.T, da2b, preferred_element_type=jnp.float32)

    dq3b, dk3b, dv3b = (v.astype(dt) for v in (dq3, dk3, dv3))
    dwq_ref[...] += jnp.dot(t2.T, dq3b, preferred_element_type=jnp.float32)
    dbq_ref[...] += jnp.sum(dq3, axis=0, keepdims=True)
    dwk_ref[...] += jnp.dot(t2.T, dk3b, preferred_element_type=jnp.float32)
    dbk_ref[...] += jnp.sum(dk3, axis=0, keepdims=True)
    dwv_ref[...] += jnp.dot(t2.T, dv3b, preferred_element_type=jnp.float32)
    dbv_ref[...] += jnp.sum(dv3, axis=0, keepdims=True)

    dt2 = (jnp.dot(dq3b, wq_ref[:].T, preferred_element_type=jnp.float32)
           + jnp.dot(dk3b, wk_ref[:].T, preferred_element_type=jnp.float32)
           + jnp.dot(dv3b, wv_ref[:].T, preferred_element_type=jnp.float32))
    dt2_ref[0, 0] = dt2.astype(dt)


# --------------------------------------------------------------------------
# backward K2: un-window dt2, LN backward, dx (+ residual dy)
# --------------------------------------------------------------------------

def _ln_bwd_kernel(x_ref, dy_ref, dt2_ref, g1_ref, b1_ref,
                   dx_ref, dg1_ref, db1_ref, *,
                   h: int, w: int, c: int, window: int, eps: float = 1e-6):
    dt = x_ref.dtype
    x = x_ref[0]                                     # [window, wp, c] strip
    dy = dy_ref[0]                                   # [window, wp, c] strip
    cp = _round_up(c, LANE)
    _, _, pt, pl_, hp, wp, nh, nw = _geometry(h, w, window)
    row0 = pl.program_id(1) * window

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    xf = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c))).astype(jnp.float32)
    mean = jnp.sum(xf, -1, keepdims=True) / c
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
    diff = jnp.where(lane < c, xf - mean, 0.0)
    var = jnp.sum(diff * diff, -1, keepdims=True) / c
    rstd = jax.lax.rsqrt(var + eps)
    xhat = diff * rstd

    dtw = dt2_ref[0, 0].astype(jnp.float32)          # [nw*t, cp]
    dtok = dtw.reshape(nw, window, window, cp).transpose(1, 0, 2, 3)
    dy_ln = dtok.reshape(window, wp, cp)
    row = jax.lax.broadcasted_iota(jnp.int32, (window, wp, 1), 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, (window, wp, 1), 1)
    valid = (row >= pt) & (row < pt + h) & (col >= pl_) & (col < pl_ + w)
    dy_ln = jnp.where(valid, dy_ln, 0.0)
    xhat = jnp.where(valid, xhat, 0.0)

    dg1_ref[...] += jnp.sum(dy_ln * xhat, axis=(0, 1))[None, :]
    db1_ref[...] += jnp.sum(dy_ln, axis=(0, 1))[None, :]

    dyg = dy_ln * g1_ref[0][None, None, :]           # zero on pad lanes
    m1 = jnp.sum(dyg, -1, keepdims=True) / c
    m2 = jnp.sum(dyg * xhat, -1, keepdims=True) / c
    # da2 (hence dy_ln) already carries the droppath scale s; the residual
    # path adds dy unscaled
    dx_ln = rstd * (dyg - m1 - xhat * m2)
    dx_ref[0] = dy + dx_ln[:, :, :c].astype(dt)


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------

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
    """Returns (out [P,H,W,C], t2 [P, nh, nw*t, cp]).

    The window-token tensors are laid out 4D with one leading axis per
    strip so every BlockSpec covers the last two dims IN FULL — a 3D
    layout with a blocked middle dim of nw*t rows (343 for branch0) would
    put non-tiling-aligned block strides mid-array, which Mosaic's block
    -shape rules don't guarantee to accept."""
    p, h, w, c = x.shape
    dt = x.dtype
    cp = _round_up(c, LANE)
    pad_h, pad_w, pt, pl_, hp, wp, nh, nw = _geometry(h, w, window)
    g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3 = _packed(
        dt, c, heads, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)
    xpad = _pad_hw(x, pt, pad_h, pl_, pad_w)
    s2 = s.astype(jnp.float32).reshape(p)
    strip_rows = nw * window * window
    args = (xpad, s2, g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3)
    out, t2 = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, c=c, heads=heads,
                          window=window),
        grid=(p, nh),
        in_specs=[pl.BlockSpec((1, window, wp, c), lambda i, g: (i, g, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_rep(a) for a in args[2:]],
        out_specs=(pl.BlockSpec((1, window, wp, c), lambda i, g: (i, g, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, strip_rows, cp),
                                lambda i, g: (i, g, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((p, hp, wp, c), dt),
                   jax.ShapeDtypeStruct((p, nh, strip_rows, cp), dt)),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * hp * wp * (4 * c * heads * LANE
                                     + 2 * heads * LANE * window * window),
            bytes_accessed=3 * p * hp * wp * c * x.dtype.itemsize,
            transcendentals=p * hp * wp * window * window * heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[:, pt:pt + h, pl_:pl_ + w, :], t2


def _bwd_pallas(x, dy, s, t2, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                heads, window, interpret):
    p, h, w, c = x.shape
    dt = x.dtype
    cp = _round_up(c, LANE)
    hpb = heads * LANE
    pad_h, pad_w, pt, pl_, hp, wp, nh, nw = _geometry(h, w, window)
    nwin, t = nh * nw, window * window
    g1p, b1p, wq3, bq3, wk3, bk3, wv3, bv3, wo3, _ = _packed(
        dt, c, heads, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)
    f32 = jnp.float32

    dypad = _pad_hw(dy, pt, pad_h, pl_, pad_w)
    # host-side relayout: windowed, s-scaled incoming grad (lane-padded),
    # strip-major 4D like t2 (see _fwd_pallas)
    strip_rows = nw * t
    da2 = _host_window(dypad.astype(f32) * s[:, None, None, None],
                       window, nh, nw)
    da2 = jnp.pad(da2, ((0, 0), (0, 0), (0, cp - c))).astype(dt)
    da2 = da2.reshape(p, nh, strip_rows, cp)

    def acc(shape):
        return pl.BlockSpec(shape, lambda i, g: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    tokblk = pl.BlockSpec((1, 1, strip_rows, cp), lambda i, g: (i, g, 0, 0),
                          memory_space=pltpu.VMEM)
    k1_args = (t2, da2, wq3, bq3, wk3, bk3, wv3, bv3, wo3)
    (dt2, dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwo3, dbo3) = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, nw_strip=nw, t=t, heads=heads),
        grid=(p, nh),
        in_specs=[tokblk, tokblk] + [_rep(a) for a in k1_args[2:]],
        out_specs=(tokblk,
                   acc((cp, hpb)), acc((1, hpb)),
                   acc((cp, hpb)), acc((1, hpb)),
                   acc((cp, hpb)), acc((1, hpb)),
                   acc((hpb, cp)), acc((1, cp))),
        out_shape=(jax.ShapeDtypeStruct((p, nh, strip_rows, cp), dt),
                   jax.ShapeDtypeStruct((cp, hpb), f32),
                   jax.ShapeDtypeStruct((1, hpb), f32),
                   jax.ShapeDtypeStruct((cp, hpb), f32),
                   jax.ShapeDtypeStruct((1, hpb), f32),
                   jax.ShapeDtypeStruct((cp, hpb), f32),
                   jax.ShapeDtypeStruct((1, hpb), f32),
                   jax.ShapeDtypeStruct((hpb, cp), f32),
                   jax.ShapeDtypeStruct((1, cp), f32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * p * nwin * t * (4 * c * heads * LANE
                                  + 2 * heads * LANE * t),
            bytes_accessed=4 * p * nwin * t * cp * x.dtype.itemsize,
            transcendentals=p * nwin * t * t * heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*k1_args)

    xpad = _pad_hw(x, pt, pad_h, pl_, pad_w)
    samp = pl.BlockSpec((1, window, wp, c), lambda i, g: (i, g, 0, 0),
                        memory_space=pltpu.VMEM)
    k2_args = (xpad, dypad, dt2, g1p, b1p)
    dxpad, dg1p, db1p = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, h=h, w=w, c=c, window=window),
        grid=(p, nh),
        in_specs=[samp, samp, tokblk, _rep(g1p), _rep(b1p)],
        out_specs=(samp, acc((1, cp)), acc((1, cp))),
        out_shape=(jax.ShapeDtypeStruct((p, hp, wp, c), dt),
                   jax.ShapeDtypeStruct((1, cp), f32),
                   jax.ShapeDtypeStruct((1, cp), f32)),
        cost_estimate=pl.CostEstimate(
            flops=10 * p * hp * wp * cp,
            bytes_accessed=4 * p * hp * wp * c * x.dtype.itemsize,
            transcendentals=p * hp * wp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*k2_args)

    dx = dxpad[:, pt:pt + h, pl_:pl_ + w, :]
    return (dx, dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwo3, dbo3, dg1p, db1p)


@functools.lru_cache(maxsize=None)
def _make_attn_train(heads: int, window: int, interpret: bool):
    @jax.custom_vjp
    def f(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo):
        out, _ = _fwd_pallas(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                             heads, window, interpret)
        return out

    def fwd(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo):
        out, t2 = _fwd_pallas(x, s, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                              heads, window, interpret)
        return out, (x, s, t2, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo)

    def bwd(res, dy):
        x, s, t2, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo = res
        (dx, dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwo3, dbo3,
         dg1p, db1p) = _bwd_pallas(x, dy.astype(x.dtype), s, t2, g1, b1,
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
    forward and a two-kernel Pallas backward (custom VJP; window tokens
    saved from the forward).

    Args: x [P, H, W, C]; s [P] droppath scale (0 or 1/keep; ones when
    droppath is off); ln params [C] f32; q/k/v/out flax Dense params
    ([C, C] in-features-first, biases [C]). Differentiable in everything
    but ``s``.
    """
    return _make_attn_train(heads, window, interpret)(
        x, s, ln1_scale, ln1_bias, wq, bq, wk, bk, wv, bv, wo, bo)
