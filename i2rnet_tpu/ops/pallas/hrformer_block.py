"""Fused HRFormer GeneralTransformerBlock kernels (eval mode).

HRFormer-B is HBM-bandwidth-bound (round-1 trace: 28% of device time in f32
LayerNorm convert+reduce chains, 16% in window partition/unpartition copies,
and most of the rest in elementwise fusions around small matmuls). These two
kernels rewrite one GeneralTransformerBlock (reference ``lib/models/
hrformer.py:1182-1242``) as two HBM-minimal passes over the feature map:

* :func:`window_attn_block_fused` — ``x + WindowMHSA(LN1(x))``: LayerNorm,
  center-pad, 7x7 interlaced window regroup, per-head QKV projections,
  batched-window attention, out-projection, un-pad, residual — one read and
  one write of the [H, W, C] map. Padded window tokens are zeros after LN and
  are attended to through the projection biases, bit-matching the reference
  PadBlock semantics (``hrformer.py:938-966``); the relative-position bias is
  NOT added, matching the reference quirk at ``hrformer.py:880-888``.
* :func:`mlp_block_fused` — ``x + MlpDWBN(LN2(x))`` with the three BatchNorms
  folded into the convs: LayerNorm, 1x1 expand (MXU), GELU, depthwise 3x3 as
  nine shifted MACs (VPU), GELU, 1x1 contract, GELU, residual.

Head channels (d = C/heads = 39 for HRFormer-B) are padded per head to the
128-lane width ON THE HOST (see ``pack_head_weights``): Mosaic cannot split
the lane dimension in-kernel, so q/k/v land in per-head 128-lane blocks and
the out-projection consumes the same layout. Zero-padded lanes stay zero
through every matmul (weights/biases zero-padded).

Eval-mode only (BN folding is exact for inference; training uses the unfused
flax path). All matmuls accumulate in f32; LayerNorm/softmax/GELU compute in
f32; activations stream in the model dtype.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2rnet_tpu.ops.pallas.mlp_dwbn import _gelu_tanh_erf

LANE = 128

# fused whole-sample kernels hold the padded map + q/k/v + hidden in VMEM;
# beyond this many padded-window tokens per sample the footprint outgrows
# even the raised VMEM limit and callers should use the unfused path
# (96x72 branch0 at 384x288 input = 7546 tokens, still fused).
MAX_FUSED_TOKENS = 16384


def block_fits_vmem(h: int, w: int, window: int = 7) -> bool:
    """Whether the whole-sample fused block kernels fit VMEM for an
    [h, w] feature map."""
    hp = h + (-h) % window
    wp = w + (-w) % window
    return hp * wp <= MAX_FUSED_TOKENS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_head_weights(wq, bq, wk, bk, wv, bv, wo, bo, num_heads: int,
                      scale_q: bool = True):
    """Repack per-head q/k/v/out projections into 128-lane head blocks.

    Inputs are flax Dense params: w* [C, C] (in-features first), b* [C].
    Returns (wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3) with w{q,k,v}3
    [C, heads*128], wo3 [heads*128, C], biases [1, heads*128] / [1, C];
    the 1/sqrt(d) query scaling is folded into wq3/bq3 (reference applies it
    after the projection incl. bias, ``attention.py:678-680``).
    """
    c = wq.shape[0]
    d = c // num_heads
    s = 1.0 / np.sqrt(d) if scale_q else 1.0

    def pack_cols(w, b, scale=1.0):
        blocks_w, blocks_b = [], []
        for h in range(num_heads):
            wh = w[:, h * d:(h + 1) * d] * scale
            bh = b[h * d:(h + 1) * d] * scale
            blocks_w.append(jnp.pad(wh, ((0, 0), (0, LANE - d))))
            blocks_b.append(jnp.pad(bh, (0, LANE - d)))
        return jnp.concatenate(blocks_w, 1), jnp.concatenate(blocks_b)[None, :]

    wq3, bq3 = pack_cols(wq, bq, s)
    wk3, bk3 = pack_cols(wk, bk)
    wv3, bv3 = pack_cols(wv, bv)
    # out-proj consumes per-head rows
    rows = [jnp.pad(wo[h * d:(h + 1) * d, :], ((0, LANE - d), (0, 0)))
            for h in range(num_heads)]
    wo3 = jnp.concatenate(rows, 0)
    return wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo[None, :]


def _ln(xf, g, b, c_real, eps=1e-6):
    """LayerNorm over the last (channel) axis with zero-padded lanes.

    Padded lanes contribute zero to the sums and come out exactly zero
    (gamma/beta are zero-padded), so downstream matmuls are unaffected.
    """
    mean = jnp.sum(xf, -1, keepdims=True) / c_real
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, xf.shape[-1]), 2)
    diff = jnp.where(lane < c_real, xf - mean, 0.0)
    var = jnp.sum(diff * diff, -1, keepdims=True) / c_real
    return diff * jax.lax.rsqrt(var + eps) * g[None, None, :] + b[None, None, :]


def _attn_math(x, g1, b1, wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3, *,
               h: int, w: int, c: int, heads: int, window: int):
    """``x + WindowMHSA(LN1(x))`` on one VMEM-resident [h, w, c] map —
    the shared value-level body of ``_attn_kernel`` and ``_block_kernel``
    (one definition so numerics/packing fixes propagate to both)."""
    dt = x.dtype
    # pad lanes to 128 in VMEM: Mosaic requires lane-aligned shapes for the
    # window regroup reshapes, but HBM I/O stays at the real channel count
    cp = _round_up(c, LANE)
    hp_blk = heads * LANE

    pad_h, pad_w = (-h) % window, (-w) % window
    pt, pl_ = pad_h // 2, pad_w // 2
    hp, wp = h + pad_h, w + pad_w
    nh, nw = hp // window, wp // window
    nwin, t = nh * nw, window * window

    xf = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c))).astype(jnp.float32)
    y = _ln(xf, g1, b1, c)
    yb = y.astype(dt)
    ypad = jnp.pad(yb, ((pt, pad_h - pt), (pl_, pad_w - pl_), (0, 0)))
    tok = ypad.reshape(nh, window, nw, window, cp).transpose(0, 2, 1, 3, 4)
    t2 = tok.reshape(nwin * t, cp)

    def proj(w3, b3):
        o = jnp.dot(t2, w3, preferred_element_type=jnp.float32) + b3
        return o.astype(dt).reshape(nwin, t, hp_blk)

    q3, k3, v3 = proj(wq3, bq3), proj(wk3, bk3), proj(wv3, bv3)

    outs = []
    for hi in range(heads):
        sl = slice(hi * LANE, (hi + 1) * LANE)
        logits = jax.lax.dot_general(
            q3[:, :, sl], k3[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [nwin, t, t]
        p = jax.nn.softmax(logits, axis=-1).astype(dt)
        outs.append(jax.lax.dot_general(
            p, v3[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
    o3 = jnp.concatenate(outs, -1)                    # [nwin, t, heads*128]

    attn = jnp.dot(o3.reshape(nwin * t, hp_blk), wo3,
                   preferred_element_type=jnp.float32) + bo3
    a = attn.astype(dt).reshape(nh, nw, window, window, cp)
    a = a.transpose(0, 2, 1, 3, 4).reshape(hp, wp, cp)
    return x + a[pt:pt + h, pl_:pl_ + w, :c]


def _mlp_math(x, g2, b2ln, w1, b1, dw, bdw, w2, b2, *,
              h: int, w: int, c: int):
    """``x + MlpDWBN(LN2(x))`` (BN folded) on one VMEM-resident map —
    shared body of ``_mlp_kernel`` and ``_block_kernel``."""
    dt = x.dtype
    cp = _round_up(c, LANE)
    dp = w1.shape[-1]

    xf = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c))).astype(jnp.float32)
    y = _ln(xf, g2, b2ln, c).astype(dt)

    hid = jnp.dot(y.reshape(h * w, cp), w1,
                  preferred_element_type=jnp.float32) + b1
    hid = _gelu_tanh_erf(hid).astype(dt).reshape(h, w, dp)

    # convert once: the nine shifted slices below reuse the f32 buffer
    padded = jnp.pad(hid, ((1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    acc = jnp.zeros((h, w, dp), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + (padded[dy:dy + h, dx:dx + w, :]
                         * dw[dy, dx][None, None, :])
    hid = _gelu_tanh_erf(acc + bdw[None, None, :]).astype(dt)

    out = jnp.dot(hid.reshape(h * w, dp), w2,
                  preferred_element_type=jnp.float32) + b2
    out = _gelu_tanh_erf(out).astype(dt).reshape(h, w, cp)
    return x + out[:, :, :c]


def _attn_kernel(x_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                 wv_ref, bv_ref, wo_ref, bo_ref, o_ref, *,
                 h: int, w: int, c: int, heads: int, window: int):
    o_ref[0] = _attn_math(
        x_ref[0], g1_ref[0], b1_ref[0], wq_ref[:], bq_ref[0], wk_ref[:],
        bk_ref[0], wv_ref[:], bv_ref[0], wo_ref[:], bo_ref[0],
        h=h, w=w, c=c, heads=heads, window=window)


def _mlp_kernel(x_ref, g2_ref, b2ln_ref, w1_ref, b1_ref, dw_ref, bdw_ref,
                w2_ref, b2_ref, o_ref, *, h: int, w: int, c: int):
    o_ref[0] = _mlp_math(
        x_ref[0], g2_ref[0], b2ln_ref[0], w1_ref[:], b1_ref[0], dw_ref[:],
        bdw_ref[0], w2_ref[:], b2_ref[0], h=h, w=w, c=c)


# single-pass whole-BLOCK kernel: holds attention intermediates AND the
# 4C-wide MLP hidden in VMEM simultaneously — beyond this many padded
# window tokens the combined footprint outgrows the raised VMEM limit and
# callers should use the two-kernel path (branch0 at 256x192 = 3430
# padded tokens is the main cost carrier and fits; 384x288's 7546 do not).
MAX_ONEPASS_TOKENS = 4096


def block_onepass_fits_vmem(h: int, w: int, window: int = 7) -> bool:
    hp = h + (-h) % window
    wp = w + (-w) % window
    return hp * wp <= MAX_ONEPASS_TOKENS


def _block_kernel(x_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                  wv_ref, bv_ref, wo_ref, bo_ref,
                  g2_ref, b2ln_ref, w1_ref, b1m_ref, dw_ref, bdw_ref,
                  w2_ref, b2m_ref, o_ref, *,
                  h: int, w: int, c: int, heads: int, window: int):
    """One GeneralTransformerBlock in a single pass:
    ``x + MlpDWBN(LN2(x + WindowMHSA(LN1(x))))`` — one HBM read of the
    [h, w, c] map and one write, saving the intermediate map round-trip
    and one kernel launch per block vs the two-kernel path. Both halves
    are the SAME value-level bodies the two-kernel path runs."""
    xa = _attn_math(
        x_ref[0], g1_ref[0], b1_ref[0], wq_ref[:], bq_ref[0], wk_ref[:],
        bk_ref[0], wv_ref[:], bv_ref[0], wo_ref[:], bo_ref[0],
        h=h, w=w, c=c, heads=heads, window=window)
    o_ref[0] = _mlp_math(
        xa, g2_ref[0], b2ln_ref[0], w1_ref[:], b1m_ref[0], dw_ref[:],
        bdw_ref[0], w2_ref[:], b2m_ref[0], h=h, w=w, c=c)


def _rep(w):
    return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM)


def _pack_attn_host(dt, c, heads, ln1_scale, ln1_bias,
                    wq, bq, wk, bk, wv, bv, wo, bo):
    """Host-side packing of the attention half's params for the kernels:
    per-head 128-lane blocks, channel dims padded to the VMEM lane width
    (x itself stays unpadded in HBM — padding channels on the host would
    inflate the kernel's HBM traffic by 128/78 = 1.64x for branch0)."""
    cp = _round_up(c, LANE)
    wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3 = pack_head_weights(
        wq, bq, wk, bk, wv, bv, wo, bo, heads)
    g1 = jnp.pad(ln1_scale.astype(jnp.float32), (0, cp - c))[None, :]
    b1 = jnp.pad(ln1_bias.astype(jnp.float32), (0, cp - c))[None, :]
    wq3 = jnp.pad(wq3.astype(dt), ((0, cp - c), (0, 0)))
    wk3 = jnp.pad(wk3.astype(dt), ((0, cp - c), (0, 0)))
    wv3 = jnp.pad(wv3.astype(dt), ((0, cp - c), (0, 0)))
    wo3 = jnp.pad(wo3.astype(dt), ((0, 0), (0, cp - c)))
    bo3 = jnp.pad(bo3.astype(jnp.float32), ((0, 0), (0, cp - c)))
    bq3, bk3, bv3 = (v.astype(jnp.float32) for v in (bq3, bk3, bv3))
    return g1, b1, wq3, bq3, wk3, bk3, wv3, bv3, wo3, bo3


def _pack_mlp_host(dt, c, ln2_scale, ln2_bias, w1, b1, dw, bdw, w2, b2):
    """Host-side padding of the BN-folded MlpDWBN params to kernel lane
    widths (weight tensors are tiny; x stays unpadded in HBM)."""
    cp = _round_up(c, LANE)
    d = w1.shape[-1]
    dp = _round_up(d, LANE)
    g2 = jnp.pad(ln2_scale.astype(jnp.float32), (0, cp - c))[None, :]
    b2ln = jnp.pad(ln2_bias.astype(jnp.float32), (0, cp - c))[None, :]
    w1p = jnp.pad(w1.astype(dt), ((0, cp - c), (0, dp - d)))
    b1p = jnp.pad(b1.astype(jnp.float32), (0, dp - d))[None, :]
    dwp = jnp.pad(dw.astype(jnp.float32), ((0, 0), (0, 0), (0, dp - d)))
    bdwp = jnp.pad(bdw.astype(jnp.float32), (0, dp - d))[None, :]
    w2p = jnp.pad(w2.astype(dt), ((0, dp - d), (0, cp - c)))
    b2p = jnp.pad(b2.astype(jnp.float32), (0, cp - c))[None, :]
    return g2, b2ln, w1p, b1p, dwp, bdwp, w2p, b2p


@functools.partial(jax.jit, static_argnames=("heads", "window", "interpret"))
def window_attn_block_fused(x, ln1_scale, ln1_bias, wq, bq, wk, bk, wv, bv,
                            wo, bo, heads: int, window: int = 7,
                            interpret: bool = False):
    """``x + WindowMHSA(LN1(x))`` for one transformer block, fused.

    Args: x [P, H, W, C]; ln params [C] f32; projections as flax Dense params
    (wq/wk/wv/wo [C, C] in-features-first, biases [C]).
    """
    p, h, w, c = x.shape
    dt = x.dtype
    args = (x,) + _pack_attn_host(dt, c, heads, ln1_scale, ln1_bias,
                                  wq, bq, wk, bk, wv, bv, wo, bo)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, h=h, w=w, c=c, heads=heads,
                          window=window),
        grid=(p,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [_rep(a) for a in args[1:]],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * h * w * (4 * c * heads * LANE
                                   + 2 * heads * LANE * window * window),
            bytes_accessed=2 * p * h * w * c * x.dtype.itemsize,
            transcendentals=p * h * w * window * window * heads,
        ),
        # large inputs (384x288 -> 96x72 branch0) need ~20MB scoped VMEM;
        # v5e has headroom beyond the 16MB default limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=("heads", "window", "interpret"))
def full_block_fused(x, ln1_scale, ln1_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                     ln2_scale, ln2_bias, w1, b1, dw, bdw, w2, b2,
                     heads: int, window: int = 7, interpret: bool = False):
    """One GeneralTransformerBlock in a single Pallas pass (attention +
    BN-folded MlpDWBN): saves the intermediate [P, H, W, C] map round-trip
    through HBM and one kernel launch per block vs calling
    :func:`window_attn_block_fused` then :func:`mlp_block_fused`.

    Args as in those two wrappers. Gate with :func:`block_onepass_fits_vmem`.
    """
    p, h, w, c = x.shape
    dt = x.dtype
    dp = _round_up(w1.shape[-1], LANE)
    args = ((x,)
            + _pack_attn_host(dt, c, heads, ln1_scale, ln1_bias,
                              wq, bq, wk, bk, wv, bv, wo, bo)
            + _pack_mlp_host(dt, c, ln2_scale, ln2_bias,
                             w1, b1, dw, bdw, w2, b2))
    out = pl.pallas_call(
        functools.partial(_block_kernel, h=h, w=w, c=c, heads=heads,
                          window=window),
        grid=(p,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [_rep(a) for a in args[1:]],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * h * w * (4 * c * heads * LANE
                                   + 2 * heads * LANE * window * window
                                   + 2 * c * dp + 9 * dp),
            bytes_accessed=2 * p * h * w * c * x.dtype.itemsize,
            transcendentals=p * h * w * (window * window * heads
                                         + 2 * dp + c),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_block_fused(x, ln2_scale, ln2_bias, w1, b1, dw, bdw, w2, b2,
                    interpret: bool = False):
    """``x + MlpDWBN(LN2(x))`` fused; BN pre-folded into w1/b1/dw/bdw/w2/b2
    (see :func:`i2rnet_tpu.ops.pallas.mlp_dwbn.fold_bn`).

    Args: x [P, H, W, C]; w1 [C, D]; dw [3, 3, D]; w2 [D, C].
    """
    p, h, w, c = x.shape
    dp = _round_up(w1.shape[-1], LANE)
    dt = x.dtype
    args = (x,) + _pack_mlp_host(dt, c, ln2_scale, ln2_bias,
                                 w1, b1, dw, bdw, w2, b2)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, h=h, w=w, c=c),
        grid=(p,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [_rep(a) for a in args[1:]],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * h * w * (2 * c * dp + 9 * dp),
            bytes_accessed=2 * p * h * w * c * x.dtype.itemsize,
            transcendentals=p * h * w * (2 * dp + c),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out
