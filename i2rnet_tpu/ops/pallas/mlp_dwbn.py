"""Fused MlpDWBN Pallas kernel (HRFormer FFN, eval mode).

HRFormer is HBM-bandwidth-bound (measured 732 GB/s ≈ 89% of v5e peak at
5.9% MXU): the MlpDWBN chain
``1x1 conv -> BN -> GELU -> dw3x3 -> BN -> GELU -> 1x1 conv -> BN -> GELU``
writes/reads the 4C-wide hidden activation four times through HBM. This
kernel keeps the whole chain in VMEM per image: one program loads an [H, W,
C] feature map, runs expand-matmul (MXU), the depthwise 3x3 as nine shifted
multiply-adds (VPU), and the contract-matmul, writing only the [H, W, C]
result.

Eval-mode only: the BatchNorms are folded into the adjacent convs on the
host side (``fold_bn``), which is exact for inference. Training uses the
unfused flax path (batch statistics need cross-image reductions).

Channel dims are zero-padded to the 128-lane width; padded lanes stay zero
through the chain (GELU(0)=0, zero-padded weights/bias) and are sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Return (k, c) with BN(x) == x * k + c."""
    k = scale * jax.lax.rsqrt(var + eps)
    return k, bias - mean * k


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err ~1.5e-7).

    Mosaic has no erf/erfc lowering; exp is supported.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


# tanh-form minimax erf: erf(x/sqrt(2)) = tanh(x*(c0 + x^2*(c1 + ...)))
# fitted so |gelu_tanh_erf - gelu_exact| <= 5.9e-6 globally (f32) — far
# below bf16 resolution. One hardware tanh + 5 FMA instead of exp + divide
# + 7 FMA: measured 2.3x faster GELU on the VPU (the HRFormer block
# kernels are VPU-bound on GELU; see hrformer_block.py).
_GELU_TANH_C = (7.978695036392e-01, 3.639282100698e-02, -8.813181379539e-05,
                -3.663829767474e-05, 1.422091515310e-06)


def _gelu_tanh_erf(x):
    c0, c1, c2, c3, c4 = _GELU_TANH_C
    z = x * x
    p = x * (c0 + z * (c1 + z * (c2 + z * (c3 + z * c4))))
    return 0.5 * x * (1.0 + jnp.tanh(p))


def _kernel(x_ref, w1_ref, b1_ref, dw_ref, bdw_ref, w2_ref, b2_ref, o_ref,
            *, h: int, w: int):
    x = x_ref[0].astype(jnp.float32)                    # [H, W, Cp]
    cp = x.shape[-1]
    dp = w1_ref.shape[-1]

    hid = jnp.dot(x.reshape(h * w, cp), w1_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    hid = _gelu_exact(hid + b1_ref[0])
    hid = hid.reshape(h, w, dp)

    # depthwise 3x3, zero border: nine shifted multiply-adds in VMEM
    padded = jnp.pad(hid, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(hid)
    for dy in range(3):
        for dx in range(3):
            acc = acc + padded[dy:dy + h, dx:dx + w, :] * dw_ref[dy, dx][None, None, :]
    hid = _gelu_exact(acc + bdw_ref[0][None, None, :])

    out = jnp.dot(hid.reshape(h * w, dp), w2_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    out = _gelu_exact(out + b2_ref[0])
    o_ref[0] = out.reshape(h, w, cp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_dwbn_fused(x, w1, b1, dw, bdw, w2, b2, interpret: bool = False):
    """Fused eval-mode MlpDWBN.

    Args:
      x: [P, H, W, C] features.
      w1: [C, D] expand weights (BN1 pre-folded); b1: [D].
      dw: [3, 3, D] depthwise weights (BN2 pre-folded); bdw: [D].
      w2: [D, C] contract weights (BN3 pre-folded); b2: [C].

    Returns [P, H, W, C].
    """
    p, h, w, c = x.shape
    d = w1.shape[-1]
    cp = _round_up(c, 128)
    dp = _round_up(d, 128)

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    w1p = jnp.pad(w1, ((0, cp - c), (0, dp - d)))
    b1p = jnp.pad(b1, (0, dp - d)).reshape(1, dp)
    dwp = jnp.pad(dw, ((0, 0), (0, 0), (0, dp - d)))
    bdwp = jnp.pad(bdw, (0, dp - d)).reshape(1, dp)
    w2p = jnp.pad(w2, ((0, dp - d), (0, cp - c)))
    b2p = jnp.pad(b2, (0, cp - c)).reshape(1, cp)

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, dp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w, cp), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * h * w * (cp * dp * 2 + 9 * dp),
            bytes_accessed=p * h * w * (cp * 2) * 4 + (cp * dp * 2 + 11 * dp) * 4,
            transcendentals=p * h * w * (2 * dp + cp),
        ),
        interpret=interpret,
    )(xp, w1p, b1p, dwp, bdwp, w2p, b2p)
    return out[..., :c]
