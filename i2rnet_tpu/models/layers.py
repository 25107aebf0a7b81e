"""Core building blocks (Flax linen, NHWC, bf16-compute friendly).

TPU-first re-designs of the reference's torch blocks:

* :class:`MaskedBatchNorm` — BatchNorm whose batch statistics are computed
  over *valid* samples only. This is the static-shape replacement for the
  reference's per-device unsynced ``nn.BatchNorm2d``: with padded persons in
  a ``[B*N, H, W, C]`` batch, naive BN would fold zero-images into the
  statistics; masking reproduces the ragged-batch statistics exactly.
* :class:`BasicBlock` / :class:`Bottleneck` — HRNet residual blocks
  (reference ``lib/models/interformer_pureMulti.py:37-107``).
* :class:`DeconvBlock` — ``ConvTranspose2d(k=4, s=2, p=1) + BN + ReLU``
  (reference ``_make_deconv_layer``, ``interformer_pureMulti.py:648-673``),
  implemented as an input-dilated convolution so XLA maps it onto the MXU.

Initialization matches the reference ``init_weights``
(``interformer_pureMulti.py:780-795``): convs ~ Normal(0.001), BN scale=1
bias=0, transformer params Xavier-uniform (set in the encoder module).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

conv_init = nn.initializers.normal(stddev=0.001)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over NHWC with an optional per-sample validity mask.

    momentum follows the torch convention (new = (1-m)*running + m*batch,
    m=0.1 as in reference ``BN_MOMENTUM``). Normalization uses biased batch
    variance; the running variance update uses the unbiased estimate,
    matching ``torch.nn.BatchNorm2d``.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xf = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            if mask is not None:
                m = jnp.broadcast_to(
                    mask.astype(jnp.float32).reshape(mask.shape + (1,) * (x.ndim - mask.ndim)),
                    x.shape[:-1] + (1,),
                )
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=axes) / cnt
                var = jnp.sum((xf - mean) ** 2 * m, axis=axes) / cnt
            else:
                cnt = jnp.float32(1.0)
                for d in x.shape[:-1]:
                    cnt = cnt * d
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        # fold into one fused multiply-add in the input dtype: the [C]-sized
        # math stays f32; the big elementwise op runs at activation precision
        # (halves HBM traffic for bf16 activations vs normalizing in f32)
        k = jax.lax.rsqrt(var + self.epsilon) * scale
        b = bias - mean * k
        out_dtype = x.dtype if self.dtype is None else self.dtype
        return (x * k.astype(x.dtype) + b.astype(x.dtype)).astype(out_dtype)


class ConvBN(nn.Module):
    """Conv (no bias) + masked BN, optional ReLU."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        pad = ((self.kernel[0] // 2,) * 2, (self.kernel[1] // 2,) * 2)
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    name="conv")(x)
        x = MaskedBatchNorm(name="bn", dtype=self.dtype)(x, mask=mask, train=train)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """3x3-3x3 residual block, expansion 1 (reference pureMulti :37-66)."""

    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Optional[Dtype] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        residual = x
        out = ConvBN(self.planes, (3, 3), self.strides, relu=True, dtype=self.dtype,
                     name="conv1")(x, mask, train)
        out = ConvBN(self.planes, (3, 3), relu=False, dtype=self.dtype,
                     name="conv2")(out, mask, train)
        if self.downsample:
            residual = ConvBN(self.planes * self.expansion, (1, 1), self.strides,
                              relu=False, dtype=self.dtype, name="downsample")(x, mask, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 residual block, expansion 4 (reference pureMulti :69-107)."""

    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Optional[Dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        residual = x
        out = ConvBN(self.planes, (1, 1), relu=True, dtype=self.dtype, name="conv1")(x, mask, train)
        out = ConvBN(self.planes, (3, 3), self.strides, relu=True, dtype=self.dtype,
                     name="conv2")(out, mask, train)
        out = ConvBN(self.planes * self.expansion, (1, 1), relu=False, dtype=self.dtype,
                     name="conv3")(out, mask, train)
        if self.downsample:
            residual = ConvBN(self.planes * self.expansion, (1, 1), self.strides,
                              relu=False, dtype=self.dtype, name="downsample")(x, mask, train)
        return nn.relu(out + residual)


BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


class DeconvBlock(nn.Module):
    """ConvTranspose(k, s=2, p per reference table) + BN + ReLU.

    Reference ``_get_deconv_cfg`` (``interformer_pureMulti.py:635-646``):
    k=4 -> p=1,op=0; k=3 -> p=1,op=1; k=2 -> p=0,op=0. All give exact 2x
    upsampling.
    """

    features: int
    kernel: int = 4
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        cin = x.shape[-1]
        k = self.kernel
        w = self.param("kernel", conv_init, (k, k, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32) if self.use_bias else None
        # torch (padding, output_padding) per kernel size; all yield exact 2x
        p, op = {4: (1, 0), 3: (1, 1), 2: (0, 0)}[k]
        # transposed conv == conv over 2x-dilated input with pads (k-1-p, k-1-p+op)
        pl, pr = k - 1 - p, k - 1 - p + op
        # NB no preferred_element_type here: with bf16 operands it breaks the
        # conv transpose (VJP) rule; MXU accumulates in f32 internally anyway.
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((pl, pr), (pl, pr)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if b is not None:
            out = out + b
        out = MaskedBatchNorm(name="bn", dtype=self.dtype)(out, mask=mask, train=train)
        return nn.relu(out)


def upsample_nearest(x, factor: int):
    """Exact torch ``nn.Upsample(scale_factor=2**k, mode='nearest')``."""
    x = jnp.repeat(x, factor, axis=-3)
    x = jnp.repeat(x, factor, axis=-2)
    return x


def max_pool_3x3_s2(x):
    """MaxPool2d(kernel=3, stride=2, padding=1) over NHWC, torch semantics."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
