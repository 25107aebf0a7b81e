"""HRFormer-B intra-human (first) stage.

TPU-native reimplementation of the High-Resolution Transformer used as the
strongest first stage (reference ``lib/models/hrformer.py``, ~2.5k LoC of
vendored mmpose code). Architecture (hardcoded in the reference factory at
``hrformer.py:2487-2533``):

* stem: two stride-2 3x3 convs -> 2x Bottleneck(64->256)
* stages 2-4 of GeneralTransformerBlocks per branch:
  channels (78, 156, 312, 624), heads (2, 4, 8, 16), window 7, mlp ratio 4,
  module counts (1, 4, 2), 2 blocks per branch per module
* block = x + DropPath(ISA(LN(x))) ; x + DropPath(MlpDWBN(LN(x)))
  - ISA = interlaced window attention (``hrformer.py:1138-1180``): center-pad
    H,W to multiples of 7, regroup every 7x7 window as a batch element,
    MHSA with a Swin-style relative-position-bias table (``:590-625``)
  - MlpDWBN = 1x1 conv+BN+GELU -> depthwise 3x3+BN+GELU -> 1x1 conv+BN+GELU
    (``:1044-1137``)
* fusion: j>i 1x1 conv+BN + bilinear(align_corners=False) upsample; j<i
  chains of depthwise-3x3/s2+BN + 1x1+BN (+ReLU except last) (``:1616-1705``)
* drop path linearly ramped 0 -> 0.2 over the 14 transformer blocks (``:1795``)
* head: identity deconv + 1x1 final conv on branch0 (``TopDownSimpleHead``,
  num_deconv_layers=0)
* wrapper returns (branch0 features [B, 64, 48, 78], heatmaps) — the
  first-stage contract (``:2470-2480``).

TPU notes: the window regrouping is a reshape/transpose (XLA fuses it); the
49-token window attention compiles to batched MXU matmuls; all BN is masked.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from i2rnet_tpu.models.layers import Bottleneck, ConvBN, MaskedBatchNorm, conv_init
from i2rnet_tpu.registry import register_model

xavier = nn.initializers.xavier_uniform()

HRFORMER_B_ARCH = {
    "drop_path_rate": 0.2,
    "stage2": dict(num_modules=1, num_branches=2, num_blocks=(2, 2),
                   num_channels=(78, 156), num_heads=(2, 4),
                   num_mlp_ratios=(4, 4), num_window_sizes=(7, 7)),
    "stage3": dict(num_modules=4, num_branches=3, num_blocks=(2, 2, 2),
                   num_channels=(78, 156, 312), num_heads=(2, 4, 8),
                   num_mlp_ratios=(4, 4, 4), num_window_sizes=(7, 7, 7)),
    "stage4": dict(num_modules=2, num_branches=4, num_blocks=(2, 2, 2, 2),
                   num_channels=(78, 156, 312, 624), num_heads=(2, 4, 8, 16),
                   num_mlp_ratios=(4, 4, 4, 4), num_window_sizes=(7, 7, 7, 7)),
}


def _rpe_index(window: int) -> np.ndarray:
    """Swin-style relative position index [w*w, w*w] into a (2w-1)^2 table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, ww, ww]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


class DropPath(nn.Module):
    """Stochastic depth per sample (reference ``hrformer.py:1008-1040``)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class WindowRPEAttention(nn.Module):
    """MHSA over window tokens with relative position bias.

    Input [BW, T, C] where T = window*window. Matches the reference ``MHA_``
    (``hrformer.py:590-680``): separate q/k/v projections, q scaled by
    head_dim^-0.5.

    QUIRK (reference ``hrformer.py:880-888``): the vendored implementation
    *builds* the relative-position-bias tensor but the addition to the
    attention logits is commented out — released HRFormer-B checkpoints were
    trained WITHOUT the bias despite carrying the table. ``use_rpe`` defaults
    to False for checkpoint parity; set True to actually apply it when
    training from scratch.
    """

    num_heads: int
    window: int
    use_rpe: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = self.num_heads
        d = c // h
        t = self.window * self.window
        q = nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="v_proj")(x)

        table = self.param(
            "rpe_table", nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h), jnp.float32)
        idx = jnp.asarray(_rpe_index(self.window).reshape(-1))
        bias = jnp.take(table, idx, axis=0).reshape(t, t, h)
        bias = bias.transpose(2, 0, 1)  # [h, T, T]

        scale = 1.0 / np.sqrt(d)
        if x.ndim == 4:
            # einsum-native layout (TPU.WINDOW_ATTN_EINSUM): x is the padded
            # spatial map [B, Hp, Wp, C]. Window grouping happens INSIDE the
            # dot_general via batch dims (b, nh, nw, heads) on a pure-reshape
            # 7-D view — no materialized partition/unpartition or per-head
            # transposes in user code; XLA's layout assignment owns all data
            # movement (the A/B against window_partition is the point:
            # docs/perf/hrformer_r03.md, 46.9 ms copy bucket).
            b, hp, wp, _ = x.shape
            win = self.window
            nh, nw = hp // win, wp // win
            split = lambda a: a.reshape(b, nh, win, nw, win, h, d)  # noqa: E731
            qs = split(q) * scale
            ks, vs = split(k), split(v)
            logits = jnp.einsum("bipjqhd,birjshd->bijhpqrs", qs, ks,
                                preferred_element_type=jnp.float32)
            if self.use_rpe:
                bias6 = bias.reshape(h, win, win, win, win)
                logits = logits + bias6[None, None, None]
            shape8 = logits.shape
            w = jax.nn.softmax(
                logits.reshape(shape8[:-2] + (win * win,)), axis=-1)
            w = w.reshape(shape8).astype(x.dtype)
            out = jnp.einsum("bijhpqrs,birjshd->bipjqhd", w, vs,
                             preferred_element_type=jnp.float32).astype(x.dtype)
            out = out.reshape(b, hp, wp, c)
            return nn.Dense(c, kernel_init=xavier, dtype=self.dtype,
                            name="out_proj")(out)

        # per-head attention WITHOUT materialized head transposes: the
        # dot_generals take h as a non-major batch dim ("bqhd,bkhd->bhqk")
        # and the output comes back token-major ("->bqhd"), so no user-level
        # [bw,T,h,d]->[bw,h,T,d] relayouts exist for XLA to emit as copies
        # (they were part of the 46.9 ms train-step copy bucket,
        # docs/perf/hrformer_r03.md; A/B in docs/perf/hrformer_r04.md).
        bw = x.shape[0]
        qh = q.reshape(bw, t, h, d) * scale
        kh = k.reshape(bw, t, h, d)
        vh = v.reshape(bw, t, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        if self.use_rpe:
            logits = logits + bias[None]
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(bw, t, c)
        return nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="out_proj")(out)


def window_partition(x, window: int):
    """[B, H, W, C] -> padded windows [B*nWh*nWw, w*w, C] + pad info.

    Center-pads H and W to multiples of ``window`` (reference PadBlock,
    ``hrformer.py:938-966``)."""
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    x = jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    nh, nw = hp // window, wp // window
    x = x.reshape(b, nh, window, nw, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, window * window, c)
    return x, (b, h, w, hp, wp, pad_h, pad_w)


def window_unpartition(x, window: int, info):
    b, h, w, hp, wp, pad_h, pad_w = info
    nh, nw = hp // window, wp // window
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, pad_h // 2: pad_h // 2 + h, pad_w // 2: pad_w // 2 + w, :]


class MlpDWBN(nn.Module):
    """1x1 conv + BN + GELU -> depthwise 3x3 + BN + GELU -> 1x1 + BN + GELU.

    ``use_fused_eval`` routes inference through the fused Pallas kernel
    (``ops/pallas/mlp_dwbn.py``) with the BatchNorms folded into the convs —
    the HBM-traffic hot spot of HRFormer (see docs/PARALLELISM.md). Training
    and initialization always use the unfused path.
    """

    hidden: int
    out: int
    use_fused_eval: bool = False
    dtype: Optional[Any] = None

    def setup(self):
        self.fc1 = nn.Conv(self.hidden, (1, 1), use_bias=True,
                           kernel_init=conv_init, dtype=self.dtype)
        self.norm1 = MaskedBatchNorm()
        self.dw3x3 = nn.Conv(self.hidden, (3, 3), padding=1,
                             feature_group_count=self.hidden, use_bias=True,
                             kernel_init=conv_init, dtype=self.dtype)
        self.norm2 = MaskedBatchNorm()
        self.fc2 = nn.Conv(self.out, (1, 1), use_bias=True,
                           kernel_init=conv_init, dtype=self.dtype)
        self.norm3 = MaskedBatchNorm()

    def __call__(self, x, mask=None, train: bool = False):
        if self.use_fused_eval and not train and not self.is_initializing():
            return self._fused(x)
        x = self.fc1(x)
        x = self.norm1(x, mask, train)
        x = nn.gelu(x, approximate=False)
        x = self.dw3x3(x)
        x = self.norm2(x, mask, train)
        x = nn.gelu(x, approximate=False)
        x = self.fc2(x)
        x = self.norm3(x, mask, train)
        return nn.gelu(x, approximate=False)

    def folded_params(self):
        """BN-folded conv weights (w1, b1, dw, bdw, w2, b2) for the fused
        eval kernels; exact for inference (running stats)."""
        from i2rnet_tpu.ops.pallas.mlp_dwbn import fold_bn

        def bn_kc(bn):
            v = bn.variables
            return fold_bn(v["params"]["scale"], v["params"]["bias"],
                           v["batch_stats"]["mean"], v["batch_stats"]["var"])

        k1, c1 = bn_kc(self.norm1)
        k2, c2 = bn_kc(self.norm2)
        k3, c3 = bn_kc(self.norm3)
        p1 = self.fc1.variables["params"]
        pd = self.dw3x3.variables["params"]
        p2 = self.fc2.variables["params"]
        w1 = p1["kernel"][0, 0] * k1[None, :]
        b1 = p1["bias"] * k1 + c1
        dw = pd["kernel"][:, :, 0, :] * k2[None, None, :]
        bdw = pd["bias"] * k2 + c2
        w2 = p2["kernel"][0, 0] * k3[None, :]
        b2 = p2["bias"] * k3 + c3
        return w1, b1, dw, bdw, w2, b2

    def _fused(self, x):
        from i2rnet_tpu.ops.pallas.mlp_dwbn import mlp_dwbn_fused
        w1, b1, dw, bdw, w2, b2 = self.folded_params()
        interpret = jax.default_backend() == "cpu"
        return mlp_dwbn_fused(x, w1, b1, dw, bdw, w2, b2, interpret=interpret)


# Fused TRAINING attention kernels are only worth their Mosaic compile cost
# on high-token branches; tests monkeypatch this to exercise the fused path
# at small geometry (see tests/test_hrformer_block_train.py).
MIN_FUSED_TRAIN_TOKENS = 2048

# EVAL fused-block threshold: 0 = fuse every branch that fits VMEM (the
# r2-measured optimum; raising it is an experiment knob for trading tiny
# branches' per-call overhead against XLA fusions).
MIN_FUSED_EVAL_TOKENS = 0


class HRFormerBlock(nn.Module):
    """GeneralTransformerBlock (reference ``hrformer.py:1182-1242``).

    ``fused_eval_block`` routes inference through the two whole-block Pallas
    kernels (``ops/pallas/hrformer_block.py``): LN1 + window attention +
    residual, then LN2 + BN-folded MlpDWBN + residual — each one HBM read and
    one write of the feature map, eliminating the f32 LayerNorm intermediates
    and window relayout copies that dominate the unfused block's traffic.
    Training/init always use the unfused path.
    """

    channels: int
    num_heads: int
    window: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_rpe: bool = False
    fused_eval_mlp: bool = False
    fused_eval_block: bool = False
    # TPU.FUSED_BLOCK_EVAL_ONEPASS: single-pass attn+MLP eval kernel on
    # branches whose combined footprint fits VMEM (experiment knob; the
    # two-kernel path is the measured default)
    fused_eval_onepass: bool = False
    fused_train_attn: bool = False   # TPU.FUSED_BLOCK_TRAIN
    # TPU.MIN_FUSED_TRAIN_TOKENS; None -> module default (monkeypatchable)
    min_fused_train_tokens: Optional[int] = None
    # TPU.WINDOW_ATTN_EINSUM: unfused attention via batch-dim dot_general on
    # the padded spatial layout instead of window_partition/unpartition
    # (layout experiment, docs/perf/hrformer_r04.md)
    einsum_attn: bool = False
    dtype: Optional[Any] = None

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-6)
        self.attn = WindowRPEAttention(self.num_heads, self.window,
                                       self.use_rpe, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-6)
        self.mlp = MlpDWBN(int(self.channels * self.mlp_ratio), self.channels,
                           use_fused_eval=self.fused_eval_mlp, dtype=self.dtype)
        self.dp = DropPath(self.drop_path)

    def __call__(self, x, mask=None, train: bool = False, fused_budget=None):
        if (self.fused_eval_block and not self.use_rpe and not train
                and not self.is_initializing()):
            from i2rnet_tpu.ops.pallas.hrformer_block import block_fits_vmem
            tokens = x.shape[1] * x.shape[2]
            if (tokens >= MIN_FUSED_EVAL_TOKENS
                    and block_fits_vmem(x.shape[1], x.shape[2], self.window)):
                return self._fused_block(x)

        if (self.fused_train_attn and train and not self.use_rpe
                and not self.is_initializing()):
            from i2rnet_tpu.ops.pallas.hrformer_block import block_fits_vmem
            # high-resolution branches only: they carry the block's cost,
            # and each extra distinct kernel shape adds a Mosaic compile
            # to the train program (the remote compile helper has a hard
            # memory budget — see docs/perf/hrformer_r03.md)
            min_tokens = (MIN_FUSED_TRAIN_TOKENS
                          if self.min_fused_train_tokens is None
                          else self.min_fused_train_tokens)
            tokens = x.shape[1] * x.shape[2]
            # fused_budget: trace-time countdown of how many eligible
            # blocks may take the fused path ([remaining]; None =
            # unlimited). TPU.FUSED_TRAIN_MAX_BLOCKS caps total Mosaic
            # kernel-triple instances when the full count exceeds the
            # remote compile helper's memory budget — any prefix of the
            # eligible blocks gives proportional benefit.
            if (tokens >= min_tokens
                    and block_fits_vmem(x.shape[1], x.shape[2], self.window)
                    and (fused_budget is None or fused_budget[0] > 0)):
                if fused_budget is not None:
                    fused_budget[0] -= 1
                x = self._fused_train_attn(x)
            else:
                x = self._unfused_attn(x, train)
        else:
            x = self._unfused_attn(x, train)

        # depthwise-conv FFN
        y = self.norm2(x)
        y = self.mlp(y, mask, train)
        x = x + self.dp(y, deterministic=not train)
        return x

    def _unfused_attn(self, x, train):
        # attention over interlaced windows (LN reduces over the channel
        # axis; no flatten round-trip — reshapes materialize relayouts on TPU)
        y = self.norm1(x)
        if self.einsum_attn:
            # einsum-native layout: center-pad only; window grouping lives
            # in the attention's dot_general batch dims
            b, h, w, c = y.shape
            pad_h = (-h) % self.window
            pad_w = (-w) % self.window
            y = jnp.pad(y, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                            (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
            y = self.attn(y)
            y = y[:, pad_h // 2: pad_h // 2 + h,
                  pad_w // 2: pad_w // 2 + w, :]
        else:
            win, info = window_partition(y, self.window)
            win = self.attn(win)
            y = window_unpartition(win, self.window, info)
        return x + self.dp(y, deterministic=not train)

    def _fused_train_attn(self, x):
        """Training attention sub-block through the custom-VJP Pallas
        kernel (``ops/pallas/hrformer_block_train.py``): Pallas forward AND
        backward; the per-sample droppath scale is applied inside the
        kernel (same Bernoulli(keep) distribution as DropPath, drawn from
        the same 'dropout' stream)."""
        import jax as _jax

        from i2rnet_tpu.ops.pallas.hrformer_block_train import (
            window_attn_block_train)

        p = x.shape[0]
        if self.drop_path > 0.0:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            s = jnp.floor(keep + _jax.random.uniform(rng, (p,), jnp.float32))
            s = s / keep
        else:
            s = jnp.ones((p,), jnp.float32)
        n1 = self.norm1.variables["params"]
        ap = self.attn.variables["params"]
        interpret = _jax.default_backend() == "cpu"
        return window_attn_block_train(
            x, s, n1["scale"], n1["bias"],
            ap["q_proj"]["kernel"], ap["q_proj"]["bias"],
            ap["k_proj"]["kernel"], ap["k_proj"]["bias"],
            ap["v_proj"]["kernel"], ap["v_proj"]["bias"],
            ap["out_proj"]["kernel"], ap["out_proj"]["bias"],
            heads=self.num_heads, window=self.window, interpret=interpret)

    def _fused_block(self, x):
        import jax as _jax

        from i2rnet_tpu.ops.pallas.hrformer_block import (
            block_onepass_fits_vmem, full_block_fused, mlp_block_fused,
            window_attn_block_fused)

        interpret = _jax.default_backend() == "cpu"
        n1 = self.norm1.variables["params"]
        ap = self.attn.variables["params"]
        attn_args = (
            n1["scale"], n1["bias"],
            ap["q_proj"]["kernel"], ap["q_proj"]["bias"],
            ap["k_proj"]["kernel"], ap["k_proj"]["bias"],
            ap["v_proj"]["kernel"], ap["v_proj"]["bias"],
            ap["out_proj"]["kernel"], ap["out_proj"]["bias"])
        n2 = self.norm2.variables["params"]
        w1, b1, dw, bdw, w2, b2 = self.mlp.folded_params()
        if (self.fused_eval_onepass
                and block_onepass_fits_vmem(x.shape[1], x.shape[2],
                                            self.window)):
            return full_block_fused(
                x, *attn_args, n2["scale"], n2["bias"],
                w1, b1, dw, bdw, w2, b2,
                heads=self.num_heads, window=self.window, interpret=interpret)
        x = window_attn_block_fused(
            x, *attn_args,
            heads=self.num_heads, window=self.window, interpret=interpret)
        return mlp_block_fused(x, n2["scale"], n2["bias"],
                               w1, b1, dw, bdw, w2, b2, interpret=interpret)


class HRTFuse(nn.Module):
    """HRFormer multi-scale fusion with depthwise downsample chains and
    bilinear upsampling (reference ``hrformer.py:1616-1733``)."""

    num_branches: int
    channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: List, mask=None, train: bool = False):
        n_out = self.num_branches if self.multi_scale_output else 1
        outs = []
        for i in range(n_out):
            y = None
            for j in range(self.num_branches):
                if j == i:
                    t = xs[j]
                elif j > i:
                    t = ConvBN(self.channels[i], (1, 1), relu=False,
                               dtype=self.dtype, name=f"fuse{i}_{j}")(xs[j], mask, train)
                    t = jax.image.resize(
                        t, (t.shape[0],) + xs[i].shape[1:3] + (t.shape[-1],),
                        method="bilinear")
                else:
                    t = xs[j]
                    cj = self.channels[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = nn.Conv(cj, (3, 3), (2, 2), padding=1,
                                    feature_group_count=cj, use_bias=False,
                                    kernel_init=conv_init, dtype=self.dtype,
                                    name=f"fuse{i}_{j}_{k}_dw")(t)
                        t = MaskedBatchNorm(name=f"fuse{i}_{j}_{k}_dwbn")(t, mask, train)
                        cout = self.channels[i] if last else cj
                        t = nn.Conv(cout, (1, 1), use_bias=False,
                                    kernel_init=conv_init, dtype=self.dtype,
                                    name=f"fuse{i}_{j}_{k}_pw")(t)
                        t = MaskedBatchNorm(name=f"fuse{i}_{j}_{k}_pwbn")(t, mask, train)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            outs.append(nn.relu(y))
        return outs


class HRTStage(nn.Module):
    """Transition + modules of transformer branches for one HRT stage."""

    stage_cfg: Dict
    drop_paths: Tuple[float, ...]
    multi_scale_output: bool = True   # stage4 fuses only branch0 in its last
    use_rpe: bool = False             # module (reference hrformer.py:1850)
    fused_eval_mlp: bool = False
    fused_eval_block: bool = False
    fused_eval_onepass: bool = False
    fused_train_attn: bool = False
    min_fused_train_tokens: Optional[int] = None
    einsum_attn: bool = False         # TPU.WINDOW_ATTN_EINSUM
    remat: bool = False               # TPU.REMAT 'layers': per-block nn.remat
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: List, mask=None, train: bool = False,
                 fused_budget=None):
        cfg = self.stage_cfg
        channels = list(cfg["num_channels"])
        nb = cfg["num_branches"]

        # transition (reference _make_transition_layer; conv3x3+BN+ReLU)
        outs = []
        for i in range(nb):
            if i < len(xs):
                if xs[i].shape[-1] != channels[i]:
                    outs.append(ConvBN(channels[i], (3, 3), dtype=self.dtype,
                                       name=f"transition{i}")(xs[i], mask, train))
                else:
                    outs.append(xs[i])
            else:
                t = xs[-1]
                for j in range(i + 1 - len(xs)):
                    feats = channels[i] if j == i - len(xs) else xs[-1].shape[-1]
                    t = ConvBN(feats, (3, 3), (2, 2), dtype=self.dtype,
                               name=f"transition{i}_{j}")(t, mask, train)
                outs.append(t)
        xs = outs

        blocks_per_module = cfg["num_blocks"][0]
        block_cls = HRFormerBlock
        if self.remat:
            # TPU.REMAT 'layers': rematerialize each transformer block in the
            # backward pass. train (3) and fused_budget (4) are static
            # (index counts self); the FUSED_TRAIN_MAX_BLOCKS budget list is
            # unhashable and thus incompatible with remat — callers pass
            # fused_budget=None when remat is on (guarded in build_hrformer).
            block_cls = nn.remat(HRFormerBlock, static_argnums=(3, 4))
        for m in range(cfg["num_modules"]):
            for bi in range(nb):
                x = xs[bi]
                for k in range(blocks_per_module):
                    dp = self.drop_paths[m * blocks_per_module + k]
                    x = block_cls(channels[bi],
                                      cfg["num_heads"][bi],
                                      cfg["num_window_sizes"][bi],
                                      float(cfg["num_mlp_ratios"][bi]),
                                      drop_path=dp, use_rpe=self.use_rpe,
                                      fused_eval_mlp=self.fused_eval_mlp,
                                      fused_eval_block=self.fused_eval_block,
                                      fused_eval_onepass=self.fused_eval_onepass,
                                      fused_train_attn=self.fused_train_attn,
                                      min_fused_train_tokens=self.min_fused_train_tokens,
                                      einsum_attn=self.einsum_attn,
                                      dtype=self.dtype,
                                      name=f"m{m}_b{bi}_blk{k}")(
                                          x, mask, train, fused_budget)
                xs[bi] = x
            mso = self.multi_scale_output or m < cfg["num_modules"] - 1
            xs = HRTFuse(nb, channels, multi_scale_output=mso, dtype=self.dtype,
                         name=f"m{m}_fuse")(xs, mask, train)
        return xs


class HRFormer(nn.Module):
    """Full HRFormer-B pose model: returns (branch0 features, heatmaps)."""

    arch: Dict
    num_joints: int = 17
    use_rpe: bool = False
    fused_eval_mlp: bool = False
    fused_eval_block: bool = False
    fused_eval_onepass: bool = False
    fused_train_attn: bool = False
    min_fused_train_tokens: Optional[int] = None
    # TPU.FUSED_TRAIN_MAX_BLOCKS: cap on how many eligible blocks (in call
    # order) take the fused-train kernel path; -1 = unlimited. Plan B for
    # compile-helper memory caps — see docs/perf/hrformer_r03.md step 5.
    fused_train_max_blocks: int = -1
    einsum_attn: bool = False   # TPU.WINDOW_ATTN_EINSUM layout experiment
    remat: bool = False   # TPU.REMAT in (True,'layers'): nn.remat each block
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, sample_valid=None, train: bool = False):
        p = x.shape[0]
        mask = sample_valid
        fused_budget = (None if self.fused_train_max_blocks < 0
                        else [int(self.fused_train_max_blocks)])

        # stem (conv/2 + conv/2 + 2x Bottleneck64)
        x = ConvBN(64, (3, 3), (2, 2), dtype=self.dtype, name="conv1")(x, mask, train)
        x = ConvBN(64, (3, 3), (2, 2), dtype=self.dtype, name="conv2")(x, mask, train)
        for i in range(2):
            x = Bottleneck(64, downsample=(i == 0), dtype=self.dtype,
                           name=f"layer1_{i}")(x, mask, train)

        depths = [self.arch[s]["num_modules"] * self.arch[s]["num_blocks"][0]
                  for s in ("stage2", "stage3", "stage4")]
        dpr = list(np.linspace(0, self.arch["drop_path_rate"], sum(depths)))

        xs = [x]
        o = 0
        for si, s in enumerate(("stage2", "stage3", "stage4")):
            cfg = self.arch[s]
            n = depths[si]
            mso = cfg.get("multiscale_output", s != "stage4")
            xs = HRTStage(dict(cfg), tuple(dpr[o:o + n]), multi_scale_output=mso,
                          use_rpe=self.use_rpe, fused_eval_mlp=self.fused_eval_mlp,
                          fused_eval_block=self.fused_eval_block,
                          fused_eval_onepass=self.fused_eval_onepass,
                          fused_train_attn=self.fused_train_attn,
                          min_fused_train_tokens=self.min_fused_train_tokens,
                          einsum_attn=self.einsum_attn,
                          remat=self.remat,
                          dtype=self.dtype, name=s)(
                              xs, mask, train, fused_budget=fused_budget)
            o += n

        feat = xs[0]  # [P, h/4, w/4, 78]
        heat = nn.Conv(self.num_joints, (1, 1), kernel_init=conv_init,
                       dtype=self.dtype, name="final_layer")(feat)
        heat = heat.transpose(0, 3, 1, 2).astype(jnp.float32)
        return feat, heat


@register_model("hrformer")
def build_hrformer(cfg, use_pallas: Optional[bool] = None, arch: Optional[Dict] = None):
    """Factory (cf. reference ``hrformer.py:2487-2533``; DIM_MODEL must be 78
    to match branch0 channels)."""
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.TPU.COMPUTE_DTYPE]
    remat = cfg.TPU.get("REMAT", False) in (True, "layers")
    max_blocks = cfg.TPU.get("FUSED_TRAIN_MAX_BLOCKS", -1)
    if remat and max_blocks >= 0:
        # the fused-budget countdown is a mutable list, which cannot be a
        # static arg of nn.remat — the combination is unsupported
        raise ValueError(
            "TPU.REMAT='layers' is incompatible with "
            "TPU.FUSED_TRAIN_MAX_BLOCKS >= 0; use REMAT='dots'/'full' "
            "(step-level jax.checkpoint) instead")
    # use_pallas=False (explicit, e.g. CPU parity tests) disables every
    # fused Pallas path, like the other builders; None defers to the config
    up = use_pallas if use_pallas is not None else cfg.TPU.USE_PALLAS_ATTENTION
    if up and cfg.TPU.get("FUSED_BLOCK_TRAIN", False):
        import logging
        logging.getLogger(__name__).warning(
            "TPU.FUSED_BLOCK_TRAIN is RETIRED as a perf knob (r5): measured "
            "+2.5%% (r3) and +145%% for the einsum variant (r4) vs the XLA "
            "path — the window relayouts it elides are load-bearing for MXU "
            "utilization (docs/perf/hrformer_r04.md). Honoring it for "
            "experimentation only.")
    return HRFormer(
        arch=arch or HRFORMER_B_ARCH,
        num_joints=cfg.MODEL.NUM_JOINTS,
        fused_eval_mlp=up and cfg.TPU.get("FUSED_MLP_EVAL", False),
        fused_eval_block=up and cfg.TPU.get("FUSED_BLOCK_EVAL", True),
        fused_eval_onepass=up and cfg.TPU.get("FUSED_BLOCK_EVAL_ONEPASS", False),
        fused_train_attn=up and cfg.TPU.get("FUSED_BLOCK_TRAIN", False),
        min_fused_train_tokens=cfg.TPU.get("MIN_FUSED_TRAIN_TOKENS", None),
        fused_train_max_blocks=max_blocks,
        einsum_attn=cfg.TPU.get("WINDOW_ATTN_EINSUM", False),
        remat=remat,
        dtype=dtype,
    )
