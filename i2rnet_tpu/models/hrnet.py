"""HRNet multi-resolution trunk (stem + configurable parallel stages).

TPU-first reimplementation of the reference's HRNet pieces — the shared stem
(``lib/models/interformer_pureMulti.py:425-434``), ``HighResolutionModule``
(:246-410), transitions (:543-582) and stage assembly (:603-633), also used
by ``lib/models/hrnet.py`` and ``lib/models/transpose_h.py``.

Everything is NHWC; branch lists are static python lists of arrays (XLA sees
a fixed graph). Fusion upsampling is exact nearest-neighbor repeat; all BN is
masked (see layers.MaskedBatchNorm).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

from flax import linen as nn

from i2rnet_tpu.models.layers import BLOCKS, Bottleneck, ConvBN, upsample_nearest


class HRStem(nn.Module):
    """conv/2 + conv/2 + 4x Bottleneck(64) -> [B, H/4, W/4, 256]."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = ConvBN(64, (3, 3), (2, 2), dtype=self.dtype, name="conv1")(x, mask, train)
        x = ConvBN(64, (3, 3), (2, 2), dtype=self.dtype, name="conv2")(x, mask, train)
        for i in range(4):
            x = Bottleneck(64, downsample=(i == 0), dtype=self.dtype,
                           name=f"layer1_{i}")(x, mask, train)
        return x


class HighResolutionModule(nn.Module):
    """Parallel branches of residual blocks + full multi-scale fusion."""

    num_branches: int
    block: str                      # 'BASIC' | 'BOTTLENECK'
    num_blocks: Sequence[int]
    num_channels: Sequence[int]     # per-branch output channels (post-expansion)
    multi_scale_output: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: List, mask=None, train: bool = False):
        block_cls = BLOCKS[self.block]
        exp = block_cls.expansion
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            for j in range(self.num_blocks[i]):
                need_ds = (j == 0) and (x.shape[-1] != self.num_channels[i] * exp)
                x = block_cls(self.num_channels[i], downsample=need_ds,
                              dtype=self.dtype, name=f"branch{i}_block{j}")(x, mask, train)
            outs.append(x)

        if self.num_branches == 1:
            return outs

        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            ci = outs[i].shape[-1]
            y = None
            for j in range(self.num_branches):
                if j == i:
                    t = outs[j]
                elif j > i:
                    # 1x1 conv + BN + nearest upsample 2^(j-i)
                    t = ConvBN(ci, (1, 1), relu=False, dtype=self.dtype,
                               name=f"fuse{i}_{j}")(outs[j], mask, train)
                    t = upsample_nearest(t, 2 ** (j - i))
                else:
                    # (i-j) stride-2 3x3 convs; ReLU on all but the last
                    t = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        feats = ci if last else outs[j].shape[-1]
                        t = ConvBN(feats, (3, 3), (2, 2), relu=not last,
                                   dtype=self.dtype, name=f"fuse{i}_{j}_{k}")(t, mask, train)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class Transition(nn.Module):
    """Stage-to-stage transition (reference ``_make_transition_layer``)."""

    num_channels_cur: Sequence[int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: List, mask=None, train: bool = False):
        n_pre = len(xs)
        n_cur = len(self.num_channels_cur)
        outs = []
        for i in range(n_cur):
            if i < n_pre:
                if xs[i].shape[-1] != self.num_channels_cur[i]:
                    outs.append(ConvBN(self.num_channels_cur[i], (3, 3),
                                       dtype=self.dtype, name=f"t{i}")(xs[i], mask, train))
                else:
                    outs.append(xs[i])
            else:
                t = xs[-1]
                for j in range(i + 1 - n_pre):
                    feats = self.num_channels_cur[i] if j == i - n_pre else xs[-1].shape[-1]
                    t = ConvBN(feats, (3, 3), (2, 2), dtype=self.dtype,
                               name=f"t{i}_{j}")(t, mask, train)
                outs.append(t)
        return outs


class HRStage(nn.Module):
    """Transition + NUM_MODULES HighResolutionModules from a STAGEn cfg dict."""

    stage_cfg: Dict
    multi_scale_output: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: List, mask=None, train: bool = False):
        cfg = self.stage_cfg
        block = cfg["BLOCK"]
        exp = BLOCKS[block].expansion
        channels = [c * exp for c in cfg["NUM_CHANNELS"]]
        xs = Transition(channels, dtype=self.dtype, name="transition")(xs, mask, train)
        n_mod = cfg["NUM_MODULES"]
        for m in range(n_mod):
            mso = self.multi_scale_output or m < n_mod - 1
            xs = HighResolutionModule(
                num_branches=cfg["NUM_BRANCHES"],
                block=block,
                num_blocks=tuple(cfg["NUM_BLOCKS"]),
                num_channels=tuple(cfg["NUM_CHANNELS"]),
                multi_scale_output=mso,
                dtype=self.dtype,
                name=f"module{m}",
            )(xs, mask, train)
        return xs


class HRNetTrunk(nn.Module):
    """Stem + stage2 + stage3 (the HRNet-W48-S trunk used by the vanilla
    I²R-Net, TransPose-H and the bare backbone; reference
    ``interformer_pureMulti.py:675-704``). Returns the branch list."""

    extra: Dict  # MODEL.EXTRA with STAGE2/STAGE3 dicts
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = HRStem(dtype=self.dtype, name="stem")(x, mask, train)
        xs = [x]
        xs = HRStage(dict(self.extra["STAGE2"]), dtype=self.dtype, name="stage2")(xs, mask, train)
        xs = HRStage(dict(self.extra["STAGE3"]), dtype=self.dtype, name="stage3")(xs, mask, train)
        return xs
