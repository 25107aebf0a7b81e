"""Two-stage InterFormer: a first-stage (intra-human) model + the inter-human
relation encoder + upsample/residual head.

Reimplements reference ``lib/models/interformer.py:130-330`` with static
person shapes:

* first stage (``SINGLEFORMER``: transpose_h / hrformer) runs per person on
  the flattened [B*N] axis and returns (features, single_heatmaps);
* features are max-pooled to TRANS_SIZE (:290, 3x3/s2 pools), padded persons
  stay in-batch but masked;
* inter encoder over [B, N*th*tw] tokens with key-padding mask; optional
  multi-person position embedding from the box-mask image ('conv'/'res'/
  'cat_vec' incl. the 1x1 fc fuse, :296-302);
* upsample back to heatmap resolution: 'deconv' (log2 separate DeconvBlocks),
  'upconv' (1x1+BN+nearest then double conv), or 'multiplex' (ONE deconv
  applied twice, :308-312);
* residual add of first-stage features (:314-315), 1x1 final conv;
* returns {'single', 'multi'} when inter-supervision is active and the first
  stage is trainable, else only 'multi' (:320-323) — here always a dict,
  with 'single'=None in the latter case.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from i2rnet_tpu.models.encoder import (TransformerEncoder, WindowInterEncoder,
                                       flatten_person_tokens,
                                       unflatten_person_tokens)
from i2rnet_tpu.models.hrnet import HRNetTrunk
from i2rnet_tpu.models.layers import ConvBN, DeconvBlock, conv_init, max_pool_3x3_s2, upsample_nearest
from i2rnet_tpu.models.position import PositionEmbeddingImage
from i2rnet_tpu.registry import register_model


class UpConv(nn.Module):
    """1x1 conv + BN + nearest upsample + (3x3 conv BN ReLU) x2
    (reference ``interformer.py:25-64``)."""

    d_model: int
    scale_factor: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = ConvBN(self.d_model, (1, 1), relu=False, dtype=self.dtype,
                   name="fuse")(x, mask, train)
        x = upsample_nearest(x, self.scale_factor)
        x = ConvBN(self.d_model, (3, 3), dtype=self.dtype, name="conv1")(x, mask, train)
        x = ConvBN(self.d_model, (3, 3), dtype=self.dtype, name="conv2")(x, mask, train)
        return x


class InterFormer(nn.Module):
    """Composition wrapper. ``singleformer`` is any module with the
    ``(x, valid, train) -> (features, heatmaps)`` contract, or None to use a
    bare HRNet backbone (reference ``build_backbone``)."""

    extra: Dict
    singleformer: Optional[nn.Module]
    num_joints: int = 17
    d_model: int = 96
    dim_feedforward: int = 192
    n_head: int = 1
    encoder_multi_layers: int = 2
    trans_size: tuple = (16, 12)       # (h, w)
    heatmap_size: tuple = (48, 64)     # (w, h)
    use_multi_pos: bool = False
    multi_pos_mode: str = "conv"
    multi_pos_dim: int = 96
    upsample_type: str = "deconv"      # 'deconv' | 'upconv' | 'multiplex'
    attention_type: str = "default"    # 'default' | 'window' (attention.py:1054)
    window_size: int = 7
    domain_trans: bool = False         # 1x1 convs on both residual operands
    inter_supervision: bool = True     # (reference interformer_2stage.py:277-279)
    singleformer_fix: bool = False
    frozen_stage_eval: bool = False    # TPU.FROZEN_STAGE_EVAL_MODE
    final_conv_kernel: int = 1
    res_layer: int = 0                 # bare-backbone reduce branch
    use_pallas: bool = False
    flash_train: bool = True
    fused_ffn_train: bool = True
    remat: bool = False   # nn.remat each encoder layer (TPU.REMAT 'layers')
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, images, pos_masks, person_valid, train: bool = False):
        b, n, h, w, _ = images.shape
        th, tw = self.trans_size
        flat_valid = person_valid.reshape(b * n)
        x = images.reshape(b * n, h, w, 3).astype(self.dtype or images.dtype)

        single_heat = None
        if self.singleformer is not None:
            # TPU.FROZEN_STAGE_EVAL_MODE: a frozen first stage may run in
            # eval mode during training — BN stats freeze, dropout/droppath
            # off, and the fused eval-only Pallas block kernels carry the
            # forward (documented deviation; default off = torch-faithful
            # train()-mode frozen modules)
            stage_train = train and not (self.singleformer_fix
                                         and self.frozen_stage_eval)
            feat, single_heat = self.singleformer(x, flat_valid, stage_train)
            if self.singleformer_fix and train:
                # reference two-stage recipe freezes the whole first stage
                # with requires_grad_(False) (transpose_h.py:705-706) — torch
                # never builds its backward graph. stop_gradient gives XLA
                # the same dead-code elimination: the (large) first-stage
                # backward is never compiled, only the inter stage trains.
                # BN running stats still update via the mutable collection,
                # matching torch train()-mode behavior for frozen modules.
                feat = jax.lax.stop_gradient(feat)
                single_heat = jax.lax.stop_gradient(single_heat)
            single_res = feat                       # [B*N, fh, fw, C]
            # FLOORED log2 pool rate, then the ACTUAL pooled shape becomes
            # the inter-encoder token map — NOT trans_size. The reference
            # does exactly this (interformer.py:260-264 pools by
            # int(log(w/trans_w, 2)) then uses x.shape downstream): the
            # released 384x288 config declares the vestigial TRANS_SIZE
            # [9, 12] but actually runs the inter encoder at 24x18
            # (72 // 12 = 6 -> floor(log2) = 2 pools from 96x72).
            pool_steps = int(math.log2(feat.shape[2] // tw))
            for _ in range(pool_steps):
                feat = max_pool_3x3_s2(feat)        # -> [B*N, th', tw', C]
        else:
            ys = HRNetTrunk(self.extra, dtype=self.dtype, name="backbone")(
                x, flat_valid, train)
            feat = nn.Conv(self.d_model, (1, 1), use_bias=False,
                           kernel_init=conv_init, dtype=self.dtype,
                           name="reduce")(ys[-1])
            single_res = None

        # the ACTUAL feature-map shape is the inter-encoder token grid
        # (reference generate_mask/flatten use x.shape, interformer.py:
        # 266-272 — trans_size only sets the floored pool rate above)
        th, tw = feat.shape[1], feat.shape[2]
        tokens = feat.reshape(b, n, th, tw, self.d_model)
        key_pad = jnp.repeat(~person_valid, th * tw, axis=1)

        pos = None
        if self.use_multi_pos:
            pos = PositionEmbeddingImage(
                (th, tw), self.d_model, mode=self.multi_pos_mode,
                vec_dim=self.multi_pos_dim, dtype=self.dtype,
                name="multi_pos")(pos_masks, person_valid, train)
            pos = pos.astype(tokens.dtype)

        # inter-encoder dispatch on ATTENTION_TYPE (reference
        # attention.py:1054-1060; unknown values rejected loudly in the
        # builder)
        if self.attention_type == "window":
            encoder = WindowInterEncoder(self.n_head, self.window_size,
                                         use_pallas=self.use_pallas,
                                         dtype=self.dtype, name="multi_encoder")
        else:
            encoder = TransformerEncoder(
                self.encoder_multi_layers, self.n_head, self.dim_feedforward,
                use_pallas=self.use_pallas, flash_train=self.flash_train,
                fused_ffn_train=self.fused_ffn_train,
                remat=self.remat,
                dtype=self.dtype,
                name="multi_encoder")

        if self.multi_pos_mode == "cat_vec":
            # concat PE to channels, encode at C+vec_dim, 1x1 fc back
            # (reference interformer.py:296-302)
            if pos is not None:
                tokens = jnp.concatenate([tokens, pos], axis=-1)
            src = flatten_person_tokens(tokens)
            out = encoder(src, key_padding_mask=key_pad, pos=None,
                          deterministic=not train)
            out = unflatten_person_tokens(out, n, th, tw).reshape(
                b * n, th, tw, out.shape[-1])
            if pos is not None:
                out = nn.Conv(self.d_model, (1, 1), kernel_init=conv_init,
                              dtype=self.dtype, name="fc")(out)
        else:
            src = flatten_person_tokens(tokens)
            pos_flat = flatten_person_tokens(pos) if pos is not None else None
            out = encoder(src, key_padding_mask=key_pad, pos=pos_flat,
                          deterministic=not train)
            out = unflatten_person_tokens(out, n, th, tw).reshape(
                b * n, th, tw, self.d_model)

        # upsample TRANS_SIZE -> HEATMAP_SIZE
        up_steps = int(math.log2(self.heatmap_size[0] // tw))
        filters = self.extra["NUM_DECONV_FILTERS"][0]
        kernel = self.extra["NUM_DECONV_KERNELS"][0]
        with_bias = self.extra.get("DECONV_WITH_BIAS", False)
        if self.upsample_type == "upconv":
            out = UpConv(self.d_model, 2 ** up_steps, dtype=self.dtype,
                         name="upsample")(out, flat_valid, train)
        elif self.upsample_type == "deconv":
            for i in range(up_steps):  # separate params per step (DeConv list)
                out = DeconvBlock(filters, kernel=kernel, use_bias=with_bias,
                                  dtype=self.dtype, name=f"deconv{i}")(out, flat_valid, train)
        else:  # 'multiplex': ONE deconv applied repeatedly (shared params)
            deconv = DeconvBlock(filters, kernel=kernel, use_bias=with_bias,
                                 dtype=self.dtype, name="deconv")
            for _ in range(up_steps):
                out = deconv(out, flat_valid, train)

        if single_res is not None:
            if self.domain_trans:
                a = nn.Conv(self.d_model, (1, 1), kernel_init=conv_init,
                            dtype=self.dtype, name="domain_trans_1")(single_res)
                c2 = nn.Conv(self.d_model, (1, 1), kernel_init=conv_init,
                             dtype=self.dtype, name="domain_trans_2")(out)
                out = a + c2
            else:
                out = single_res + out  # residual (reference :314-315)

        pad = self.final_conv_kernel // 2
        heat = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                       padding=pad, kernel_init=conv_init, dtype=self.dtype,
                       name="final_layer")(out)
        hh, ww = heat.shape[1], heat.shape[2]
        heat = heat.reshape(b, n, hh, ww, self.num_joints).transpose(0, 1, 4, 2, 3)
        vmask = person_valid[:, :, None, None, None].astype(heat.dtype)
        heat = (heat * vmask).astype(jnp.float32)

        outputs = {"single": None, "multi": heat}
        if (self.inter_supervision and self.singleformer is not None
                and not self.singleformer_fix):
            sh = single_heat.reshape(b, n, self.num_joints, hh, ww)
            outputs["single"] = (sh * vmask).astype(jnp.float32)
        return outputs


def _build_interformer(cfg, use_pallas: Optional[bool] = None,
                       encoder_multi_layers: Optional[int] = None):
    from i2rnet_tpu.registry import get_model_builder
    m = cfg.MODEL
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.TPU.COMPUTE_DTYPE]
    up = use_pallas if use_pallas is not None else cfg.TPU.USE_PALLAS_ATTENTION

    if m.ATTENTION_TYPE not in ("default", "window"):
        raise ValueError(
            f"MODEL.ATTENTION_TYPE={m.ATTENTION_TYPE!r} is not supported "
            "(expected 'default' or 'window', reference attention.py:1054)")

    single = None
    if m.SINGLEFORMER:
        single = get_model_builder(m.SINGLEFORMER)(cfg, use_pallas=up)

    return InterFormer(
        extra=m.EXTRA.to_dict() if hasattr(m.EXTRA, "to_dict") else dict(m.EXTRA),
        singleformer=single,
        num_joints=m.NUM_JOINTS,
        d_model=m.DIM_MODEL,
        dim_feedforward=m.DIM_FEEDFORWARD,
        n_head=m.N_HEAD,
        encoder_multi_layers=(encoder_multi_layers if encoder_multi_layers
                              is not None else m.ENCODER_MULTI_LAYERS),
        trans_size=tuple(m.TRANS_SIZE),
        heatmap_size=tuple(m.HEATMAP_SIZE),
        use_multi_pos=m.USE_MULTI_POS,
        multi_pos_mode=m.MULTI_POS_EMBEDDING,
        multi_pos_dim=m.MULTI_POS_EMBEDDING_DIM,
        upsample_type=m.UPSAMPLE_TYPE,
        attention_type=m.ATTENTION_TYPE,
        window_size=m.WINDOW_SIZE,
        domain_trans=m.DOMAIN_TRANS,
        inter_supervision=m.INTER_SUPERVISION,
        singleformer_fix=m.SINGLEFORMER_FIX,
        frozen_stage_eval=cfg.TPU.get("FROZEN_STAGE_EVAL_MODE", False),
        final_conv_kernel=m.EXTRA.get("FINAL_CONV_KERNEL", 1),
        res_layer=m.HRNET_RES_LAYER,
        use_pallas=up,
        flash_train=cfg.TPU.get("FLASH_TRAIN_ATTENTION", True),
        fused_ffn_train=cfg.TPU.get("FUSED_FFN_TRAIN", True),
        remat=cfg.TPU.get("REMAT", False) in (True, "layers"),
        dtype=dtype,
    )


@register_model("interformer")
def build_interformer(cfg, use_pallas: Optional[bool] = None):
    return _build_interformer(cfg, use_pallas)


@register_model("interformer_2stage")
def build_interformer_2stage(cfg, use_pallas: Optional[bool] = None):
    """Legacy 2-stage variant (reference ``interformer_2stage.py``): same
    composition; its own DETR encoder copies and pool_or_deconv reduce to the
    behavior implemented above for the released config."""
    return _build_interformer(cfg, use_pallas)
