"""Vanilla I²R-Net (``interformer_pureMulti``): HRNet-W48-S trunk + one
inter-human transformer encoder over all persons' tokens + deconv head.

Static-shape redesign of reference ``lib/models/interformer_pureMulti.py:
419-822`` (class confusingly named ``TransPoseH`` there):

reference forward (:752-778)                 this module
---------------------------------------     ----------------------------------
x [sum(len),3,256,192]                       images [B,N,256,192,3] + valid [B,N]
deal_by_backbone -> reduce y_list[-1]        HRNetTrunk -> 1x1 reduce, [B*N,16,12,C]
padding_tensor / get_mask                    (already static; key mask from valid)
PositionEmbeddingImage(pos_mask)             same, NHWC
flatten [n*h*w, B, C] -> encoder             [B, N*h*w, C] -> TransformerEncoder
deconv_layers applied TWICE (multiplex)      one DeconvBlock called twice (shared
                                             params — faithful to the quirk)
final 1x1 conv -> heatmaps                   same
get_valid_output                             output stays [B,N,...]; padded rows
                                             are zeroed
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from i2rnet_tpu.models.encoder import TransformerEncoder, flatten_person_tokens, unflatten_person_tokens
from i2rnet_tpu.models.hrnet import HRNetTrunk
from i2rnet_tpu.models.layers import DeconvBlock, conv_init
from i2rnet_tpu.models.position import PositionEmbeddingImage
from i2rnet_tpu.registry import register_model


class PureMultiInterFormer(nn.Module):
    """Single-model I²R-Net. Emits dict with key 'multi': [B, N, K, hh, hw]."""

    extra: Dict
    num_joints: int = 17
    d_model: int = 96
    dim_feedforward: int = 192
    n_head: int = 1
    encoder_layers: int = 6
    trans_size: tuple = (16, 12)          # (h, w) token grid
    heatmap_size: tuple = (48, 64)        # (w, h) as configured
    use_multi_pos: bool = True
    multi_pos_mode: str = "conv"
    final_conv_kernel: int = 1
    use_pallas: bool = False
    flash_train: bool = True
    fused_ffn_train: bool = True
    remat: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, images, pos_masks, person_valid, train: bool = False):
        """images [B,N,H,W,3]; pos_masks [B,N,H,W,1]; person_valid [B,N] bool."""
        b, n, h, w, _ = images.shape
        th, tw = self.trans_size
        flat_valid = person_valid.reshape(b * n)

        x = images.reshape(b * n, h, w, 3).astype(self.dtype or images.dtype)
        ys = HRNetTrunk(self.extra, dtype=self.dtype, name="trunk")(x, flat_valid, train)
        # reduce on the lowest-res branch (reference :702 uses y_list[-1])
        feat = nn.Conv(self.d_model, (1, 1), use_bias=False, kernel_init=conv_init,
                       dtype=self.dtype, name="reduce")(ys[-1])  # [B*N, th, tw, C]

        tokens = feat.reshape(b, n, th, tw, self.d_model)
        if self.use_multi_pos:
            pos = PositionEmbeddingImage(
                (th, tw), self.d_model, mode=self.multi_pos_mode,
                dtype=self.dtype, name="multi_pos")(pos_masks, person_valid, train)
            pos = flatten_person_tokens(pos.astype(tokens.dtype))
        else:
            pos = None

        key_pad = jnp.repeat(~person_valid, th * tw, axis=1)  # [B, N*th*tw] True=pad
        src = flatten_person_tokens(tokens)
        out = TransformerEncoder(
            self.encoder_layers, self.n_head, self.dim_feedforward,
            use_pallas=self.use_pallas, flash_train=self.flash_train,
            fused_ffn_train=self.fused_ffn_train,
            remat=self.remat, dtype=self.dtype,
            name="encoder",
        )(src, key_padding_mask=key_pad, pos=pos, deterministic=not train)
        out = unflatten_person_tokens(out, n, th, tw).reshape(b * n, th, tw, self.d_model)

        # multiplexed deconv: ONE set of parameters applied twice (16x12 ->
        # 32x24 -> 64x48), faithful to reference :774-775. NB in the reference
        # the pureMulti deconv BN sees padded persons too; we keep BN masked
        # to valid persons (documented deviation — cleaner statistics).
        deconv = DeconvBlock(self.extra["NUM_DECONV_FILTERS"][0],
                             kernel=self.extra["NUM_DECONV_KERNELS"][0],
                             use_bias=self.extra.get("DECONV_WITH_BIAS", False),
                             dtype=self.dtype, name="deconv")
        out = deconv(out, flat_valid, train)
        out = deconv(out, flat_valid, train)

        pad = self.final_conv_kernel // 2
        heat = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                       padding=pad, kernel_init=conv_init, dtype=self.dtype,
                       name="final_layer")(out)
        hh, ww = heat.shape[1], heat.shape[2]
        heat = heat.reshape(b, n, hh, ww, self.num_joints).transpose(0, 1, 4, 2, 3)
        heat = heat * person_valid[:, :, None, None, None].astype(heat.dtype)
        return {"single": None, "multi": heat.astype(jnp.float32)}


@register_model("interformer_pureMulti")
def build_pure_multi(cfg, use_pallas: Optional[bool] = None):
    """Factory from a reference-schema config (cf. reference ``get_pose_net``
    at ``interformer_pureMulti.py:816-822``)."""
    m = cfg.MODEL
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.TPU.COMPUTE_DTYPE]
    return PureMultiInterFormer(
        extra=m.EXTRA.to_dict() if hasattr(m.EXTRA, "to_dict") else dict(m.EXTRA),
        num_joints=m.NUM_JOINTS,
        d_model=m.DIM_MODEL,
        dim_feedforward=m.DIM_FEEDFORWARD,
        n_head=m.N_HEAD,
        encoder_layers=m.ENCODER_LAYERS,
        trans_size=tuple(m.TRANS_SIZE),
        heatmap_size=tuple(m.HEATMAP_SIZE),
        use_multi_pos=m.USE_MULTI_POS,
        multi_pos_mode=m.MULTI_POS_EMBEDDING,
        final_conv_kernel=m.EXTRA.get("FINAL_CONV_KERNEL", 1),
        use_pallas=cfg.TPU.USE_PALLAS_ATTENTION if use_pallas is None else use_pallas,
        flash_train=cfg.TPU.get("FLASH_TRAIN_ATTENTION", True),
        fused_ffn_train=cfg.TPU.get("FUSED_FFN_TRAIN", True),
        # 'layers'/true -> per-encoder-layer nn.remat here; 'dots'/'full'
        # are step-level jax.checkpoint policies applied in core/train.py
        remat=cfg.TPU.REMAT in (True, "layers"),
        dtype=dtype,
    )
