"""TransPose-H intra-human (first) stage.

Reimplements reference ``lib/models/transpose_h.py:416-708``: HRNet trunk ->
1x1 reduce on branch ``HRNET_RES_LAYER`` (0 = the 64x48 high-res branch) ->
DETR encoder over all h/4 * w/4 = 3072 per-person tokens with a sine/
learnable 2D PE -> returns ``(features, heatmaps)`` where heatmaps =
1x1 final conv on the encoder output. That tuple contract is what the
two-stage InterFormer composes on (reference ``transpose_h.py:649-655``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from i2rnet_tpu.models.encoder import TransformerEncoder
from i2rnet_tpu.models.hrnet import HRNetTrunk
from i2rnet_tpu.models.layers import conv_init
from i2rnet_tpu.models.position import sine_position_embedding_2d
from i2rnet_tpu.registry import register_model


class TransPoseH(nn.Module):
    """Per-person model over flat [P, H, W, 3] crops.

    Returns (features [P, h/4, w/4, C], heatmaps [P, K, h/4, w/4]).
    """

    extra: Dict
    num_joints: int = 17
    d_model: int = 96
    dim_feedforward: int = 192
    n_head: int = 1
    encoder_layers: int = 6
    image_size: tuple = (192, 256)      # (w, h)
    pos_embedding_type: str = "sine"    # 'sine' | 'learnable' | 'none'
    pe_only_at_begin: bool = False
    res_layer: int = 0                  # HRNET_RES_LAYER
    final_conv_kernel: int = 1
    use_pallas: bool = False
    flash_train: bool = True
    fused_ffn_train: bool = True
    remat: bool = False   # nn.remat each encoder layer (TPU.REMAT 'layers')
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, sample_valid=None, train: bool = False):
        p = x.shape[0]
        w, h = self.image_size
        fh, fw = h // 4, w // 4

        ys = HRNetTrunk(self.extra, dtype=self.dtype, name="trunk")(x, sample_valid, train)
        feat = nn.Conv(self.d_model, (1, 1), use_bias=False, kernel_init=conv_init,
                       dtype=self.dtype, name="reduce")(ys[self.res_layer])
        th, tw = feat.shape[1], feat.shape[2]
        assert (th, tw) == (fh, fw), (th, tw, fh, fw)

        if self.pos_embedding_type == "sine":
            pe = jnp.asarray(sine_position_embedding_2d(fh, fw, self.d_model))
            pos = pe[None].astype(feat.dtype)
        elif self.pos_embedding_type == "learnable":
            pe = self.param("pos_embedding", nn.initializers.normal(1.0),
                            (fh * fw, self.d_model), jnp.float32)
            pos = pe[None].astype(feat.dtype)
        else:
            pos = None

        tokens = feat.reshape(p, fh * fw, self.d_model)
        out = TransformerEncoder(
            self.encoder_layers, self.n_head, self.dim_feedforward,
            pe_only_at_begin=self.pe_only_at_begin, use_pallas=self.use_pallas,
            flash_train=self.flash_train,
            fused_ffn_train=self.fused_ffn_train,
            remat=self.remat,
            dtype=self.dtype, name="global_encoder",
        )(tokens, key_padding_mask=None, pos=pos, deterministic=not train)
        feat_out = out.reshape(p, fh, fw, self.d_model)

        pad = self.final_conv_kernel // 2
        heat = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                       padding=pad, kernel_init=conv_init, dtype=self.dtype,
                       name="final_layer")(feat_out)
        heat = heat.transpose(0, 3, 1, 2).astype(jnp.float32)  # [P, K, fh, fw]
        return feat_out, heat


# "transpose_h_old" is a legacy alias: the reference transpose_h_old.py
# differs from transpose_h.py only in its factory signature.
@register_model("transpose_h_old")
@register_model("transpose_h")
def build_transpose_h(cfg, use_pallas: Optional[bool] = None):
    """Factory (cf. reference ``transpose_h.py:691-708``; checkpoint loading /
    freezing is handled by the checkpoint module + optimizer masks)."""
    m = cfg.MODEL
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.TPU.COMPUTE_DTYPE]
    return TransPoseH(
        extra=m.EXTRA.to_dict() if hasattr(m.EXTRA, "to_dict") else dict(m.EXTRA),
        num_joints=m.NUM_JOINTS,
        d_model=m.DIM_MODEL,
        dim_feedforward=m.DIM_FEEDFORWARD,
        n_head=m.N_HEAD,
        encoder_layers=m.ENCODER_LAYERS,
        image_size=tuple(m.IMAGE_SIZE),
        pos_embedding_type=m.POS_EMBEDDING,
        pe_only_at_begin=m.PE_ONLY_AT_BEGIN,
        res_layer=m.HRNET_RES_LAYER,
        final_conv_kernel=m.EXTRA.get("FINAL_CONV_KERNEL", 1),
        use_pallas=cfg.TPU.USE_PALLAS_ATTENTION if use_pallas is None else use_pallas,
        flash_train=cfg.TPU.get("FLASH_TRAIN_ATTENTION", True),
        fused_ffn_train=cfg.TPU.get("FUSED_FFN_TRAIN", True),
        remat=cfg.TPU.get("REMAT", False) in (True, "layers"),
        dtype=dtype,
    )
