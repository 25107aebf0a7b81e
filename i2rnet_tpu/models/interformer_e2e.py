"""End-to-end InterFormer (legacy single-module variant).

Reimplements reference ``lib/models/interformer_e2e.py:419-872`` and
``interformer_e2e_new.py``: one module containing the HRNet trunk, the
per-person intra encoder, and the cross-person inter encoder, trained
jointly. Differences from the two-stage composition:

* intra stage has NO head of its own; the 'single' branch output is the
  intra features passed through the (shared or separate) final layer
  (``interformer_e2e.py:826-827``);
* the deconv upsampler is ONE block reused for every 2x step (multiplex,
  ``pool_or_deconv`` :769-777);
* optional ``DOMAIN_TRANS``: 1x1 convs on both residual operands before the
  add (:820-823);
* ``interformer_e2e_new`` uses separate final layers per branch
  (``interformer_e2e_new.py:834-835``); the old one shares a single conv.

Config keys: ENCODER_SINGLE_LAYERS / ENCODER_MUTI_LAYERS (legacy spelling,
reference ``interformer_e2e.py:461-462``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from i2rnet_tpu.models.encoder import TransformerEncoder, flatten_person_tokens, unflatten_person_tokens
from i2rnet_tpu.models.hrnet import HRNetTrunk
from i2rnet_tpu.models.layers import DeconvBlock, conv_init, max_pool_3x3_s2
from i2rnet_tpu.models.position import PositionEmbeddingImage, sine_position_embedding_2d
from i2rnet_tpu.registry import register_model


class InterFormerE2E(nn.Module):
    extra: Dict
    num_joints: int = 17
    d_model: int = 96
    dim_feedforward: int = 192
    n_head: int = 1
    encoder_single_layers: int = 4
    encoder_multi_layers: int = 2
    image_size: tuple = (192, 256)     # (w, h)
    trans_size: tuple = (16, 12)       # (h, w)
    heatmap_size: tuple = (48, 64)     # (w, h)
    single_pos_embedding: str = "sine"
    use_multi_pos: bool = True
    multi_pos_mode: str = "conv"
    domain_trans: bool = False
    res_layer: int = 0
    separate_heads: bool = False       # True = interformer_e2e_new
    final_conv_kernel: int = 1
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

        ys = HRNetTrunk(self.extra, dtype=self.dtype, name="trunk")(x, flat_valid, train)
        x = nn.Conv(self.d_model, (1, 1), use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype, name="reduce")(ys[self.res_layer])
        fh, fw = x.shape[1], x.shape[2]

        # intra encoder over per-person tokens
        if self.single_pos_embedding == "sine":
            pos = jnp.asarray(sine_position_embedding_2d(fh, fw, self.d_model))[None]
            pos = pos.astype(x.dtype)
        elif self.single_pos_embedding == "learnable":
            pos = self.param("single_pos", nn.initializers.normal(1.0),
                             (fh * fw, self.d_model), jnp.float32)[None].astype(x.dtype)
        else:
            pos = None
        tokens = x.reshape(b * n, fh * fw, self.d_model)
        tokens = TransformerEncoder(
            self.encoder_single_layers, self.n_head, self.dim_feedforward,
            use_pallas=self.use_pallas, flash_train=self.flash_train,
            fused_ffn_train=self.fused_ffn_train,
            remat=self.remat,
            dtype=self.dtype,
            name="single_encoder")(tokens, pos=pos, deterministic=not train)
        x = tokens.reshape(b * n, fh, fw, self.d_model)

        deconv = DeconvBlock(self.extra["NUM_DECONV_FILTERS"][0],
                             kernel=self.extra["NUM_DECONV_KERNELS"][0],
                             use_bias=self.extra.get("DECONV_WITH_BIAS", False),
                             dtype=self.dtype, name="deconv")

        def up(t, steps):
            for _ in range(steps):
                t = deconv(t, flat_valid, train)
            return t

        single = up(x, int(math.log2(self.heatmap_size[0] // fw)))

        single_res = x
        feat = x
        for _ in range(int(math.log2(fw // tw))):
            feat = max_pool_3x3_s2(feat)

        # inter encoder across persons
        tokens = feat.reshape(b, n, th, tw, self.d_model)
        key_pad = jnp.repeat(~person_valid, th * tw, axis=1)
        mp = None
        if self.use_multi_pos:
            mp = PositionEmbeddingImage(
                (th, tw), self.d_model, mode=self.multi_pos_mode,
                dtype=self.dtype, name="multi_pos")(pos_masks, person_valid, train)
            mp = flatten_person_tokens(mp.astype(tokens.dtype))
        src = flatten_person_tokens(tokens)
        out = TransformerEncoder(
            self.encoder_multi_layers, self.n_head, self.dim_feedforward,
            use_pallas=self.use_pallas, flash_train=self.flash_train,
            fused_ffn_train=self.fused_ffn_train,
            remat=self.remat,
            dtype=self.dtype,
            name="multi_encoder")(src, key_padding_mask=key_pad, pos=mp,
                                  deterministic=not train)
        out = unflatten_person_tokens(out, n, th, tw).reshape(b * n, th, tw, self.d_model)

        out = up(out, int(math.log2(fw // tw)))
        if self.domain_trans:
            a = nn.Conv(self.d_model, (1, 1), kernel_init=conv_init,
                        dtype=self.dtype, name="domain_trans_1")(single_res)
            c = nn.Conv(self.d_model, (1, 1), kernel_init=conv_init,
                        dtype=self.dtype, name="domain_trans_2")(out)
            out = a + c
        else:
            out = single_res + out
        out = up(out, int(math.log2(self.heatmap_size[0] // fw)))

        pad = self.final_conv_kernel // 2
        if self.separate_heads:
            head_s = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                             padding=pad, kernel_init=conv_init, dtype=self.dtype,
                             name="final_layer_single")
            head_m = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                             padding=pad, kernel_init=conv_init, dtype=self.dtype,
                             name="final_layer_multi")
        else:
            head_s = head_m = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                                      padding=pad, kernel_init=conv_init,
                                      dtype=self.dtype, name="final_layer")
        hs = head_s(single)
        hm = head_m(out)

        def to_out(t):
            hh, ww = t.shape[1], t.shape[2]
            t = t.reshape(b, n, hh, ww, self.num_joints).transpose(0, 1, 4, 2, 3)
            return (t * person_valid[:, :, None, None, None].astype(t.dtype)
                    ).astype(jnp.float32)

        return {"single": to_out(hs), "multi": to_out(hm)}


def _build_e2e(cfg, separate_heads: bool, use_pallas: Optional[bool]):
    m = cfg.MODEL
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.TPU.COMPUTE_DTYPE]
    return InterFormerE2E(
        extra=m.EXTRA.to_dict() if hasattr(m.EXTRA, "to_dict") else dict(m.EXTRA),
        num_joints=m.NUM_JOINTS,
        d_model=m.DIM_MODEL,
        dim_feedforward=m.DIM_FEEDFORWARD,
        n_head=m.N_HEAD,
        encoder_single_layers=m.get("ENCODER_SINGLE_LAYERS", 4),
        encoder_multi_layers=m.get("ENCODER_MUTI_LAYERS", 2),
        image_size=tuple(m.IMAGE_SIZE),
        trans_size=tuple(m.TRANS_SIZE),
        heatmap_size=tuple(m.HEATMAP_SIZE),
        single_pos_embedding=m.SINGLE_POS_EMBEDDING,
        use_multi_pos=m.USE_MULTI_POS,
        multi_pos_mode=m.MULTI_POS_EMBEDDING,
        domain_trans=m.DOMAIN_TRANS,
        res_layer=m.HRNET_RES_LAYER,
        separate_heads=separate_heads,
        final_conv_kernel=m.EXTRA.get("FINAL_CONV_KERNEL", 1),
        use_pallas=cfg.TPU.USE_PALLAS_ATTENTION if use_pallas is None else use_pallas,
        flash_train=cfg.TPU.get("FLASH_TRAIN_ATTENTION", True),
        fused_ffn_train=cfg.TPU.get("FUSED_FFN_TRAIN", True),
        remat=cfg.TPU.get("REMAT", False) in (True, "layers"),
        dtype=dtype,
    )


@register_model("interformer_e2e")
def build_interformer_e2e(cfg, use_pallas: Optional[bool] = None):
    return _build_e2e(cfg, separate_heads=False, use_pallas=use_pallas)


@register_model("interformer_e2e_new")
def build_interformer_e2e_new(cfg, use_pallas: Optional[bool] = None):
    return _build_e2e(cfg, separate_heads=True, use_pallas=use_pallas)
