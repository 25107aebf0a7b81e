"""Position embeddings.

* :func:`sine_position_embedding_2d` — standard DETR 2D sine PE over an
  (h, w) grid (reference ``lib/models/interformer_pureMulti.py:516-541``).
  The multi-person variant spans the concatenated width ``n*w`` (reference
  ``lib/models/position_embedding.py:34-62``).
* :class:`PositionEmbeddingImage` — embeds each person's binary box-mask
  image into per-token embeddings; modes 'conv' / 'res' / 'cat_vec' / 'sine'
  (reference ``lib/models/position_embedding.py:6-117``).

All modes take ``[B, N, H, W, 1]`` box masks and emit ``[B, N, th, tw, C]``
(static shapes; the reference's runtime ``down_rate`` loop becomes a python
loop over static ints).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from i2rnet_tpu.models.layers import BasicBlock, ConvBN, MaskedBatchNorm, conv_init, max_pool_3x3_s2


def sine_position_embedding_2d(h: int, w: int, d_model: int,
                               temperature: float = 10000.0,
                               scale: float = 2 * math.pi) -> np.ndarray:
    """[h*w, d_model] sine PE, matching the reference construction exactly
    (cumsum-normalized y/x, interleaved sin/cos, y-block then x-block)."""
    one_direction = d_model // 2
    y_embed = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x_embed = np.cumsum(np.ones((h, w), np.float32), axis=1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(one_direction, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / one_direction)

    pos_x = x_embed[:, :, None] / dim_t  # [h, w, D/2]
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)  # [h, w, d_model]
    return pos.reshape(h * w, d_model).astype(np.float32)


def sine_position_embedding_multi(n: int, h: int, w: int, d_model: int) -> np.ndarray:
    """Multi-person sine PE spanning concatenated width n*w.

    Returns [n, h, w, d_model] (reference ``position_embedding.py:34-62``
    builds it over an (h, n*w) grid then flattens person-major; we reshape
    back to the person axis)."""
    wide = sine_position_embedding_2d(h, n * w, d_model).reshape(h, n * w, d_model)
    # (h, n*w) -> (n, h, w): person i occupies columns [i*w, (i+1)*w)
    return np.stack([wide[:, i * w:(i + 1) * w, :] for i in range(n)], axis=0)


class PositionEmbeddingImage(nn.Module):
    """Box-mask image -> per-token position embedding.

    Modes (reference ``position_embedding.py``):
      'conv'    two stride-2 ConvBNs (1->64->d_model) then maxpools to
                trans_size  (:24-32, :98-109)
      'res'     conv 1->3, ResNet-18 stem+layer1, conv 64->d_model, maxpools
                (:14-18, :94-97)
      'cat_vec' maxpool mask to trans_size, flatten -> Dense(vec_dim),
                broadcast over tokens (:19-23, :69-88); caller concatenates
                to channels
      'sine'    pure sine PE over concatenated width (:89-91)
    """

    trans_size: Tuple[int, int]  # (h, w) token grid
    d_model: int = 96
    mode: str = "conv"
    vec_dim: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pos_mask, person_valid=None, train: bool = False):
        b, n, h, w, _ = pos_mask.shape
        th, tw = self.trans_size
        x = pos_mask.reshape(b * n, h, w, 1)
        mask = None
        if person_valid is not None:
            mask = person_valid.reshape(b * n)

        if self.mode == "sine":
            pe = jnp.asarray(sine_position_embedding_multi(n, th, tw, self.d_model))
            return jnp.broadcast_to(pe[None], (b, n, th, tw, self.d_model)).astype(
                self.dtype or jnp.float32)

        if self.mode == "cat_vec":
            down = int(math.log2(w // tw))
            for _ in range(down):
                x = max_pool_3x3_s2(x)
            x = x.reshape(b * n, -1)
            x = nn.Dense(self.vec_dim or self.d_model, name="fc", dtype=self.dtype)(x)
            x = x.reshape(b, n, 1, 1, -1)
            return jnp.broadcast_to(x, (b, n, th, tw, x.shape[-1]))

        if self.mode == "res":
            x = nn.Conv(3, (3, 3), padding=1, use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name="conv_pre")(x)
            # ResNet-18 stem: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool + layer1 (2 BasicBlocks)
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype, name="res_conv1")(x)
            x = MaskedBatchNorm(name="res_bn1")(x, mask=mask, train=train)
            x = nn.relu(x)
            x = max_pool_3x3_s2(x)
            x = BasicBlock(64, dtype=self.dtype, name="res_layer1_0")(x, mask, train)
            x = BasicBlock(64, dtype=self.dtype, name="res_layer1_1")(x, mask, train)
            x = nn.Conv(self.d_model, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype, name="conv_end")(x)
        else:  # 'conv'
            x = ConvBN(64, (3, 3), (2, 2), dtype=self.dtype, name="conv1")(x, mask, train)
            x = ConvBN(self.d_model, (3, 3), (2, 2), dtype=self.dtype, name="conv2")(x, mask, train)

        down = int(math.log2(x.shape[2] // tw))
        for _ in range(down):
            x = max_pool_3x3_s2(x)
        return x.reshape(b, n, th, tw, -1)
