"""DETR-style transformer encoder with key-padding masks (batch-first).

Equivalent of the reference's ``TransformerEncoderLayerDefault`` /
``TransformerEncoderDefault`` (``lib/models/attention.py:37-172``) and the
intra-stage ``TransformerEncoder`` (``lib/models/interformer_pureMulti.py:
110-243``), redesigned for XLA:

* tokens are ``[B, S, C]`` (batch-first; the reference uses ``[S, B, C]``),
* the ragged person axis is pre-flattened into S with a static bool
  ``key_padding_mask`` instead of runtime padding,
* attention routes through :mod:`i2rnet_tpu.ops.attention` (XLA or Pallas).

Semantics matched: post-norm residual layout, PE added to q and k (not v)
every layer unless ``pe_only_at_begin``, ReLU FFN, dropout 0.1 in training,
Xavier-uniform init on all >1-d params (reference ``attention.py:126-129``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from i2rnet_tpu.ops.attention import masked_mhsa

xavier = nn.initializers.xavier_uniform()


class SelfAttention(nn.Module):
    """q/k/v + output projection around the masked-MHSA compute op.

    Mirrors ``torch.nn.MultiheadAttention`` layout (packed in-proj, out-proj)
    so checkpoint conversion is a reshape.
    """

    num_heads: int
    dropout_rate: float = 0.1
    use_pallas: bool = False
    flash_train: bool = True   # TPU.FLASH_TRAIN_ATTENTION (needs use_pallas)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None,
                 deterministic: bool = True):
        c = query.shape[-1]
        q = nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="v_proj")(value)
        if deterministic or self.dropout_rate == 0.0:
            # inference / no-dropout: fused Pallas kernel eligible
            out = masked_mhsa(q, k, v, self.num_heads, key_padding_mask,
                              use_pallas=self.use_pallas)
        elif self.use_pallas and self.flash_train:
            # training: flash kernel with in-kernel attention-weight dropout
            # (torch semantics in distribution; no [B,H,S,S] in HBM)
            from i2rnet_tpu.ops.attention import masked_mhsa_flash_train
            out = masked_mhsa_flash_train(q, k, v, self.num_heads,
                                          key_padding_mask,
                                          dropout_rate=self.dropout_rate,
                                          dropout_rng=self.make_rng("dropout"))
        else:
            # training with dropout: torch semantics — dropout on the
            # attention WEIGHTS (reference attention.py:451-454), via the
            # unfused XLA path
            from i2rnet_tpu.ops.attention import masked_mhsa_xla
            out = masked_mhsa_xla(q, k, v, self.num_heads, key_padding_mask,
                                  dropout_rate=self.dropout_rate,
                                  dropout_rng=self.make_rng("dropout"))
        return nn.Dense(c, kernel_init=xavier, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-/pre-norm DETR encoder layer (reference ``attention.py:37-112``).

    ``fused_ffn_eval`` routes the post-norm LN1 -> FFN -> residual -> LN2
    tail through one Pallas pass at inference
    (``ops/pallas/encoder_ffn.py``); training and pre-norm use flax ops.
    """

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    use_pallas: bool = False
    fused_ffn_eval: bool = False
    flash_train: bool = True
    fused_ffn_train: bool = True   # TPU.FUSED_FFN_TRAIN (needs use_pallas)
    dtype: Optional[Any] = None

    def setup(self):
        self.self_attn = SelfAttention(self.num_heads, self.dropout_rate,
                                       use_pallas=self.use_pallas,
                                       flash_train=self.flash_train,
                                       dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.linear1 = nn.Dense(self.dim_feedforward, kernel_init=xavier,
                                dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, kernel_init=xavier,
                                dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, src, key_padding_mask=None, pos=None,
                 deterministic: bool = True):
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]

        def with_pos(x):
            return x if pos is None else x + pos

        def drop(x):
            return self.dropout(x, deterministic=deterministic)

        if self.normalize_before:
            src2 = self.norm1(src)
            qk = with_pos(src2)
            # reference forward_pre passes the *un-normed* src as value
            # (attention.py:95); matched here.
            src = src + drop(self.self_attn(qk, qk, src, key_padding_mask,
                                            deterministic))
            src2 = self.norm2(src)
            return src + drop(self.linear2(drop(act(self.linear1(src2)))))

        qk = with_pos(src)
        src = src + drop(self.self_attn(qk, qk, src, key_padding_mask,
                                        deterministic))

        if (self.fused_ffn_eval and self.activation == "relu" and deterministic
                and not self.is_initializing()):
            # fused LN1 -> FFN -> residual -> LN2 tail (one HBM pass)
            import jax as _jax

            from i2rnet_tpu.ops.pallas.encoder_ffn import encoder_ffn_fused
            n1 = self.norm1.variables["params"]
            n2 = self.norm2.variables["params"]
            p1 = self.linear1.variables["params"]
            p2 = self.linear2.variables["params"]
            return encoder_ffn_fused(
                src, n1["scale"], n1["bias"], p1["kernel"], p1["bias"],
                p2["kernel"], p2["bias"], n2["scale"], n2["bias"],
                interpret=_jax.default_backend() == "cpu")

        if (self.use_pallas and self.fused_ffn_train
                and self.activation == "relu" and not deterministic
                and not self.is_initializing()):
            # training: same fused tail, dropout generated in-kernel, one
            # backward kernel producing dx + all parameter grads
            from i2rnet_tpu.ops.pallas.encoder_ffn_train import \
                encoder_ffn_train_auto
            n1 = self.norm1.variables["params"]
            n2 = self.norm2.variables["params"]
            p1 = self.linear1.variables["params"]
            p2 = self.linear2.variables["params"]
            rng = (self.make_rng("dropout") if self.dropout_rate > 0.0
                   else None)
            return encoder_ffn_train_auto(
                src, n1["scale"], n1["bias"], p1["kernel"], p1["bias"],
                p2["kernel"], p2["bias"], n2["scale"], n2["bias"],
                self.dropout_rate, rng)

        src = self.norm1(src)
        ffn = self.linear2(drop(act(self.linear1(src))))
        src = src + drop(ffn)
        return self.norm2(src)


class TransformerEncoder(nn.Module):
    """Stack of encoder layers over flat tokens [B, S, C]."""

    num_layers: int
    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    pe_only_at_begin: bool = False
    use_pallas: bool = False
    fused_ffn_eval: bool = True
    flash_train: bool = True
    fused_ffn_train: bool = True
    remat: bool = False   # rematerialize each layer in the backward pass
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, src, key_padding_mask=None, pos=None,
                 deterministic: bool = True):
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # trade FLOPs for activation memory (TPU.REMAT); deterministic is
            # static (index counts self)
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(4,))
        out = src
        for i in range(self.num_layers):
            out = layer_cls(
                src.shape[-1], self.num_heads, self.dim_feedforward,
                self.dropout_rate, self.activation, self.normalize_before,
                self.use_pallas, self.fused_ffn_eval, self.flash_train,
                self.fused_ffn_train, self.dtype, name=f"layer{i}",
            )(out, key_padding_mask, pos, deterministic)
            if self.pe_only_at_begin:
                pos = None
        return out


class WindowInterEncoder(nn.Module):
    """Inter-stage ``ATTENTION_TYPE: 'window'`` encoder.

    Faithful to the reference dispatch (``lib/models/attention.py:1046-1060``
    -> ``GeneralTransformerBlock`` :991-1032): ONE ``MHA_`` layer applied
    globally over all persons' tokens — the window partition step is
    commented out in the reference (``attention.py:933-951``), so despite the
    name this is global attention; there is no norm, residual, or FFN in the
    forward (``norm1``/``drop_path`` are constructed but never called), and
    the relative-position-bias table is built but never added to the logits
    (``attention.py:779-787``). We carry ``rpe_table`` for checkpoint parity
    and replicate the forward exactly: q = k = src + pos, v = src, masked
    softmax, out-projection.

    DOCUMENTED DEVIATION: the reference's reverse reshape
    (``attention.py:1029-1030``) treats the ``[L, B, C]`` attention output as
    batch-first, silently scrambling tokens across batch elements — a latent
    bug in an unused path (no released YAML sets 'window'). We implement the
    obviously-intended inverse; ``tests/test_torch_parity.py`` verifies
    against a corrected reference forward.
    """

    num_heads: int
    window_size: int = 7
    use_pallas: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, src, key_padding_mask=None, pos=None,
                 deterministic: bool = True):
        # parity-only parameter (never added to logits — reference quirk)
        self.param("rpe_table", nn.initializers.truncated_normal(0.02),
                   ((2 * self.window_size - 1) ** 2, self.num_heads),
                   jnp.float32)
        qk = src if pos is None else src + pos
        return SelfAttention(self.num_heads, dropout_rate=0.0,
                             use_pallas=self.use_pallas, dtype=self.dtype,
                             name="attn")(qk, qk, src, key_padding_mask,
                                          deterministic)


def flatten_person_tokens(x):
    """[B, N, H, W, C] -> [B, N*H*W, C] (person-major token order, matching the
    reference ``flatten_input`` at ``attention.py:131-137``)."""
    b, n, h, w, c = x.shape
    return x.reshape(b, n * h * w, c)


def unflatten_person_tokens(tokens, n, h, w):
    """[B, N*H*W, C] -> [B, N, H, W, C]."""
    b, s, c = tokens.shape
    return tokens.reshape(b, n, h, w, c)
