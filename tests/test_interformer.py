"""Tests for TransPose-H and the two-stage InterFormer composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.registry import get_model_builder


def tiny_interformer_cfg(upsample="deconv", use_multi_pos=False,
                         multi_pos_mode="conv", singleformer="transpose_h"):
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.NAME = "interformer"
    cfg.MODEL.SINGLEFORMER = singleformer
    cfg.MODEL.ENCODER_LAYERS = 1
    cfg.MODEL.ENCODER_MULTI_LAYERS = 1
    cfg.MODEL.UPSAMPLE_TYPE = upsample
    cfg.MODEL.USE_MULTI_POS = use_multi_pos
    cfg.MODEL.MULTI_POS_EMBEDDING = multi_pos_mode
    cfg.MODEL.MULTI_POS_EMBEDDING_DIM = 8
    cfg.MODEL.POS_EMBEDDING = "sine"
    cfg.MODEL.HRNET_RES_LAYER = 0
    return cfg.freeze()


def _batch(rng, b=1, n=3, h=64, w=48):
    images = rng.rand(b, n, h, w, 3).astype(np.float32)
    pos = (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[:, -1] = False
    return images, pos, valid


def test_transpose_h_contract(rng):
    cfg = tiny_interformer_cfg()
    tph = get_model_builder("transpose_h")(cfg)
    x = rng.rand(3, 64, 48, 3).astype(np.float32)
    v = tph.init(jax.random.PRNGKey(0), x, None, train=False)
    feat, heat = tph.apply(v, x, None, train=False)
    assert feat.shape == (3, 16, 12, 16)
    assert heat.shape == (3, 5, 16, 12)


@pytest.mark.parametrize("upsample", ["deconv", "multiplex", "upconv"])
def test_interformer_forward(rng, upsample):
    cfg = tiny_interformer_cfg(upsample=upsample)
    model = get_model_builder("interformer")(cfg)
    images, pos, valid = _batch(rng)
    v = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    out = model.apply(v, images, pos, valid, train=False)
    assert out["multi"].shape == (1, 3, 5, 16, 12)
    assert out["single"].shape == (1, 3, 5, 16, 12)  # inter supervision on
    assert np.isfinite(np.asarray(out["multi"])).all()


@pytest.mark.parametrize("mode", ["conv", "res", "cat_vec", "sine"])
def test_interformer_multi_pos_modes(rng, mode):
    cfg = tiny_interformer_cfg(use_multi_pos=True, multi_pos_mode=mode)
    model = get_model_builder("interformer")(cfg)
    images, pos, valid = _batch(rng)
    v = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    out = model.apply(v, images, pos, valid, train=False)
    assert out["multi"].shape == (1, 3, 5, 16, 12)
    assert np.isfinite(np.asarray(out["multi"])).all()


@pytest.mark.slow
def test_interformer_padding_invariance(rng):
    cfg = tiny_interformer_cfg(use_multi_pos=True)
    model = get_model_builder("interformer")(cfg)
    images, pos, valid = _batch(rng, b=2, n=3)
    v = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    images2, pos2 = images.copy(), pos.copy()
    images2[:, -1] = 77.0
    pos2[:, -1] = 1.0
    o1 = np.asarray(model.apply(v, images, pos, valid, train=False)["multi"])
    o2 = np.asarray(model.apply(v, images2, pos2, valid, train=False)["multi"])
    np.testing.assert_allclose(o1[:, :2], o2[:, :2], atol=1e-5)


def test_interformer_bare_backbone(rng):
    cfg = tiny_interformer_cfg(singleformer=None)
    model = get_model_builder("interformer")(cfg)
    images, pos, valid = _batch(rng)
    v = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    out = model.apply(v, images, pos, valid, train=False)
    assert out["single"] is None
    assert out["multi"].shape == (1, 3, 5, 16, 12)


def test_unknown_attention_type_rejected():
    """Unknown ATTENTION_TYPE fails loudly at build time (the reference
    silently falls through to the window branch, attention.py:1054-1060)."""
    import pytest

    from i2rnet_tpu.presets import tiny_test_config
    from i2rnet_tpu.registry import get_model_builder

    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.NAME = "interformer"
    cfg.MODEL.SINGLEFORMER = "transpose_h"
    cfg.MODEL.ATTENTION_TYPE = "bogus"
    cfg = cfg.freeze()
    with pytest.raises(ValueError, match="ATTENTION_TYPE"):
        get_model_builder("interformer")(cfg)
