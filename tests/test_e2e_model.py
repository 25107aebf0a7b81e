"""Tests for the end-to-end InterFormer variants."""

import jax
import numpy as np
import pytest

from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.registry import get_model_builder


@pytest.mark.parametrize("name", ["interformer_e2e", "interformer_e2e_new"])
def test_e2e_forward(rng, name):
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.NAME = name
    cfg.MODEL.ENCODER_SINGLE_LAYERS = 1
    cfg.MODEL.ENCODER_MUTI_LAYERS = 1
    cfg.MODEL.SINGLE_POS_EMBEDDING = "sine"
    cfg.MODEL.DOMAIN_TRANS = name == "interformer_e2e_new"
    cfg.MODEL.HRNET_RES_LAYER = 0
    cfg = cfg.freeze()
    model = get_model_builder(name)(cfg)

    images = rng.rand(1, 2, 64, 48, 3).astype(np.float32)
    pos = (rng.rand(1, 2, 64, 48, 1) > 0.5).astype(np.float32)
    valid = np.array([[True, False]])
    v = model.init(jax.random.PRNGKey(0), images, pos, valid, train=False)
    out = model.apply(v, images, pos, valid, train=False)
    assert out["multi"].shape == (1, 2, 5, 16, 12)
    assert out["single"].shape == (1, 2, 5, 16, 12)
    assert np.isfinite(np.asarray(out["multi"])).all()
    assert np.all(np.asarray(out["multi"])[0, 1] == 0)
