"""Pretrained / first-stage checkpoint loading into the TRAINING path.

Covers the reference two-stage recipe (load intra checkpoint, optionally
freeze — ``lib/models/transpose_h.py:691-706``) and filtered backbone init
(``lib/models/interformer_pureMulti.py:780-820``): a real reference torch
state dict is saved to disk, routed through the converter by
``core.pretrained.load_pretrained``, and two train steps verify the frozen
first stage stays bit-identical while the inter stage moves.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_torch_parity import _install_stubs  # noqa: E402

from i2rnet_tpu.core.pretrained import (frozen_predicate_for_cfg,  # noqa: E402
                                        load_pretrained, merge_variables)

pytestmark = pytest.mark.slow


def test_merge_variables_semantics():
    dst = {"a": {"w": np.zeros((2, 2), np.float32)}, "b": np.zeros(3, np.float32)}
    src = {"a": {"w": np.ones((2, 2)), "extra": np.ones(1)}, "c": np.ones(4)}
    n, skipped = merge_variables(dst, src)
    assert n == 1
    assert sorted(skipped) == ["a/extra", "c"]
    np.testing.assert_array_equal(dst["a"]["w"], np.ones((2, 2)))
    # shape mismatch raises (torch load_state_dict size-mismatch behavior)
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_variables(dst, {"b": np.ones(5)})


def _two_stage_cfg(tmp_path, fix=True):
    from i2rnet_tpu.presets import tiny_test_config
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.NAME = "interformer"
    cfg.MODEL.SINGLEFORMER = "transpose_h"
    cfg.MODEL.ENCODER_LAYERS = 1
    cfg.MODEL.ENCODER_MULTI_LAYERS = 1
    cfg.MODEL.UPSAMPLE_TYPE = "deconv"
    cfg.MODEL.USE_MULTI_POS = False
    cfg.MODEL.POS_EMBEDDING = "sine"
    cfg.MODEL.INTER_SUPERVISION = True
    cfg.MODEL.SINGLEFORMER_FIX = fix
    return cfg


def _save_ref_transpose_h(cfg, path):
    """Instantiate the actual reference TransPose-H and save its state dict
    (an 'intra checkpoint': includes deconv params our two-stage model lacks,
    exercising strict=False)."""
    _install_stubs()
    from models import transpose_h as ref_tph
    torch.manual_seed(11)
    tm = ref_tph.get_pose_net(cfg, is_train=False, pretrained_path="",
                              is_end2end=False)
    torch.save(tm.state_dict(), path)
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def _tiny_batch(rng, b=2, n=2, k=5):
    return {
        "images": rng.rand(b, n, 64, 48, 3).astype(np.float32),
        "pos_masks": (rng.rand(b, n, 64, 48, 1) > 0.5).astype(np.float32),
        "target": rng.rand(b, n, k, 16, 12).astype(np.float32),
        "target_weight": np.ones((b, n, k), np.float32),
        "person_valid": np.ones((b, n), bool),
    }


def test_two_stage_loads_and_freezes_first_stage(tmp_path, rng):
    """The VERDICT item-1 acceptance test: converter-loaded first stage is
    bit-frozen under SINGLEFORMER_FIX while the inter stage trains."""
    import jax

    from i2rnet_tpu.convert.torch_import import convert_state_dict
    from i2rnet_tpu.core.train import make_train_step
    from i2rnet_tpu.core.train_state import create_train_state, make_optimizer
    from i2rnet_tpu.registry import get_model_builder

    cfg = _two_stage_cfg(tmp_path, fix=True)
    pth = str(tmp_path / "intra.pth")
    sd = _save_ref_transpose_h(cfg, pth)
    cfg.MODEL.SINGLE_MODEL = pth
    cfg = cfg.freeze()

    model = get_model_builder("interformer")(cfg, use_pallas=False)
    batch = _tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"],
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = load_pretrained(cfg, variables)

    # loaded values really come from the torch checkpoint
    expected, _ = convert_state_dict(sd, "transpose_h")
    got = variables["params"]["singleformer"]["final_layer"]["kernel"]
    np.testing.assert_array_equal(
        got, expected["params"]["final_layer"]["kernel"])
    loaded_single = jax.tree_util.tree_map(
        np.array, variables["params"]["singleformer"])

    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(model, variables, tx,
                               frozen_predicate=frozen_predicate_for_cfg(cfg))
    step = make_train_step(model, tx, donate=False)
    key = jax.random.PRNGKey(1)
    multi_before = np.array(
        state.params["multi_encoder"]["layer0"]["linear1"]["kernel"])
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, _metrics = step(state, batch, sub)

    # frozen first stage: bit-identical to what was loaded
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.params["singleformer"], loaded_single)
    # inter stage moved
    multi_after = np.asarray(
        state.params["multi_encoder"]["layer0"]["linear1"]["kernel"])
    assert np.abs(multi_after - multi_before).max() > 0


def test_two_stage_unfrozen_first_stage_trains(tmp_path, rng):
    import jax

    from i2rnet_tpu.core.train import make_train_step
    from i2rnet_tpu.core.train_state import create_train_state, make_optimizer
    from i2rnet_tpu.registry import get_model_builder

    cfg = _two_stage_cfg(tmp_path, fix=False)
    pth = str(tmp_path / "intra.pth")
    _save_ref_transpose_h(cfg, pth)
    cfg.MODEL.SINGLE_MODEL = pth
    cfg = cfg.freeze()
    assert frozen_predicate_for_cfg(cfg) is None

    model = get_model_builder("interformer")(cfg, use_pallas=False)
    batch = _tiny_batch(rng)
    import jax as _jax
    variables = model.init(_jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"],
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = load_pretrained(cfg, variables)
    before = np.array(variables["params"]["singleformer"]["reduce"]["kernel"])

    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    after = np.asarray(state.params["singleformer"]["reduce"]["kernel"])
    assert np.abs(after - before).max() > 0


def test_missing_pretrained_file_raises(tmp_path):
    cfg = _two_stage_cfg(tmp_path)
    cfg.MODEL.SINGLE_MODEL = str(tmp_path / "nope.pth")
    cfg = cfg.freeze()
    with pytest.raises(ValueError, match="does not exist"):
        load_pretrained(cfg, {"params": {}, "batch_stats": {}})


def test_orbax_first_stage_checkpoint_loads(tmp_path, rng):
    """A first stage trained in THIS framework (Orbax model_best layout)
    seeds a two-stage run without any torch round-trip."""
    import jax
    import orbax.checkpoint as ocp

    from i2rnet_tpu.registry import get_model_builder

    cfg = _two_stage_cfg(tmp_path, fix=True)
    cfg.MODEL.SINGLE_MODEL = ""
    frozen = cfg.clone().freeze()

    model = get_model_builder("interformer")(frozen, use_pallas=False)
    batch = _tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(3), batch["images"],
                           batch["pos_masks"], batch["person_valid"],
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    # fabricate a "trained" singleformer: perturb and save as model_best
    single = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 0.25,
        {"params": variables["params"]["singleformer"],
         "batch_stats": variables["batch_stats"].get("singleformer", {})})
    ckpt_dir = tmp_path / "model_best"
    ocp.PyTreeCheckpointer().save(str(ckpt_dir.resolve()), single)

    cfg.MODEL.SINGLE_MODEL = str(ckpt_dir)
    cfg = cfg.freeze()
    out = load_pretrained(cfg, variables)
    np.testing.assert_allclose(
        np.asarray(out["params"]["singleformer"]["reduce"]["kernel"]),
        np.asarray(single["params"]["reduce"]["kernel"]))


def test_pure_multi_filtered_backbone_init(tmp_path, rng):
    """MODEL.PRETRAINED filtered-prefix init for the single-model variant:
    matching trunk keys load, unknown keys are skipped (not fatal)."""
    import jax

    from i2rnet_tpu.presets import tiny_test_config
    from i2rnet_tpu.registry import get_model_builder

    _install_stubs()
    from models import interformer_pureMulti as ref_pm

    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.INIT_WEIGHTS = True
    torch.manual_seed(4)
    ref_cfg = cfg.clone()
    ref_cfg.MODEL.INIT_WEIGHTS = False
    tm = ref_pm.get_pose_net(ref_cfg.freeze(), is_train=False)
    sd = tm.state_dict()
    sd["classifier.weight"] = torch.zeros(10, 8)  # ImageNet-head style extra
    pth = str(tmp_path / "imagenet.pth")
    torch.save(sd, pth)

    cfg.MODEL.PRETRAINED = pth
    cfg = cfg.freeze()
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    batch = _tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(5), batch["images"],
                           batch["pos_masks"], batch["person_valid"],
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    out = load_pretrained(cfg, variables)
    got = np.asarray(out["params"]["trunk"]["stem"]["conv1"]["conv"]["kernel"])
    exp = sd["conv1.weight"].detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, exp)


def test_e2e_backbone_init_into_singleformer(tmp_path, rng):
    """END2END two-stage: MODEL.PRETRAINED (ImageNet-style backbone) loads
    into the singleformer subtree, SINGLE_MODEL ignored
    (reference transpose_h.py:695-698)."""
    import jax

    from i2rnet_tpu.registry import get_model_builder

    cfg = _two_stage_cfg(tmp_path, fix=False)
    cfg.MODEL.END2END = True
    pth = str(tmp_path / "backbone.pth")
    sd = _save_ref_transpose_h(cfg, pth)
    cfg.MODEL.PRETRAINED = pth
    cfg = cfg.freeze()

    model = get_model_builder("interformer")(cfg, use_pallas=False)
    batch = _tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["pos_masks"], batch["person_valid"],
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    out = load_pretrained(cfg, variables)
    got = out["params"]["singleformer"]["reduce"]["kernel"]
    exp = sd["reduce.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), exp)


def test_hrformer_intra_checkpoint_loads(tmp_path, rng):
    """Two-stage with SINGLEFORMER=hrformer: a reference hrformer pose
    checkpoint (backbone.* + keypoint_head.*) loads through the converter
    into the singleformer subtree."""
    import jax

    from i2rnet_tpu.models.hrformer import HRFormer
    from i2rnet_tpu.models.interformer import InterFormer
    from tests.test_hrformer import TINY_ARCH

    _install_stubs()
    from models import hrformer as ref_hrf

    ref_extra = {"drop_path_rate": TINY_ARCH["drop_path_rate"],
                 "stage1": dict(num_modules=1, num_branches=1,
                                block="BOTTLENECK", num_blocks=(2,),
                                num_channels=(64,), num_heads=[2],
                                num_mlp_ratios=[4])}
    for s in ("stage2", "stage3", "stage4"):
        c = dict(TINY_ARCH[s])
        c["block"] = "TRANSFORMER_BLOCK"
        ref_extra[s] = c
    torch.manual_seed(21)
    tmodel = ref_hrf.HRFormer(ref_extra, head_in_channel=16,
                              head_out_channel=5, num_deconv_layers=0)
    pth = str(tmp_path / "hrf.pth")
    torch.save(tmodel.state_dict(), pth)

    single = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=None)
    model = InterFormer(extra={"NUM_DECONV_FILTERS": [16],
                               "NUM_DECONV_KERNELS": [4],
                               "DECONV_WITH_BIAS": False},
                        singleformer=single, num_joints=5, d_model=16,
                        dim_feedforward=32, n_head=2, encoder_multi_layers=1,
                        trans_size=(4, 3), heatmap_size=(12, 16),
                        use_multi_pos=False, use_pallas=False)
    b, n = 1, 2
    images = rng.rand(b, n, 64, 48, 3).astype(np.float32)
    pos = np.zeros((b, n, 64, 48, 1), np.float32)
    valid = np.ones((b, n), bool)
    variables = model.init(jax.random.PRNGKey(0), images, pos, valid,
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    from i2rnet_tpu.core.pretrained import _graft, _load_source
    src = _load_source(pth, "hrformer")
    _graft(variables, src, subtree="singleformer", what="hrformer intra test")
    got = variables["params"]["singleformer"]["final_layer"]["kernel"]
    exp = tmodel.state_dict()["keypoint_head.final_layer.weight"].numpy()
    np.testing.assert_allclose(np.asarray(got), exp.transpose(2, 3, 1, 0))
