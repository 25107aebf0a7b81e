"""One-step TRAINING parity against the ACTUAL torch reference.

VERDICT r3 item 2: forward parity says nothing about BN momentum/eps, loss
normalization, optimizer hyperparameters, or schedule off-by-ones — those
surface only as AP drift after thousands of steps. This pins ONE optimizer
step end to end: identical weights + identical f32 batch through

- reference ``train()`` loss semantics (``lib/core/function.py:52-69``:
  ``JointsMSELoss`` with the length list; dict outputs weighted by
  MODEL.LOSS_WEIGHTS),
- reference Adam (``lib/utils/utils.py:96-101``: ``optim.Adam(params, lr)``
  — NO weight decay),
- one per-epoch CosineAnnealingLR step (``tools/ddp_train.py:217-218``),

vs our ``make_train_step`` + ``make_optimizer``, asserting loss, every
parameter gradient, every post-step parameter, and every BN running stat.

Dropout is disabled on BOTH sides (rates zeroed — cross-framework RNG
streams cannot be matched); everything else runs exactly the released train
path. Gradients/params cross frameworks through the weight converter: its
name mapping + transposes are element permutations, so applying it to a
dict of gradients yields gradients in our layout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _zero_torch_dropout(model):
    import torch.nn as nn
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
        if isinstance(m, nn.MultiheadAttention):
            m.dropout = 0.0


@pytest.fixture
def no_flax_dropout(monkeypatch):
    from flax import linen as fnn

    from i2rnet_tpu.ops import attention as att
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=True, rng=None: x)
    # attention-weight dropout is applied inside the attention op (torch
    # semantics), not via nn.Dropout — zero it there too
    real = att.masked_mhsa_xla
    monkeypatch.setattr(
        att, "masked_mhsa_xla",
        lambda q, k, v, h, key_padding_mask=None, precision=None,
        dropout_rate=0.0, dropout_rng=None:
        real(q, k, v, h, key_padding_mask, precision))


def _batch(cfg, b=2, n=3, seed=5, ragged=False):
    k = cfg.MODEL.NUM_JOINTS
    w, h = cfg.MODEL.IMAGE_SIZE
    hw, hh = cfg.MODEL.HEATMAP_SIZE
    rng = np.random.RandomState(seed)
    valid = np.ones((b, n), bool)
    if ragged:
        valid[-1, -1] = False
    batch = {
        "images": rng.rand(b, n, h, w, 3).astype(np.float32),
        "pos_masks": (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32),
        "person_valid": valid,
        "target": rng.rand(b, n, k, hh, hw).astype(np.float32),
        "target_weight": (rng.rand(b, n, k) > 0.2).astype(np.float32),
    }
    # zero padded slots like the data pipeline does
    batch["images"] *= valid[..., None, None, None]
    batch["pos_masks"] *= valid[..., None, None, None]
    batch["target"] *= valid[..., None, None, None]
    batch["target_weight"] *= valid[..., None]
    return batch


def _torch_one_step(cfg, tmodel, batch):
    """Reference train-step semantics on a [B,N] batch (valid slots only)."""
    from core.loss import JointsMSELoss

    b, n = batch["person_valid"].shape
    lengths = [int(batch["person_valid"][i].sum()) for i in range(b)]
    imgs, poss, tgts, tws = [], [], [], []
    for i in range(b):
        for j in range(n):
            if batch["person_valid"][i, j]:
                imgs.append(batch["images"][i, j].transpose(2, 0, 1))
                poss.append(batch["pos_masks"][i, j].transpose(2, 0, 1))
                tgts.append(batch["target"][i, j])
                tws.append(batch["target_weight"][i, j][:, None])
    inp = torch.from_numpy(np.stack(imgs).copy())
    pm = torch.from_numpy(np.stack(poss).copy())
    tg = torch.from_numpy(np.stack(tgts).copy())
    tw = torch.from_numpy(np.stack(tws).copy())

    crit = JointsMSELoss(use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT)
    opt = torch.optim.Adam(tmodel.parameters(), lr=cfg.TRAIN.LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, cfg.TRAIN.END_EPOCH, eta_min=cfg.TRAIN.LR_END, last_epoch=-1)

    tmodel.train()
    outputs = tmodel(inp, pm, lengths)
    lw = cfg.MODEL.LOSS_WEIGHTS
    if isinstance(outputs, dict):
        loss = (lw[0] * crit(outputs["single"], tg, tw, lengths)
                + lw[1] * crit(outputs["multi"], tg, tw, lengths))
    else:
        loss = crit(outputs, tg, tw, lengths)
    opt.zero_grad()
    loss.backward()
    grads = {k: (p.grad.detach().numpy().copy() if p.grad is not None
                 else np.zeros_like(p.detach().numpy()))
             for k, p in tmodel.named_parameters()}
    opt.step()
    lr0 = sched.get_last_lr()[0]
    sched.step()  # one epoch boundary, ddp_train.py:217-218
    lr1 = sched.get_last_lr()[0]
    return float(loss.item()), grads, lr0, lr1


def _ours_one_step(cfg, model, variables, batch, frozen_predicate=None):
    import jax

    from i2rnet_tpu.core.train import make_train_step
    from i2rnet_tpu.core.train_state import create_train_state, make_optimizer

    tx, sched = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(model, variables, tx)
    step = make_train_step(
        model, tx, loss_weights=cfg.MODEL.LOSS_WEIGHTS,
        use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT, donate=False,
        frozen_predicate=frozen_predicate)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    return (float(metrics["loss"]), new_state,
            float(sched(0)), float(sched(1)))


def _convert_tree(sd_like, model_name):
    """Run an arbitrary torch-keyed dict (grads, updated params) through the
    weight converter's name mapping + layout permutations."""
    from i2rnet_tpu.convert.torch_import import convert_state_dict
    variables, _ = convert_state_dict(sd_like, model_name)
    return variables


def _assert_tree_close(ours, theirs_converted, rtol, atol, what):
    import jax
    ka = jax.tree_util.tree_leaves_with_path(ours)
    kb = jax.tree_util.tree_leaves_with_path(theirs_converted)
    assert len(ka) == len(kb)
    for (pa, a), (pb, b) in zip(ka, kb):
        assert pa == pb, (pa, pb)
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=rtol, atol=atol, err_msg=f"{what}: {jax.tree_util.keystr(pa)}")


def _full_sd(tmodel):
    return {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}


def _run_case(cfg, ref_module_name, conv_name, ragged=False,
              frozen_predicate=None, freeze_torch=None, grad_atol=3e-4):
    """Shared skeleton: build ref model, one torch step, one our step,
    compare loss / grads / post-step params / BN stats / LR schedule.

    ``grad_atol``: stem-conv gradients accumulate f32 summation-order
    noise proportional to the number of backward paths reaching them;
    configs with more heads/branches (extra encoder layers, DOMAIN_TRANS)
    sit marginally above the default 3e-4 on a couple of elements of
    |g|~1e-2 kernels while every downstream leaf is clean — pass a
    slightly wider bound there rather than masking real mismatches."""
    import importlib

    from tests.ref_harness import install_reference_stubs
    install_reference_stubs()
    ref_mod = importlib.import_module(f"models.{ref_module_name}")

    from i2rnet_tpu.registry import get_model_builder

    torch.manual_seed(3)
    tmodel = ref_mod.get_pose_net(cfg, is_train=False)
    _zero_torch_dropout(tmodel)
    if freeze_torch is not None:
        freeze_torch(tmodel)  # reference transpose_h.py:705-706 semantics

    variables = _convert_tree(_full_sd(tmodel), conv_name)
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)

    batch = _batch(cfg, ragged=ragged)
    our_grads = _ours_grads(cfg, model, variables, batch,
                            frozen_predicate=frozen_predicate)
    t_loss, t_grads, t_lr0, t_lr1 = _torch_one_step(cfg, tmodel, batch)
    o_loss, new_state, o_lr0, o_lr1 = _ours_one_step(
        cfg, model, variables, batch, frozen_predicate=frozen_predicate)

    # loss
    np.testing.assert_allclose(o_loss, t_loss, rtol=2e-4,
                               err_msg="one-step loss")
    # per-epoch cosine LR: start and after one epoch step
    np.testing.assert_allclose(o_lr0, t_lr0, rtol=1e-6)
    np.testing.assert_allclose(o_lr1, t_lr1, rtol=1e-6)

    # gradients (convert the torch grad dict through the SAME converter;
    # buffers -> current values so batch_stats conversion stays well-formed).
    # f32 accumulation-order noise reaches ~5e-5 abs at the stem convs.
    grad_sd = dict(_full_sd(tmodel))
    for k, g in t_grads.items():
        grad_sd[k] = g
    g_conv = _convert_tree(grad_sd, conv_name)
    _assert_tree_close(our_grads, g_conv["params"], 1e-3, grad_atol, "grad")

    # Post-step parameters. At t=1 Adam's update is lr*g/(|g|+eps): for
    # elements whose true gradient is below the cross-framework noise floor
    # the SIGN of g is noise, so the update can differ by up to 2*lr. Where
    # the gradient is clearly resolved, require the tight bound; elsewhere
    # only the 2*lr sign-flip bound — a real lr/beta/eps mismatch would
    # violate the tight bound on ALL resolved elements.
    import jax
    lr = float(cfg.TRAIN.LR)
    p_conv = _convert_tree(_full_sd(tmodel), conv_name)
    ka = jax.tree_util.tree_leaves_with_path(new_state.params)
    kb = jax.tree_util.tree_leaves_with_path(p_conv["params"])
    kg = jax.tree_util.tree_leaves_with_path(our_grads)
    assert len(ka) == len(kb) == len(kg)
    for (pa, a), (_, b), (_, g) in zip(ka, kb, kg):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        g = np.asarray(g, np.float64)
        d = np.abs(a - b)
        resolved = np.abs(g) > 1e-3
        name = jax.tree_util.keystr(pa)
        assert d[resolved].max(initial=0.0) < 3e-5 + 1e-3 * np.abs(
            b[resolved]).max(initial=0.0), f"post-step param {name}"
        assert d.max() < 2.2 * lr, f"post-step param (sign bound) {name}"
    # BN running stats after one train-mode forward
    _assert_tree_close(new_state.batch_stats, p_conv["batch_stats"],
                       1e-4, 1e-6, "batch_stats")


def _ours_grads(cfg, model, variables, batch, frozen_predicate=None):
    import jax

    from i2rnet_tpu.core.train import compute_losses

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["images"], batch["pos_masks"], batch["person_valid"],
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        loss, _ = compute_losses(out, batch, cfg.MODEL.LOSS_WEIGHTS,
                                 cfg.LOSS.USE_TARGET_WEIGHT)
        return loss

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    if frozen_predicate is not None:
        g = jax.tree_util.tree_map_with_path(
            lambda path, x: np.zeros_like(x) if frozen_predicate(path) else x,
            g)
    return g


@pytest.mark.parity_core
def test_train_step_parity_vanilla(no_flax_dropout):
    """interformer_pureMulti: tensor output -> plain JointsMSELoss path."""
    from tests.test_torch_parity import tiny_cfg
    cfg = tiny_cfg()
    _run_case(cfg, "interformer_pureMulti", "interformer_pureMulti")


def test_train_step_ragged_bn_semantics(no_flax_dropout):
    """Ragged batches and train-mode BN: the reference feeds its deconv+head
    the PADDED [bs*max(length)] grid (``interformer_pureMulti.py:771-776``),
    so its BN statistics depend on how much padding the collater happened to
    produce — a static-batching artifact. We keep BN masked to valid persons
    (documented deviation, ``models/pure_multi.py:90-92``). This test pins
    both sides of that trade:

    1. OUR ragged train loss is padding-invariant (same 5 persons at
       N_bucket 3 vs 4 -> identical loss) — the property the reference
       lacks;
    2. the deviation vs the actual reference is a small BN-statistics-only
       effect (loss within 5%), not a structural divergence.
    """
    import importlib

    import jax

    from tests.ref_harness import install_reference_stubs
    from tests.test_torch_parity import tiny_cfg

    install_reference_stubs()
    cfg = tiny_cfg()
    ref_mod = importlib.import_module("models.interformer_pureMulti")

    from i2rnet_tpu.core.train import compute_losses
    from i2rnet_tpu.registry import get_model_builder

    torch.manual_seed(3)
    tmodel = ref_mod.get_pose_net(cfg, is_train=False)
    _zero_torch_dropout(tmodel)
    variables = _convert_tree(_full_sd(tmodel), "interformer_pureMulti")
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)

    def our_loss(batch):
        out, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            batch["images"], batch["pos_masks"], batch["person_valid"],
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        loss, _ = compute_losses(out, batch, cfg.MODEL.LOSS_WEIGHTS,
                                 cfg.LOSS.USE_TARGET_WEIGHT)
        return float(loss)

    b3 = _batch(cfg, b=2, n=3, ragged=True)   # lengths [3, 2]
    # the same 5 persons re-bucketed at N=4 (one more padded slot each row)
    b4 = {k: np.zeros((2, 4) + np.asarray(v).shape[2:], np.asarray(v).dtype)
          for k, v in b3.items()}
    for k in b3:
        b4[k][:, :3] = b3[k]
    l3, l4 = our_loss(b3), our_loss(b4)
    np.testing.assert_allclose(l3, l4, rtol=1e-6,
                               err_msg="masked BN must be padding-invariant")

    t_loss, _, _, _ = _torch_one_step(cfg, tmodel, b3)
    assert abs(l3 - t_loss) / t_loss < 0.05, (l3, t_loss)


def _tph_cfg(fix: bool):
    from tests.test_interformer import tiny_interformer_cfg
    cfg = tiny_interformer_cfg().clone()
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.MODEL.INTER_SUPERVISION = True
    cfg.MODEL.SINGLEFORMER_FIX = fix
    return cfg.freeze()


@pytest.mark.parity_core
def test_train_step_parity_two_stage_unfrozen(no_flax_dropout):
    """interformer + TransPose-H, SINGLEFORMER_FIX=False: dict output ->
    weighted single+multi loss (function.py:52-57)."""
    cfg = _tph_cfg(fix=False)
    _run_case(cfg, "interformer", "interformer")


def test_train_step_parity_two_stage_frozen(no_flax_dropout):
    """SINGLEFORMER_FIX=True: first stage requires_grad_(False) (reference
    transpose_h.py:705-706) vs our frozen_predicate — frozen grads are
    zero, frozen params don't move, frozen-stage BN stats still update
    (train()-mode torch semantics; TPU.FROZEN_STAGE_EVAL_MODE off)."""
    from i2rnet_tpu.core.pretrained import frozen_predicate_for_cfg
    cfg = _tph_cfg(fix=True)
    pred = frozen_predicate_for_cfg(cfg)
    assert pred is not None

    def freeze_torch(tmodel):
        tmodel.singleformer.requires_grad_(False)

    _run_case(cfg, "interformer", "interformer", frozen_predicate=pred,
              freeze_torch=freeze_torch)




def test_train_step_parity_two_stage_hrformer(no_flax_dropout, monkeypatch):
    """interformer + HRFormer first stage (tiny HRT arch on both sides,
    drop_path 0): one optimizer step through the window-attention /
    MlpDWBN / multi-scale-fusion backward — the hardest model's training
    numerics pinned vs torch (the hrt golden family is eval-only).

    Arch substitution mirrors tests/test_golden_e2e.py hrt_two_stage: the
    reference's models.hrformer.get_pose_net hardcodes the HRFormer-B
    extra (hrformer.py:2487-2533), so the tiny arch goes through the same
    HRFormer wrapper the two-stage constructor eval()s
    (interformer.py:139-141); ours through build_hrformer(arch=...).
    """
    import functools

    from tests.ref_harness import install_reference_stubs
    install_reference_stubs()

    from tests.test_hrformer import TINY_ARCH

    from i2rnet_tpu.models.hrformer import build_hrformer
    from i2rnet_tpu.presets import tiny_test_config
    from i2rnet_tpu.registry import MODEL_REGISTRY

    arch = {**TINY_ARCH, "drop_path_rate": 0.0}
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.MODEL.NAME = "interformer"
    cfg.MODEL.SINGLEFORMER = "hrformer"
    cfg.MODEL.SINGLEFORMER_FIX = False
    cfg.MODEL.ENCODER_MULTI_LAYERS = 1
    cfg.MODEL.UPSAMPLE_TYPE = "deconv"
    cfg.MODEL.USE_MULTI_POS = False
    cfg.MODEL.POS_EMBEDDING = "sine"
    cfg.MODEL.INTER_SUPERVISION = True
    cfg = cfg.freeze()

    import models.hrformer as ref_hrf
    ref_extra = {"drop_path_rate": 0.0,
                 "stage1": dict(num_modules=1, num_branches=1,
                                block="BOTTLENECK", num_blocks=(2,),
                                num_channels=(64,), num_heads=[2],
                                num_mlp_ratios=[4])}
    for s in ("stage2", "stage3", "stage4"):
        c = dict(arch[s])
        c["block"] = "TRANSFORMER_BLOCK"
        ref_extra[s] = c
    monkeypatch.setattr(
        ref_hrf, "get_pose_net",
        lambda c, is_train, model_path, e2e: ref_hrf.HRFormer(
            ref_extra, 16, c.MODEL.NUM_JOINTS, 0))
    monkeypatch.setitem(MODEL_REGISTRY, "hrformer",
                        functools.partial(build_hrformer, arch=arch))

    _run_case(cfg, "interformer", "interformer")


def test_train_step_parity_two_stage_legacy(no_flax_dropout):
    """interformer_2stage (the released tph_192_p4_b4 recipe's NAME): one
    optimizer step through the legacy module's own encoder copies,
    pool_or_deconv upsampling and DOMAIN_TRANS residual pair — completes
    train-parity coverage of every released training recipe."""
    from tests.test_interformer import tiny_interformer_cfg
    cfg = tiny_interformer_cfg().clone()
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.MODEL.NAME = "interformer_2stage"
    cfg.MODEL.ENCODER_MULTI_LAYERS = 2
    cfg.MODEL.INTER_SUPERVISION = True
    cfg.MODEL.DOMAIN_TRANS = True
    cfg = cfg.freeze()
    # measured: 2 elements of one stem conv at 3.3e-4 (|g|max 1.2e-2),
    # every non-stem leaf clean — accumulation noise, see grad_atol doc
    _run_case(cfg, "interformer_2stage", "interformer_2stage",
              grad_atol=5e-4)
