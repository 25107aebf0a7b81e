"""Checkpoint-format hardening drill: ingest the reference's ON-DISK formats.

VERDICT r3 item 6: the converter had only ever seen in-memory
``state_dict()``s. The reference actually writes (and its tools expect):

- ``checkpoint.pth`` via ``lib/utils/utils.py:105-110`` with the payload of
  ``tools/ddp_train.py:244-254``: DDP ``module.``-prefixed ``state_dict``,
  plain ``best_state_dict``, Adam ``optimizer`` state, epoch/step counters;
- ``model_best.pth``: the bare ``best_state_dict`` (utils.py:108-110);
- ``final_state.pth``: a bare module state_dict (ddp_train.py:257-261);
- mmcv-style blobs (``lib/models/hrformer.py:174-188``): ``{'state_dict':
  <module.-prefixed dict>, 'meta': ...}``.

Each file is written with the reference's OWN ``save_checkpoint`` (or torch
.save for the bare/mmcv forms), then round-tripped through
``convert_torch_checkpoint`` and pinned to the source torch model by a full
forward, for all three first-stage families.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _ddp_prefixed(sd):
    return {f"module.{k}": v for k, v in sd.items()}


def _write_reference_checkpoints(tmpdir, tmodel, model_name):
    """Write every on-disk form the reference produces for ``tmodel``."""
    from tests.ref_harness import install_reference_stubs
    install_reference_stubs()
    from utils.utils import save_checkpoint  # the reference's own writer

    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    # one real step so the optimizer payload carries exp_avg/exp_avg_sq
    loss = sum(p.sum() for p in tmodel.parameters() if p.requires_grad)
    loss.backward()
    opt.step()

    sd = tmodel.state_dict()
    save_checkpoint({
        "epoch": 7,
        "model": model_name,
        "state_dict": _ddp_prefixed(sd),
        "best_state_dict": sd,
        "perf": 0.5,
        "optimizer": opt.state_dict(),
        "train_global_steps": 1234,
        "valid_global_steps": 7,
    }, True, str(tmpdir))
    torch.save(sd, os.path.join(str(tmpdir), "final_state.pth"))
    torch.save({"state_dict": _ddp_prefixed(sd), "meta": {"epoch": 7}},
               os.path.join(str(tmpdir), "mmcv_style.pth"))
    return ["checkpoint.pth", "model_best.pth", "final_state.pth",
            "mmcv_style.pth"]


def _forward_pin(cfg, tmodel, variables, rng):
    """Full forward through our model with converted weights == torch."""
    import jax  # noqa: F401

    from i2rnet_tpu.registry import get_model_builder

    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    b, n = 1, 2
    w, h = cfg.MODEL.IMAGE_SIZE
    images = rng.rand(b, n, h, w, 3).astype(np.float32)
    pos = (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32)
    valid = np.ones((b, n), bool)
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        images, pos, valid, train=False)
    ours = np.asarray(out["multi"] if isinstance(out, dict) else out)

    tmodel.eval()
    fi = images.reshape(b * n, h, w, 3).transpose(0, 3, 1, 2)
    fp = pos.reshape(b * n, h, w, 1).transpose(0, 3, 1, 2)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(fi.copy()),
                        torch.from_numpy(fp.copy()), [n] * b)
    theirs = (theirs["multi"] if isinstance(theirs, dict) else theirs).numpy()
    np.testing.assert_allclose(ours.reshape(theirs.shape), theirs,
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("family", ["pure_multi", "tph_interformer",
                                    "hrformer_stage"])
def test_checkpoint_file_roundtrip(family, tmp_path, rng):
    from tests.ref_harness import install_reference_stubs
    install_reference_stubs()

    from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint

    if family == "pure_multi":
        from tests.test_torch_parity import tiny_cfg
        cfg = tiny_cfg()
        from models import interformer_pureMulti as mod
        torch.manual_seed(11)
        tmodel = mod.get_pose_net(cfg, is_train=False)
    elif family == "tph_interformer":
        from tests.test_interformer import tiny_interformer_cfg
        cfg = tiny_interformer_cfg().clone()
        cfg.MODEL.INIT_WEIGHTS = False
        cfg = cfg.freeze()
        from models import interformer as mod
        torch.manual_seed(12)
        tmodel = mod.get_pose_net(cfg, is_train=False)
    else:
        # HRFormer first stage standalone (the family whose real blobs are
        # mmcv-style); pin via its (feat, heat) forward instead
        from tests.test_hrformer import TINY_ARCH  # noqa: F401
        cfg = None

    if family == "hrformer_stage":
        _hrformer_case(tmp_path, rng)
        return

    files = _write_reference_checkpoints(tmp_path, tmodel, cfg.MODEL.NAME)
    for fn in files:
        variables = convert_torch_checkpoint(str(tmp_path / fn), cfg)
        _forward_pin(cfg, tmodel, variables, rng)


def _hrformer_case(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from i2rnet_tpu.convert.torch_import import (convert_state_dict,
                                                 load_torch_state_dict)
    from i2rnet_tpu.models.hrformer import HRFormer
    from tests.test_hrformer import TINY_ARCH
    from tests.test_torch_parity import _hrformer_tiny_ref

    tmodel = _hrformer_tiny_ref(seed=13)
    files = _write_reference_checkpoints(tmp_path, tmodel, "hrformer")
    x = rng.rand(2, 64, 48, 3).astype(np.float32)
    with torch.no_grad():
        tmodel.eval()
        t_feat = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy()))
    t_heat = (t_feat[1] if isinstance(t_feat, (tuple, list)) else t_feat)
    model = HRFormer(arch=TINY_ARCH, num_joints=5, dtype=jnp.float32)
    for fn in files:
        sd = load_torch_state_dict(str(tmp_path / fn))
        variables, unmatched = convert_state_dict(sd, "hrformer")
        assert not unmatched, unmatched[:8]
        _, heat = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, x, train=False)
        np.testing.assert_allclose(
            np.asarray(heat), t_heat.numpy() if hasattr(t_heat, "numpy")
            else t_heat, rtol=1e-3, atol=1e-4)
