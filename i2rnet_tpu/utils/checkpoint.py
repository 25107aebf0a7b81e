"""Orbax checkpointing with the reference's logical checkpoint contents.

Reference contract (``tools/ddp_train.py:244-263`` + ``lib/utils/utils.py:
105-110``): every epoch write ``{epoch, model, state_dict, best_state_dict,
perf, optimizer, train/valid_global_steps}``; keep ``model_best`` on best AP
and ``final_state`` at the end; AUTO_RESUME restores model/optimizer/epoch/
step counters from the newest checkpoint.
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def _host_numpy(tree):
    """Detach a pytree to host numpy. Replicated leaves convert directly;
    sharded leaves (e.g. tensor-parallel params) are all-gathered first —
    ``np.asarray`` would raise on non-fully-addressable arrays in
    multi-process runs. Makes the written checkpoint topology-portable."""
    import jax

    def to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_replicated:
            if x.is_fully_addressable:
                return np.asarray(x)
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(to_host, tree)


def save_checkpoint(output_dir: str, epoch: int, state, perf: float,
                    is_best: bool, model_name: str = "",
                    train_global_steps: int = 0, valid_global_steps: int = 0,
                    keep: int = 3):
    """Write checkpoint/epoch_{N}; update best/ when is_best.

    Multi-host: EVERY process must call this (orbax synchronizes processes
    internally and has the primary host write the data) with the same shared
    path — the collective analog of the reference's rank-0 checkpointing
    (``tools/ddp_train.py:229-254``). Only process 0 prunes old epochs.
    """
    import jax

    out = Path(output_dir)
    payload = {
        "epoch": epoch,
        "perf": float(perf),
        "params": _host_numpy(state.params),
        "batch_stats": _host_numpy(state.batch_stats),
        "opt_state": _host_numpy(state.opt_state),
        "step": int(state.step),
        "meta": {
            "model": model_name,
            "train_global_steps": train_global_steps,
            "valid_global_steps": valid_global_steps,
        },
    }
    ck = _ckptr()
    path = out / "checkpoint" / f"epoch_{epoch}"
    ck.save(os.fspath(path.resolve()), payload, force=True)
    if is_best:
        ck.save(os.fspath((out / "model_best").resolve()),
                {"params": _host_numpy(state.params),
                 "batch_stats": _host_numpy(state.batch_stats)},
                force=True)
    # prune old epochs (process 0 only: plain fs ops, no orbax barrier)
    if jax.process_index() == 0:
        all_epochs = sorted(_epochs(out))
        for e in all_epochs[:-keep]:
            shutil.rmtree(out / "checkpoint" / f"epoch_{e}", ignore_errors=True)


def _epochs(out: Path):
    d = out / "checkpoint"
    if not d.exists():
        return []
    eps = []
    for p in d.iterdir():
        m = re.fullmatch(r"epoch_(\d+)", p.name)
        if m:
            eps.append(int(m.group(1)))
    return eps


def latest_checkpoint(output_dir: str) -> Optional[str]:
    eps = _epochs(Path(output_dir))
    if not eps:
        return None
    return os.fspath((Path(output_dir) / "checkpoint" / f"epoch_{max(eps)}").resolve())


def _np_restore_args(tree):
    """RestoreArgs forcing arrays back as host numpy, so checkpoints restore
    on ANY device topology (a job trained on an 8-chip mesh must evaluate on
    1 chip; orbax otherwise pins leaves to the saved sharding)."""
    import jax

    def arg(leaf):
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            return ocp.RestoreArgs(restore_type=np.ndarray)
        return ocp.RestoreArgs()
    return jax.tree_util.tree_map(arg, tree)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Restore a checkpoint payload (optionally structured like ``target``).

    Arrays come back as host numpy (topology-portable); callers device_put
    with their own shardings.
    """
    ck = _ckptr()
    p = os.fspath(Path(path).resolve())
    if target is not None:
        return ck.restore(p, item=target, restore_args=_np_restore_args(target))
    meta = ck.metadata(p)
    tree = getattr(meta, "item_metadata", meta)
    return ck.restore(p, restore_args=_np_restore_args(tree))


def save_final_state(output_dir: str, state):
    _ckptr().save(os.fspath((Path(output_dir) / "final_state").resolve()),
                  {"params": _host_numpy(state.params),
                   "batch_stats": _host_numpy(state.batch_stats)},
                  force=True)


def load_variables(path: str):
    """Load {'params', 'batch_stats'} for inference (model_best/final_state)."""
    payload = load_checkpoint(path)
    out = {"params": payload["params"]}
    if payload.get("batch_stats") is not None:
        out["batch_stats"] = payload["batch_stats"]
    return out
