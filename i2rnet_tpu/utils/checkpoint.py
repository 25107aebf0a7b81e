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

import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(output_dir: str, epoch: int, state, perf: float,
                    is_best: bool, model_name: str = "",
                    train_global_steps: int = 0, valid_global_steps: int = 0,
                    keep: int = 3):
    """Write checkpoint/epoch_{N}; update best/ when is_best."""
    out = Path(output_dir)
    payload = {
        "epoch": epoch,
        "perf": float(perf),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
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
                {"params": state.params, "batch_stats": state.batch_stats},
                force=True)
    # prune old epochs
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


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Restore a checkpoint payload (optionally structured like ``target``)."""
    ck = _ckptr()
    if target is not None:
        return ck.restore(os.fspath(Path(path).resolve()), item=target)
    return ck.restore(os.fspath(Path(path).resolve()))


def save_final_state(output_dir: str, state):
    _ckptr().save(os.fspath((Path(output_dir) / "final_state").resolve()),
                  {"params": state.params, "batch_stats": state.batch_stats},
                  force=True)


def load_variables(path: str):
    """Load {'params', 'batch_stats'} for inference (model_best/final_state)."""
    payload = load_checkpoint(path)
    out = {"params": payload["params"]}
    if payload.get("batch_stats") is not None:
        out["batch_stats"] = payload["batch_stats"]
    return out
