"""Pretrained / first-stage checkpoint loading for the training path.

TPU-native equivalent of the reference's factory-time weight loading:

* two-stage: load the full intra-stage checkpoint into the ``singleformer``
  subtree with strict=False semantics — deconv/final params present in the
  intra checkpoint but absent here are skipped, everything else must match
  (reference ``lib/models/transpose_h.py:691-706``,
  ``lib/models/hrformer.py:2487-2533``);
* end-to-end / single-model: filtered-by-prefix ImageNet backbone init —
  only names that exist in the target tree are grafted (reference
  ``lib/models/interformer_pureMulti.py:780-820``,
  ``lib/models/interformer_e2e.py:830-863``);
* freezing is handled separately by the optimizer mask
  (``core/train_state.create_train_state``); ``frozen_predicate_for_cfg``
  builds the mask for SINGLEFORMER_FIX / BACKBONE_FIX.

Sources may be reference ``.pth`` files (routed through the weight
converter) or Orbax checkpoint directories written by this framework
(``model_best`` / ``final_state`` layout), so a first stage trained *here*
can seed a two-stage run without ever touching torch.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def merge_variables(dst: Dict[str, Any], src: Dict[str, Any],
                    path: str = "") -> Tuple[int, List[str]]:
    """Graft ``src`` leaves into ``dst`` in place (strict=False semantics).

    Returns (n_loaded, skipped_names). Leaves in ``src`` with no counterpart
    in ``dst`` are skipped and reported; shape mismatches raise (torch
    ``load_state_dict`` errors on size mismatch even with strict=False).
    """
    loaded = 0
    skipped: List[str] = []
    for k, v in src.items():
        name = f"{path}/{k}" if path else str(k)
        if not isinstance(dst, dict) or k not in dst:
            skipped.append(name)
            continue
        if isinstance(v, dict):
            n, s = merge_variables(dst[k], v, name)
            loaded += n
            skipped += s
        else:
            cur = dst[k]
            v = np.asarray(v)
            if tuple(np.shape(cur)) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch for {name}: checkpoint {v.shape} vs "
                    f"model {tuple(np.shape(cur))}")
            dst[k] = v.astype(np.asarray(cur).dtype) if hasattr(cur, "dtype") else v
            loaded += 1
    return loaded, skipped


def _load_source(path: str, model_name: str) -> Dict[str, Any]:
    """Load a checkpoint as {'params':..., 'batch_stats':...}.

    ``.pth`` goes through the torch->flax converter for ``model_name``;
    a directory is treated as an Orbax checkpoint written by this framework
    (model_best / final_state payloads carry params+batch_stats directly,
    epoch checkpoints carry them under the training payload).
    """
    if os.path.isdir(path):
        from i2rnet_tpu.utils.checkpoint import load_checkpoint
        payload = load_checkpoint(path)
        if "params" not in payload:
            raise ValueError(f"Orbax checkpoint {path} has no 'params' tree")
        return {"params": payload["params"],
                "batch_stats": payload.get("batch_stats", {}) or {}}
    from i2rnet_tpu.convert.torch_import import (convert_state_dict,
                                                 load_torch_state_dict)
    sd = load_torch_state_dict(path)
    variables, unmatched = convert_state_dict(sd, model_name)
    if unmatched:
        logger.info("pretrained %s: %d source params not mapped (filtered "
                    "load, first: %s)", path, len(unmatched), unmatched[:5])
    return variables


def _graft(variables: Dict[str, Any], src: Dict[str, Any], subtree: str = "",
           what: str = "") -> None:
    for coll in ("params", "batch_stats"):
        dst = variables.get(coll)
        s = src.get(coll)
        if not s or dst is None:
            continue
        if subtree:
            if subtree not in dst:
                raise ValueError(f"model has no {coll}/{subtree} subtree")
            dst = dst[subtree]
        n, skipped = merge_variables(dst, s)
        logger.info("=> %s: loaded %d %s leaves%s%s", what, n, coll,
                    f" into {subtree}/" if subtree else "",
                    f", skipped {len(skipped)} (e.g. {skipped[:3]})" if skipped else "")


def load_pretrained(cfg, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Apply the reference's factory-time loading rules to freshly
    initialized ``variables`` (mutated in place; also returned).

    Dispatch matches the reference ``get_pose_net`` factories:
    * SINGLEFORMER set, not END2END -> load full intra checkpoint
      ``MODEL.SINGLE_MODEL`` into the singleformer subtree
      (``transpose_h.py:699-706``);
    * SINGLEFORMER set, END2END -> ImageNet backbone ``MODEL.PRETRAINED``
      into the singleformer subtree (``transpose_h.py:695-698``);
    * no SINGLEFORMER (pureMulti / e2e / bare transpose_h) -> INIT_WEIGHTS
      gate + ``MODEL.PRETRAINED`` filtered load at the root
      (``interformer_pureMulti.py:816-821``).

    A configured-but-missing file raises, matching the reference's
    "please download pre-trained models first!" error
    (``interformer_pureMulti.py:811-813``).
    """
    m = cfg.MODEL

    def _check(path, key):
        if path and not (os.path.isfile(path) or os.path.isdir(path)):
            raise ValueError(f"MODEL.{key} = {path!r} does not exist")

    if m.SINGLEFORMER:
        if not m.END2END and not m.SINGLE_MODEL:
            # the reference unconditionally torch.load()s the intra
            # checkpoint for two-stage training (transpose_h.py:699-703);
            # training from a random first stage is almost never intended
            logger.warning(
                "two-stage training without MODEL.SINGLE_MODEL: the %s "
                "first stage starts from RANDOM weights", m.SINGLEFORMER)
        if not m.END2END and m.SINGLE_MODEL:
            _check(m.SINGLE_MODEL, "SINGLE_MODEL")
            src = _load_source(m.SINGLE_MODEL, m.SINGLEFORMER)
            _graft(variables, src, subtree="singleformer",
                   what=f"two-stage intra checkpoint {m.SINGLE_MODEL}")
        elif m.END2END and m.PRETRAINED:
            _check(m.PRETRAINED, "PRETRAINED")
            src = _load_source(m.PRETRAINED, m.SINGLEFORMER)
            _graft(variables, src, subtree="singleformer",
                   what=f"e2e backbone init {m.PRETRAINED}")
    elif m.INIT_WEIGHTS and m.PRETRAINED:
        _check(m.PRETRAINED, "PRETRAINED")
        src = _load_source(m.PRETRAINED, m.NAME)
        _graft(variables, src, what=f"backbone init {m.PRETRAINED}")
    return variables


def frozen_predicate_for_cfg(cfg):
    """Optimizer-mask predicate implementing SINGLEFORMER_FIX (freeze the
    whole first stage, ``transpose_h.py:705-706``) and BACKBONE_FIX (freeze
    the loaded backbone trunk, ``interformer_pureMulti.py:806-807``).
    Returns None when nothing is frozen."""
    m = cfg.MODEL
    freeze_single = bool(m.SINGLEFORMER_FIX and m.SINGLEFORMER)
    freeze_backbone = bool(m.BACKBONE_FIX)
    if not (freeze_single or freeze_backbone):
        return None

    def pred(path):
        if not path:
            return False
        head = getattr(path[0], "key", "")
        if freeze_single and head == "singleformer":
            return True
        if freeze_backbone:
            if head in ("trunk", "backbone"):
                return True
            if head == "singleformer" and len(path) > 1 and \
                    getattr(path[1], "key", "") in ("trunk", "backbone"):
                return True
        return False

    return pred
