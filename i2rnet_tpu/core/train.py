"""Jitted training / eval step builders.

The TPU-native core engine replacing reference ``lib/core/function.py:30-102``
(``train``) — the per-step host loop (loss on device, PCK on CPU numpy,
DDP allreduce) becomes ONE jitted function: forward (masked static shapes) +
masked MSE + grads + optimizer, with the cross-chip gradient all-reduce
inserted by XLA from the batch sharding.
"""

from __future__ import annotations

import weakref
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from i2rnet_tpu.core.loss import joints_mse_loss
from i2rnet_tpu.ops.accuracy import pck_accuracy


def compute_losses(outputs: Dict[str, Any], batch, loss_weights: Sequence[float],
                   use_target_weight: bool, use_ohkm: bool = False, topk: int = 8):
    """Dict-aware loss: w0*MSE(single) + w1*MSE(multi) when both branches are
    supervised, else plain MSE (reference ``function.py:52-57``). LOSS.USE_OHKM
    swaps in the hard-keypoint-mining variant."""
    from i2rnet_tpu.core.loss import joints_ohkm_mse_loss
    tw = batch["target_weight"] if use_target_weight else None
    valid = batch["person_valid"]

    def crit(pred):
        if use_ohkm:
            return joints_ohkm_mse_loss(pred, batch["target"], tw, valid, topk=topk)
        return joints_mse_loss(pred, batch["target"], tw, valid)

    multi = crit(outputs["multi"])
    if outputs.get("single") is not None:
        single = crit(outputs["single"])
        return loss_weights[0] * single + loss_weights[1] * multi, {
            "loss_single": single, "loss_multi": multi}
    return multi, {"loss_multi": multi}


#: TPU.REMAT values handled at the STEP level -> jax.checkpoint policies.
#: "full" stores only the step inputs and rematerializes the whole forward
#: in the backward pass (max memory saving, ~1/3 extra FLOPs); "dots"
#: additionally saves matmul/attention outputs
#: (``dots_with_no_batch_dims_saveable``) so only the elementwise/conv
#: chains are recomputed. Convolutions are not dots, so for the conv-heavy
#: HRNet/HRFormer backbones "dots" and "full" save similar amounts of HBM.
#: False/None/"none" = off; True/"layers" = per-encoder-layer nn.remat,
#: applied inside the model (models/encoder.py), a no-op here.
REMAT_VALUES = (False, None, "none", True, "layers", "dots", "full")


def _remat_wrap(fn, remat):
    if remat in (False, None, "none", True, "layers"):
        return fn
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat == "full":
        return jax.checkpoint(fn)
    raise ValueError(f"TPU.REMAT must be one of {REMAT_VALUES}, got {remat!r}")


def make_train_step(model, tx, loss_weights=(0.5, 0.5), use_target_weight=True,
                    use_ohkm: bool = False, topk: int = 8,
                    donate: bool = True, return_heatmaps: bool = False,
                    frozen_predicate=None, remat="none"):
    """Returns jitted ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch``: images [B,N,H,W,3], pos_masks [B,N,H,W,1], target [B,N,K,h,w],
    target_weight [B,N,K], person_valid [B,N].

    ``return_heatmaps`` adds the predicted 'multi' heatmaps to the metrics
    (DEBUG.* image dumps, reference ``function.py:100-102``); off by default
    so the hot path never materializes them.

    ``frozen_predicate(path) -> bool`` (the SINGLEFORMER_FIX/BACKBONE_FIX
    mask) excludes frozen params from differentiation entirely: they enter
    the forward as closure constants, so — like torch's
    ``requires_grad_(False)`` — no backward is ever traced through them,
    their grads are literal zeros, and eval-only code paths (the fused
    Pallas block kernels under TPU.FROZEN_STAGE_EVAL_MODE) stay legal
    inside the train step.

    ``remat`` (TPU.REMAT) wraps the loss forward in ``jax.checkpoint`` so
    the backward pass recomputes activations instead of holding them in
    HBM — identical math and grads, larger trainable batch per chip.
    """
    import numpy as _np

    # fail on an invalid REMAT string here, before model build / first trace
    # (a 'layer' typo would otherwise only surface at first compile)
    if remat not in REMAT_VALUES:
        raise ValueError(f"TPU.REMAT must be one of {REMAT_VALUES}, got {remat!r}")

    def _partition_flags(params):
        leaves, _ = jax.tree_util.tree_flatten_with_path(params)
        return _np.array([bool(frozen_predicate(path))
                          for path, _ in leaves])

    def step(state, batch, rng):
        def apply_loss(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], batch["pos_masks"], batch["person_valid"],
                train=True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            loss, parts = compute_losses(outputs, batch, loss_weights,
                                         use_target_weight, use_ohkm, topk)
            return loss, (mutated["batch_stats"], outputs, parts)

        apply_loss = _remat_wrap(apply_loss, remat)

        if frozen_predicate is None:
            (loss, (new_stats, outputs, parts)), grads = jax.value_and_grad(
                apply_loss, has_aux=True)(state.params)
        else:
            flags = _partition_flags(state.params)
            leaves, treedef = jax.tree_util.tree_flatten(state.params)
            trainable = [x for x, f in zip(leaves, flags) if not f]
            frozen = [x for x, f in zip(leaves, flags) if f]

            def loss_fn(trainable_leaves):
                it_t, it_f = iter(trainable_leaves), iter(frozen)
                merged = [next(it_f) if f else next(it_t) for f in flags]
                return apply_loss(jax.tree_util.tree_unflatten(treedef, merged))

            (loss, (new_stats, outputs, parts)), g_train = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            it_g = iter(g_train)
            g_leaves = [jnp.zeros_like(x) if f else next(it_g)
                        for x, f in zip(leaves, flags)]
            grads = jax.tree_util.tree_unflatten(treedef, g_leaves)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_stats)
        acc, _, _ = pck_accuracy(outputs["multi"], batch["target"],
                                 batch["person_valid"])
        metrics = {"loss": loss, "acc": acc, **parts}
        if return_heatmaps:
            metrics["heatmaps_pred"] = outputs["multi"]
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


#: Memoizes make_eval_step per live model instance. A fresh jitted closure
#: per validate() call would re-trace every (B, N_bucket) shape each call —
#: the W48 trace alone is ~4 s/shape on one host core, and the trainer
#: validates every epoch. Flax modules are weakref-able but not hashable
#: (dict attrs), so the cache keys on id(model) and a weakref finalizer
#: evicts the entry when the model dies (guarding against id reuse).
_EVAL_STEP_CACHE: Dict[int, tuple] = {}


def _eval_step_cache_for(model):
    entry = _EVAL_STEP_CACHE.get(id(model))
    if entry is not None and entry[0]() is model:
        return entry[1]
    try:
        ref = weakref.ref(
            model, lambda _r, mid=id(model), cache=_EVAL_STEP_CACHE:
            cache.pop(mid, None))
    except TypeError:  # non-weakrefable model (test doubles)
        return None
    steps: Dict[tuple, Any] = {}
    _EVAL_STEP_CACHE[id(model)] = (ref, steps)
    return steps


def make_eval_step(model, flip_pairs: Optional[Sequence] = None,
                   flip_test: bool = False, shift_heatmap: bool = False,
                   decode: bool = False, blur_kernel: int = 11,
                   heatmap_size=None, post_process: bool = True):
    """Returns a jitted eval step (memoized per model + options, so repeated
    ``validate()`` calls — every training epoch — reuse the same jit object
    and hit XLA's compiled-executable cache instead of re-tracing).

    ``decode=False``: ``eval_step(variables, batch) -> heatmaps [B,N,K,h,w]``.
    ``decode=True``:  ``eval_step(variables, batch, centers, scales) ->
    (preds [B*N,K,2], maxvals [B*N,K,1])`` — the DARK decode + inverse affine
    fused into the same program, so only [P,K,3] keypoints cross D2H instead
    of full heatmap volumes.

    Implements on-device flip-test averaging (reference
    ``function.py:142-162``): second forward on width-reversed inputs,
    ``flip_back`` channel-swap + width-reverse, mean. NOTE the reference
    dropped HRNet's ``SHIFT_HEATMAP`` 1px column shift — its ``validate()``
    never reads ``cfg.TEST.SHIFT_HEATMAP`` even though every released YAML
    sets it true — so product parity requires ``shift_heatmap=False``; the
    knob is kept only for HRNet-semantics callers.
    """
    from i2rnet_tpu.ops.decode import get_final_preds
    from i2rnet_tpu.ops.flip import flip_back

    cache_key = (tuple(tuple(p) for p in (flip_pairs or ())), flip_test,
                 shift_heatmap, decode, blur_kernel,
                 tuple(heatmap_size) if heatmap_size is not None else None,
                 post_process)
    per_model = _eval_step_cache_for(model)
    if per_model is not None and cache_key in per_model:
        return per_model[cache_key]

    def fwd(variables, images, pos_masks, valid):
        out = model.apply(variables, images, pos_masks, valid, train=False)
        return out["multi"]

    def heatmaps(variables, batch):
        images = batch["images"]
        pos_masks = batch["pos_masks"]
        valid = batch["person_valid"]
        heat = fwd(variables, images, pos_masks, valid)
        if flip_test:
            heat_f = fwd(variables, images[..., ::-1, :], pos_masks[..., ::-1, :], valid)
            heat_f = flip_back(heat_f, flip_pairs or [])
            if shift_heatmap:
                # HRNet-style 1px right shift. The reference does NOT do
                # this (function.py:158-162 averages unshifted), so eval
                # parity paths pass shift_heatmap=False.
                heat_f = heat_f.at[..., :, 1:].set(heat_f[..., :, :-1])
            heat = (heat + heat_f) * 0.5
        return heat

    if not decode:
        jitted = jax.jit(heatmaps)
    else:
        def step(variables, batch, centers, scales):
            heat = heatmaps(variables, batch)
            b, n, k = heat.shape[0], heat.shape[1], heat.shape[2]
            flat = heat.reshape(b * n, k, heat.shape[3], heat.shape[4])
            return get_final_preds(flat, centers, scales,
                                   blur_kernel=blur_kernel,
                                   heatmap_size=heatmap_size,
                                   post_process=post_process)

        jitted = jax.jit(step)
    if per_model is not None:
        per_model[cache_key] = jitted
    return jitted
