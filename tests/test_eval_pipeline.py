"""Fused-eval pipelining + eval-step memoization.

``validate()`` keeps up to TPU.EVAL_PIPELINE dispatched device batches in
flight before materializing keypoints (overlapping host assembly/H2D with
device execution); results must be bit-identical to the fully synchronous
loop, including the drain of a pipeline deeper than the batch count.

``make_eval_step`` memoizes per (model, options): the reference re-enters
``validate()`` every epoch (``tools/ddp_train.py`` loop), and a fresh jit
closure per call would re-trace every (B, N_bucket) shape each epoch.
"""

import gc

import jax
import numpy as np
import pytest

from i2rnet_tpu.core import train as train_mod
from i2rnet_tpu.core.train import make_eval_step
from i2rnet_tpu.core.validate import validate
from i2rnet_tpu.data.coco import COCODataset
from i2rnet_tpu.data.synthetic import make_synthetic_coco
from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.registry import get_model_builder


def _setup(tmp_path, pipeline):
    root = make_synthetic_coco(str(tmp_path / "d"), num_images=6, num_joints=5,
                               max_persons=2, image_set="val2017")
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.TPU.EVAL_PIPELINE = pipeline
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.BLUR_KERNEL = 5
    cfg.TEST.BATCH_SIZE_PER_GPU = 2
    return cfg.freeze(), root


def test_pipelined_validate_matches_synchronous(tmp_path):
    cfg0, root = _setup(tmp_path, pipeline=0)
    ds = COCODataset(cfg0, root, "val2017", is_train=False)
    model = get_model_builder(cfg0.MODEL.NAME)(cfg0, use_pallas=False)
    items, nb = next(ds.eval_batches(2))
    probe = ds.device_batch(ds.make_raw_batch(items, nb)[0])
    variables = model.init(jax.random.PRNGKey(0), probe["images"],
                           probe["pos_masks"], probe["person_valid"],
                           train=False)

    nv_sync, perf_sync = validate(cfg0, ds, model, variables,
                                  str(tmp_path / "sync"))
    # depth 8 > number of batches (6 images / B=2) -> exercises the
    # post-loop drain of a never-full pipeline
    cfg8, _ = _setup(tmp_path, pipeline=8)
    nv_pipe, perf_pipe = validate(cfg8, ds, model, variables,
                                  str(tmp_path / "pipe"))
    assert perf_pipe == perf_sync
    assert list(nv_pipe) == list(nv_sync)
    for k in nv_sync:
        np.testing.assert_allclose(nv_pipe[k], nv_sync[k], rtol=0,
                                   atol=0, err_msg=k)


def test_eval_step_memoized_per_model_and_options():
    cfg = tiny_test_config(num_joints=5).freeze()
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    kw = dict(flip_pairs=[[1, 2]], flip_test=True, decode=True,
              blur_kernel=5, heatmap_size=(12, 16))
    s1 = make_eval_step(model, **kw)
    assert make_eval_step(model, **kw) is s1
    assert make_eval_step(model, **{**kw, "flip_test": False}) is not s1
    # a distinct model instance gets its own steps
    model2 = get_model_builder(cfg.MODEL.NAME)(cfg)
    assert make_eval_step(model2, **kw) is not s1
    # entries die with the model (weakref eviction; no id-reuse aliasing)
    n_before = len(train_mod._EVAL_STEP_CACHE)
    mid = id(model2)
    del model2
    gc.collect()
    assert (mid not in train_mod._EVAL_STEP_CACHE
            or len(train_mod._EVAL_STEP_CACHE) <= n_before)


def test_eval_step_cache_survives_unhashable_wrappers():
    # non-weakrefable callables (e.g. a plain dict-configured stub) must
    # fall through gracefully instead of raising
    class Stub:
        __slots__ = ()  # no __weakref__ slot

        def apply(self, *a, **k):
            raise NotImplementedError

    step = make_eval_step(Stub(), flip_pairs=[], flip_test=False, decode=False)
    assert callable(step)
