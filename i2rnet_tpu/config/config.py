"""Configuration system.

A small frozen attribute-dict tree that accepts the reference repo's YAML
experiment schema verbatim (the ~90 yacs keys defined in the reference
``lib/config/default.py:1-198``), so ``experiments/*.yaml`` files written for
the PyTorch repo load unchanged.  Unlike the reference (string-``eval``
registries + mutable global singleton) configs here are plain values created
per call.

Key layout conventions inherited from the reference:

* ``MODEL.IMAGE_SIZE`` / ``HEATMAP_SIZE`` are ``[width, height]``.
* ``MODEL.TRANS_SIZE`` is ``[h, w]`` of the inter-stage token grid (the
  reference comment claims width*height but every use treats it as (16, 12) =
  (rows, cols); see reference ``lib/models/interformer_pureMulti.py:702``).
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """Nested attribute-access dict with optional freezing."""

    def __init__(self, d: Optional[Dict[str, Any]] = None):
        super().__init__()
        self.__dict__["_frozen"] = False
        if d:
            for k, v in d.items():
                self[k] = Config(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get("_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {name!r}")
        self[name] = Config(value) if isinstance(value, dict) else value

    def __setitem__(self, key, value):
        if self.__dict__.get("_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {key!r}")
        super().__setitem__(key, Config(value) if isinstance(value, dict) and not isinstance(value, Config) else value)

    def freeze(self, frozen: bool = True) -> "Config":
        self.__dict__["_frozen"] = frozen
        for v in self.values():
            if isinstance(v, Config):
                v.freeze(frozen)
        return self

    def defrost(self) -> "Config":
        return self.freeze(False)

    def clone(self) -> "Config":
        return Config(self.to_dict())

    def to_dict(self) -> Dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, Config) else copy.deepcopy(v)) for k, v in self.items()}

    def merge(self, other: Dict[str, Any]) -> "Config":
        """Recursively merge ``other`` into self (other wins)."""
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), Config):
                self[k].merge(v)
            else:
                old = self.get(k)
                # yacs _decode_cfg_value: file values that are strings but
                # whose default is typed parse as python literals — the
                # reference YAMLs write "LR: '5e-4'" (a YAML string) and
                # "GPUS: (0,)" and rely on this
                if isinstance(v, str) and not isinstance(old, str):
                    try:
                        v = ast.literal_eval(v)
                    except (ValueError, SyntaxError):
                        pass
                # yacs coerces file values to the default's list/tuple type
                if isinstance(old, tuple) and isinstance(v, list):
                    v = tuple(v)
                elif isinstance(old, list) and isinstance(v, tuple):
                    v = list(v)
                self[k] = Config(v) if isinstance(v, dict) else v
        return self

    def merge_from_list(self, opts: List[Any]) -> "Config":
        """yacs-style ``KEY.SUBKEY value`` pair list override.

        Unknown keys raise (yacs ``Non-existent key`` semantics): a typo'd
        CLI override must fail loudly, not be silently ignored. MODEL.EXTRA
        subkeys are exempt — that subtree is open in the reference schema.
        """
        assert len(opts) % 2 == 0, f"override list must have even length, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Non-existent config key: {key}")
                node = node[p]
            open_subtree = parts[0] == "MODEL" and "EXTRA" in parts[1:]
            if parts[-1] not in node and not open_subtree:
                raise KeyError(f"Non-existent config key: {key}")
            old = node.get(parts[-1])
            if isinstance(value, str) and not isinstance(old, str):
                # yacs (_decode_cfg_value) parses python literals via
                # ast.literal_eval, NOT yaml — so 'no'/'on'/'null' stay
                # strings (matters for None-default keys like
                # MODEL.SINGLEFORMER), while '1', '0.5', '[1,2]', 'True'
                # parse. Non-literal strings pass through unchanged.
                try:
                    value = ast.literal_eval(value)
                except (ValueError, SyntaxError):
                    pass
            # yacs _check_and_coerce_cfg_value_type list<->tuple casts
            if isinstance(old, tuple) and isinstance(value, list):
                value = tuple(value)
            elif isinstance(old, list) and isinstance(value, tuple):
                value = list(value)
            node[parts[-1]] = value
        return self


def default_config() -> Config:
    """Default tree mirroring the reference ``lib/config/default.py:16-161``."""
    c = Config()
    c.OUTPUT_DIR = ""
    c.LOG_DIR = ""
    c.DATA_DIR = ""
    c.GPUS = (0,)  # accepted for YAML compat; device selection is via jax
    c.WORKERS = 4
    c.PRINT_FREQ = 20
    c.AUTO_RESUME = False
    c.PIN_MEMORY = True
    c.RANK = 0
    c.SEED = 0

    c.CUDNN = dict(BENCHMARK=True, DETERMINISTIC=False, ENABLED=True)  # ignored on TPU

    c.MODEL = dict(
        NAME="interformer",
        SINGLEFORMER=None,
        SINGLE_MODEL="",
        LOSS_WEIGHTS=[0.5, 0.5],
        NORMALIZE_BEFORE=False,
        END2END=False,
        BACKBONE_FIX=False,
        SINGLEFORMER_FIX=False,
        INIT_WEIGHTS=True,
        PRETRAINED="",
        NUM_JOINTS=17,
        TAG_PER_JOINT=True,
        TARGET_TYPE="gaussian",
        IMAGE_SIZE=[256, 256],   # [w, h]
        HEATMAP_SIZE=[64, 64],   # [w, h]
        TRANS_SIZE=[16, 12],     # [h, w] of inter tokens
        SIGMA=2,
        HRNET_RES_LAYER=0,
        EXTRA={},
        BOTTLENECK_NUM=0,
        DIM_MODEL=256,
        DIM_FEEDFORWARD=512,
        ENCODER_LAYERS=6,
        ENCODER_MULTI_LAYERS=4,
        # legacy keys read only by the e2e models (reference interformer_e2e.py:461-462)
        ENCODER_SINGLE_LAYERS=4,
        ENCODER_MUTI_LAYERS=2,
        USE_MULTI_POS=True,
        N_HEAD=8,
        ATTENTION_ACTIVATION="relu",
        POS_EMBEDDING="learnable",
        SINGLE_POS_EMBEDDING="sine",
        INTERMEDIATE_SUP=False,
        PE_ONLY_AT_BEGIN=False,
        DOMAIN_TRANS=False,
        INTER_SUPERVISION=True,
        UPSAMPLE_TYPE="multiplex",
        MULTI_POS_EMBEDDING="conv",
        ATTENTION_TYPE="default",
        WINDOW_SIZE=4,
        MULTI_POS_EMBEDDING_DIM=96,
    )

    c.LOSS = dict(
        USE_OHKM=False,
        TOPK=8,
        USE_TARGET_WEIGHT=True,
        USE_DIFFERENT_JOINTS_WEIGHT=False,
    )

    c.DATASET = dict(
        ROOT="",
        DATASET="mpii",
        TRAIN_SET="train",
        TEST_SET="valid",
        DATA_FORMAT="jpg",
        HYBRID_JOINTS_TYPE="",
        SELECT_DATA=False,
        MAX_PATCH=7,
        PATCH_MODE="random",
        USE_COCOMINI=False,
        FLIP=True,
        SCALE_FACTOR=0.25,
        ROT_FACTOR=30,
        PROB_HALF_BODY=0.0,
        NUM_JOINTS_HALF_BODY=8,
        COLOR_RGB=False,
    )

    c.TRAIN = dict(
        LR_FACTOR=0.1,
        LR_STEP=[90, 110],
        LR=1e-4,
        LR_END=1e-5,
        OPTIMIZER="adam",
        MOMENTUM=0.9,
        WD=1e-4,
        NESTEROV=False,
        GAMMA1=0.99,
        GAMMA2=0.0,
        BEGIN_EPOCH=0,
        END_EPOCH=140,
        RESUME=False,
        CHECKPOINT="",
        BATCH_SIZE_PER_GPU=32,
        SHUFFLE=True,
    )

    c.TEST = dict(
        BLUR_KERNEL=3,
        BATCH_SIZE_PER_GPU=32,
        FLIP_TEST=False,
        POST_PROCESS=False,
        SHIFT_HEATMAP=False,
        USE_GT_BBOX=False,
        DETAIL_EVAL=False,
        IMAGE_THRE=0.1,
        NMS_THRE=0.6,
        SOFT_NMS=False,
        OKS_THRE=0.5,
        IN_VIS_THRE=0.0,
        COCO_BBOX_FILE="",
        BBOX_THRE=1.0,
        MODEL_FILE="",
    )

    c.DEBUG = dict(
        DEBUG=False,
        SAVE_BATCH_IMAGES_GT=False,
        SAVE_BATCH_IMAGES_PRED=False,
        SAVE_HEATMAPS_GT=False,
        SAVE_HEATMAPS_PRED=False,
    )

    # --- TPU-framework-only knobs (new; no reference counterpart) ---
    c.TPU = dict(
        MESH_SHAPE=[-1],          # data axis, -1 = all devices
        MESH_AXES=["data"],
        COMPUTE_DTYPE="bfloat16", # conv/matmul compute dtype
        PARAM_DTYPE="float32",
        MAX_PERSONS=7,            # static N_max for eval batches (train uses MAX_PATCH)
        USE_PALLAS_ATTENTION=True,
        # training-path flash attention with in-kernel dropout (encoder
        # models; distribution-identical to the XLA dropout, different
        # RNG stream — see ops/pallas/mhsa_train.py)
        FLASH_TRAIN_ATTENTION=True,
        # fused LN1->FFN->residual->LN2 tail with in-kernel dropout on the
        # TRAINING path (encoder models; same RNG-stream deviation as
        # FLASH_TRAIN_ATTENTION — see ops/pallas/encoder_ffn_train.py)
        FUSED_FFN_TRAIN=True,
        FUSED_MLP_EVAL=False,     # fused MlpDWBN kernel only (superseded)
        FUSED_BLOCK_EVAL=True,    # whole-block hrformer eval kernels
        # single-pass attn+MLP eval kernel on branches whose combined
        # footprint fits VMEM (saves one map round-trip + one launch per
        # block; experiment knob pending a measured win)
        FUSED_BLOCK_EVAL_ONEPASS=False,
        # custom-VJP Pallas window-attention block in TRAINING (Pallas fwd
        # AND bwd; exact same math as the unfused path — droppath mask is
        # drawn inside the block, so stochastic trajectories differ by RNG
        # stream only).
        # RETIRED as a perf knob (r5 decision, docs/KERNELS.md): two rounds
        # of measured negatives (+2.5% r3, einsum variant +145% r4) showed
        # the window relayouts it tries to elide are load-bearing for MXU
        # utilization. Kept for its parity-tested custom-VJP machinery;
        # enabling it warns loudly. Do not enable in recipes.
        FUSED_BLOCK_TRAIN=False,
        # FUSED_BLOCK_TRAIN engages only on branches with at least this
        # many feature-map tokens (h*w): every distinct branch geometry
        # adds three Mosaic kernel instances to the train program's
        # compile budget. 2048 = branch0 only at 256x192; 768 also takes
        # branch1 (an experiment knob — see docs/perf/hrformer_r03.md)
        MIN_FUSED_TRAIN_TOKENS=2048,
        # cap on how many token-gate-eligible blocks (in call order) take
        # the fused-train kernel path; -1 = unlimited. Each fused block
        # adds one fwd + two bwd Mosaic kernel instances to the compile
        # budget — a prefix cap gives proportional speedup at proportional
        # compile cost (plan B for compile-helper memory limits; see
        # docs/perf/hrformer_r03.md)
        FUSED_TRAIN_MAX_BLOCKS=-1,
        # unfused window attention computed by a batch-dim dot_general on
        # the padded spatial layout (no materialized window partition /
        # per-head transposes; XLA layout assignment owns all data
        # movement). Layout experiment for the train-step copy bucket —
        # see docs/perf/hrformer_r04.md
        WINDOW_ATTN_EINSUM=False,
        # fused-eval pipelining: how many dispatched device batches
        # validate() keeps in flight before materializing the oldest one's
        # keypoints. Overlaps host batch assembly + H2D with device
        # execution (and hides dispatch RTT on tunneled/remote devices).
        # 0 = fully synchronous (block on every batch)
        EVAL_PIPELINE=2,
        # rematerialization (trade FLOPs for activation HBM; identical
        # math/grads, enables larger per-chip batches):
        #   false    — store all activations (default)
        #   'layers' — nn.remat each transformer-encoder layer (all encoder
        #              models); the narrowest scope (true means the same)
        #   'dots'   — jax.checkpoint the whole loss forward, saving matmul
        #              outputs (dots_with_no_batch_dims_saveable)
        #   'full'   — jax.checkpoint the whole loss forward, saving only
        #              the step inputs (max HBM saving, ~1/3 extra FLOPs)
        # see core/train.py::_remat_wrap / models/encoder.py
        REMAT=False,
        # run a SINGLEFORMER_FIX-frozen first stage in eval mode during
        # training: its BN running stats stop updating and its dropout/
        # droppath turn off (a deliberate, documented deviation from torch
        # train()-mode frozen modules), which lets the fused eval kernels
        # carry the frozen forward. Off by default = reference-faithful.
        FROZEN_STAGE_EVAL_MODE=False,
    )
    return c


def load_config(yaml_file: str, opts: Optional[List[Any]] = None,
                data_dir: str = "", model_dir: str = "", log_dir: str = "") -> Config:
    """Build a config from a reference-schema YAML + yacs-style overrides.

    Mirrors ``update_config`` in the reference ``lib/config/default.py:164-191``:
    merge YAML, merge override list, join DATA_DIR into ROOT/PRETRAINED/
    MODEL_FILE, freeze.
    """
    cfg = default_config()
    with open(yaml_file) as f:
        loaded = yaml.safe_load(f)
    if loaded:
        cfg.merge(loaded)
    if opts:
        cfg.merge_from_list(list(opts))

    if model_dir:
        cfg.OUTPUT_DIR = model_dir
    if log_dir:
        cfg.LOG_DIR = log_dir
    if data_dir:
        cfg.DATA_DIR = data_dir

    cfg.DATASET.ROOT = os.path.join(cfg.DATA_DIR, cfg.DATASET.ROOT)
    cfg.MODEL.PRETRAINED = os.path.join(cfg.DATA_DIR, cfg.MODEL.PRETRAINED)
    if cfg.TEST.MODEL_FILE:
        cfg.TEST.MODEL_FILE = os.path.join(cfg.DATA_DIR, cfg.TEST.MODEL_FILE)

    return cfg.freeze()


def update_config(cfg: Config, args) -> Config:
    """argparse-compatible shim matching the reference call signature."""
    new = load_config(
        args.cfg,
        opts=getattr(args, "opts", None),
        data_dir=getattr(args, "dataDir", "") or "",
        model_dir=getattr(args, "modelDir", "") or "",
        log_dir=getattr(args, "logDir", "") or "",
    )
    cfg.defrost()
    cfg.clear()
    cfg.merge(new.to_dict())
    cfg.freeze()
    return cfg
