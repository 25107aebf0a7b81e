"""Python presets mirroring the reference's released experiment YAMLs.

One function per released model family (reference ``experiments/{coco,
crowdpose,OCHuman}/*.yaml``). These build Config objects directly so the
framework needs no YAML files for its own entry points; user YAMLs in the
reference schema still load via ``i2rnet_tpu.config.load_config``.
"""

from __future__ import annotations

from i2rnet_tpu.config import Config, default_config

HRNET_W48S_EXTRA = {
    "DECONV_WITH_BIAS": False,
    "NUM_DECONV_LAYERS": 1,
    "NUM_DECONV_FILTERS": [96],
    "NUM_DECONV_KERNELS": [4],
    "FINAL_CONV_KERNEL": 1,
    "PRETRAINED_LAYERS": ["conv1", "bn1", "conv2", "bn2", "layer1",
                          "transition1", "stage2", "transition2", "stage3"],
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [48, 96], "FUSE_METHOD": "SUM"},
    "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [48, 96, 192], "FUSE_METHOD": "SUM"},
}


def _base(dataset: str, num_joints: int) -> Config:
    cfg = default_config()
    cfg.merge({
        "OUTPUT_DIR": "output",
        "LOG_DIR": "log",
        "PRINT_FREQ": 100,
        "WORKERS": 8,
        "AUTO_RESUME": True,
        "DATASET": {
            "DATASET": dataset,
            "COLOR_RGB": True,
            "FLIP": True,
            "NUM_JOINTS_HALF_BODY": 8,
            "PROB_HALF_BODY": 0.3,
            "ROT_FACTOR": 45,
            "SCALE_FACTOR": 0.35,
        },
        "MODEL": {
            "NUM_JOINTS": num_joints,
            "IMAGE_SIZE": [192, 256],
            "HEATMAP_SIZE": [48, 64],
            "TRANS_SIZE": [16, 12],
            "SIGMA": 2,
            "TARGET_TYPE": "gaussian",
        },
        "LOSS": {"USE_TARGET_WEIGHT": True},
        "TEST": {
            "BLUR_KERNEL": 11,
            "BBOX_THRE": 1.0,
            "IMAGE_THRE": 0.0,
            "IN_VIS_THRE": 0.2,
            "NMS_THRE": 1.0,
            "OKS_THRE": 0.9,
            "USE_GT_BBOX": True,
            "FLIP_TEST": True,
            "POST_PROCESS": True,
            "SHIFT_HEATMAP": True,
        },
    })
    return cfg


def w48_pure_en6(dataset: str = "coco") -> Config:
    """Vanilla I²R-Net (HRNet-W48-S + 6-layer inter encoder).

    Mirrors ``experiments/coco/interformer_coco_w48_pure_en6.yaml`` (and the
    crowdpose/OCHuman variants, 14/17 joints).
    """
    joints = 14 if dataset == "crowdpose" else 17
    cfg = _base(dataset, joints)
    cfg.merge({
        "MODEL": {
            "NAME": "interformer_pureMulti",
            "USE_MULTI_POS": True,
            "INTER_SUPERVISION": True,
            "DIM_MODEL": 96,
            "DIM_FEEDFORWARD": 192,
            "N_HEAD": 1,
            "ENCODER_LAYERS": 6,
            "POS_EMBEDDING": "sine",
            "MULTI_POS_EMBEDDING": "conv",
            "MULTI_POS_EMBEDDING_DIM": 96,
            "EXTRA": dict(HRNET_W48S_EXTRA),
        },
        "TRAIN": {
            "BATCH_SIZE_PER_GPU": 8,
            "END_EPOCH": 240,
            "LR": 5e-4,
            "LR_END": 5e-5,
            "WD": 0.1,
        },
        "TEST": {"BATCH_SIZE_PER_GPU": 64},
    })
    return cfg


def tph_interformer(dataset: str = "coco", max_patch: int = 4) -> Config:
    """I²R-Net with TransPose-H first stage (two-stage ``interformer``).

    Mirrors ``experiments/*/interformer_*_tph_192_*.yaml``.
    """
    joints = 14 if dataset == "crowdpose" else 17
    cfg = _base(dataset, joints)
    cfg.merge({
        "DATASET": {"MAX_PATCH": max_patch},
        "MODEL": {
            "NAME": "interformer",
            "SINGLEFORMER": "transpose_h",
            "SINGLEFORMER_FIX": False,
            "END2END": False,
            "INTER_SUPERVISION": True,
            "DIM_MODEL": 96,
            "DIM_FEEDFORWARD": 192,
            "N_HEAD": 1,
            "HRNET_RES_LAYER": 0,
            "ENCODER_LAYERS": 6,
            "ENCODER_MULTI_LAYERS": 2,
            "USE_MULTI_POS": False,
            "POS_EMBEDDING": "sine",
            "UPSAMPLE_TYPE": "deconv",
            "EXTRA": dict(HRNET_W48S_EXTRA),
        },
        "TRAIN": {
            "BATCH_SIZE_PER_GPU": 4,
            "END_EPOCH": 240,
            "LR": 1e-4,
            "LR_END": 1e-5,
        },
        "TEST": {"BATCH_SIZE_PER_GPU": 64},
    })
    return cfg


def hrt_interformer(dataset: str = "coco", max_patch: int = 2,
                    image_size=(192, 256)) -> Config:
    """I²R-Net with HRFormer-B first stage (DIM_MODEL=78 = branch0 channels).

    Mirrors ``experiments/*/interformer_*_hrt_*.yaml`` (USE_MULTI_POS false,
    MULTI_POS_EMBEDDING 'res', deconv upsampling, 2 inter layers).
    """
    joints = 14 if dataset == "crowdpose" else 17
    cfg = _base(dataset, joints)
    w, h = image_size
    cfg.merge({
        "DATASET": {"MAX_PATCH": max_patch},
        "MODEL": {
            "NAME": "interformer",
            "SINGLEFORMER": "hrformer",
            "SINGLEFORMER_FIX": False,
            "END2END": False,
            "INTER_SUPERVISION": True,
            "DIM_MODEL": 78,
            "DIM_FEEDFORWARD": 192,
            "N_HEAD": 1,
            "ENCODER_LAYERS": 6,
            "ENCODER_MULTI_LAYERS": 2,
            "USE_MULTI_POS": False,
            "MULTI_POS_EMBEDDING": "res",
            "ATTENTION_TYPE": "default",
            "UPSAMPLE_TYPE": "deconv",
            "IMAGE_SIZE": [w, h],
            "HEATMAP_SIZE": [w // 4, h // 4],
            "TRANS_SIZE": [h // 16, w // 16],
            "EXTRA": {
                "DECONV_WITH_BIAS": False,
                "NUM_DECONV_LAYERS": 1,
                "NUM_DECONV_FILTERS": [78],
                "NUM_DECONV_KERNELS": [4],
                "FINAL_CONV_KERNEL": 1,
            },
        },
        "TRAIN": {
            "BATCH_SIZE_PER_GPU": 4,
            "END_EPOCH": 240,
            "LR": 1e-4,
            "LR_END": 1e-5,
        },
        "TEST": {"BATCH_SIZE_PER_GPU": 32},
    })
    return cfg


def tiny_test_config(num_joints: int = 5) -> Config:
    """Small config for CPU tests and multi-chip dryruns (64x48 input)."""
    cfg = _base("synthetic", num_joints)
    cfg.merge({
        "MODEL": {
            "NAME": "interformer_pureMulti",
            "USE_MULTI_POS": True,
            "DIM_MODEL": 16,
            "DIM_FEEDFORWARD": 32,
            "N_HEAD": 2,
            "ENCODER_LAYERS": 2,
            "MULTI_POS_EMBEDDING": "conv",
            "IMAGE_SIZE": [48, 64],
            "HEATMAP_SIZE": [12, 16],
            "TRANS_SIZE": [4, 3],
            "EXTRA": {
                "DECONV_WITH_BIAS": False,
                "NUM_DECONV_LAYERS": 1,
                "NUM_DECONV_FILTERS": [16],
                "NUM_DECONV_KERNELS": [4],
                "FINAL_CONV_KERNEL": 1,
                "PRETRAINED_LAYERS": ["*"],
                "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                           "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [8, 16],
                           "FUSE_METHOD": "SUM"},
                "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                           "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [8, 16, 32],
                           "FUSE_METHOD": "SUM"},
            },
        },
        "TRAIN": {"BATCH_SIZE_PER_GPU": 2, "END_EPOCH": 2},
        "TPU": {"COMPUTE_DTYPE": "float32", "USE_PALLAS_ATTENTION": False},
    })
    return cfg
