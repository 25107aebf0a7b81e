"""i2rnet_tpu — TPU-native I²R-Net (Intra- and Inter-Human Relation Network) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch repo ``leijue222/Intra-and-Inter-Human-Relation-Network-for-MPEE``
(top-down multi-person 2D pose estimation with intra-human and inter-human
relation transformers).

Design stance (vs. the reference — see SURVEY.md §7):

* Ragged "all persons in one image" lists become **static** ``[B, N_max, ...]``
  tensors with boolean validity masks end-to-end: the data pipeline emits fixed
  shapes, attention uses key-padding masks, the loss and decoders are masked.
  (Replaces ``padding_tensor``/``get_mask``/``get_valid_output`` in the
  reference ``lib/models/interformer.py:222-272``.)
* CPU-side cv2 preprocessing (per-person affine warp, Gaussian target render)
  becomes batched on-device XLA ops (``i2rnet_tpu.ops``).
* Heatmap decoding (argmax + Gaussian blur + log + Taylor refinement) and
  OKS-NMS run on-device, vectorized (``i2rnet_tpu.ops.decode`` / ``.nms``).
* Models are Flax linen modules in NHWC layout with bf16 compute and masked
  BatchNorm (padded persons do not pollute batch statistics).
* Parallelism is a named ``jax.sharding.Mesh`` with pjit data-parallel
  sharding (replacing DDP/NCCL in the reference ``tools/ddp_train.py``).
"""

__version__ = "0.1.0"

from i2rnet_tpu.config import Config, default_config, load_config  # noqa: F401
