"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's ddp_sample.py smoke-test role (validating distributed
wiring without real accelerators) the JAX way: XLA host-platform device
multiplication, per SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup and pins
# jax_platforms to the TPU backend; env vars alone cannot override it, so
# force CPU here before any computation.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache for the slow tier (VERDICT r3 item 8): the
# full-size HRFormer-B CPU compiles run minutes each; with the cache, a
# cold populate run makes warm full-suite reruns CI-affordable. Cache key
# includes the HLO + compile flags, so code changes invalidate safely.
from i2rnet_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
