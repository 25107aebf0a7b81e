"""Shared TPU counter-PRNG dropout helpers for the training kernels.

Used by :mod:`i2rnet_tpu.ops.pallas.mhsa_train` and
:mod:`i2rnet_tpu.ops.pallas.encoder_ffn_train` — both generate dropout
masks inside the kernel with ``pltpu.prng_seed`` / ``prng_random_bits``
and regenerate identical bits in the backward, so the two semantics
pitfalls pinned here (signed bits, two-word seeding) must be handled
identically everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Odd (golden-ratio) multiplier, injective mod 2^32: Mosaic's prng_seed
# accepts at most TWO seed words, so kernels fold their flat program index
# into the second word via `seed1 + program_index * GOLDEN` to give every
# block a distinct stream.
GOLDEN = -1640531527


def threshold(rate: float) -> int:
    """uint32 threshold t with P(bits < t) == rate (bits ~ U[0, 2^32))."""
    assert 0.0 <= rate < 1.0, rate
    return min(int(round(rate * 4294967296.0)), 4294967295)


def keep_mask(bits, rate: float):
    """Survivor mask from raw PRNG bits.

    Mosaic's ``prng_random_bits`` yields SIGNED int32 — bitcast before the
    unsigned threshold compare (a signed compare silently turns rate=0.3
    into an effective drop rate of 0.8; pinned on-device by
    ``tools/selfcheck_tpu.py``).
    """
    if bits.dtype != jnp.uint32:
        bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    return bits >= jnp.uint32(threshold(rate))


def rng_seeds(dropout_rng) -> jax.Array:
    """Fold a JAX PRNG key into two int32 seed words for the TPU PRNG."""
    data = dropout_rng
    if jnp.issubdtype(data.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(data)
    flat = data.ravel().astype(jnp.uint32)
    two = jnp.stack([flat[0], flat[-1]])
    return jax.lax.bitcast_convert_type(two, jnp.int32)
