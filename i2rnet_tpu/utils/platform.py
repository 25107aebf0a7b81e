"""Platform selection helper.

Environments that preload a TPU plugin via sitecustomize (pinning
``jax_platforms`` at interpreter start) ignore the ``JAX_PLATFORMS`` env
var. Calling this right after importing jax restores the expected env-var
behavior for every CLI tool.
"""

from __future__ import annotations

import os


def apply_platform_override(default: str | None = None) -> None:
    import jax

    want = os.environ.get("I2R_PLATFORM") or default
    env = os.environ.get("JAX_PLATFORMS")
    # If the config was pinned by a plugin but the user set JAX_PLATFORMS to
    # something narrower, honor the user.
    if want is None and env and env != jax.config.jax_platforms:
        want = env
    if want:
        jax.config.update("jax_platforms", want)
