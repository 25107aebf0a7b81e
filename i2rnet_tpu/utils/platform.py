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
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None) -> None:
    """Activate the persistent compilation cache.

    The ``JAX_COMPILATION_CACHE_DIR`` env var is dead in environments whose
    sitecustomize imports jax at interpreter start (the var is read during
    that early import) — the config API works regardless. TPU compiles over
    a tunnel run minutes each; the cache turns warm reruns into seconds.
    """
    import jax

    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        # Derive from the repo root rather than hardcoding an absolute
        # path; fall back to the user cache dir if the repo tree is not
        # writable (e.g. site-packages install).
        from pathlib import Path

        repo_root = Path(__file__).resolve().parents[2]
        candidate = repo_root / ".jax_cache"
        if os.access(repo_root, os.W_OK):
            path = str(candidate)
        else:
            path = os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "i2rnet_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # older jax without these knobs
        pass
