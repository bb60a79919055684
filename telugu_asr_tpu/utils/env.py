"""Runtime environment setup (reference: src/utils/env_util.py).

``setup_environment`` replaces the reference's device-visibility plumbing
(env_util.py:21-40) with the two things that matter on TPU:

* a persistent XLA compilation cache (first compile of each batch shape is
  20-40s; cached compiles are milliseconds across processes/restarts);
* optional float32 matmul precision (TPU defaults f32 matmuls to bfloat16
  inputs; ``highest`` forces full f32 for parity-sensitive paths).

``setup_seed`` mirrors env_util.py:49-68 (seed-everything, default 42) in
JAX terms: it seeds NumPy/stdlib RNGs and returns the root ``PRNGKey`` —
JAX's explicit-key design replaces TF's global-state seeding.
"""
from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

__all__ = ["setup_environment", "setup_seed", "has_devices"]

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/telugu_asr_tpu/xla")


def setup_environment(
    compilation_cache_dir: Optional[str] = DEFAULT_CACHE_DIR,
    matmul_precision: Optional[str] = None,
    platform: Optional[str] = None,
) -> None:
    import jax

    if platform:
        # must run before any backend initialization (first jax.devices()
        # call); env vars alone are ignored when a sitecustomize registers
        # a plugin backend in every process, so set the config directly.
        # TPU chips may be registered under a PJRT plugin name rather than
        # the literal 'tpu' (e.g. a tunnel-attached chip exporting
        # JAX_PLATFORMS=axon) — honor --platform tpu by mapping to it.
        if platform == "tpu":
            plugin = os.environ.get("JAX_PLATFORMS", "")
            if plugin and "tpu" not in plugin.split(","):
                platform = plugin
        jax.config.update("jax_platforms", platform)
    if compilation_cache_dir:
        os.makedirs(compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)


def setup_seed(seed: int = 42):
    """Seed host RNGs; return the root JAX PRNGKey."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def has_devices(platform: str = "tpu") -> bool:
    import jax

    try:
        return any(d.platform.lower().startswith(platform.lower()) for d in jax.devices())
    except RuntimeError:
        return False
