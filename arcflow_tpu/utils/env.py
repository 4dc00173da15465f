"""Process-level environment setup for TPU jobs."""

from __future__ import annotations

import os

import jax


def setup_jax(compilation_cache: str = '~/.cache/arcflow_tpu_xla',
              force_platform: str | None = None):
    """Enable the persistent XLA compilation cache (first compile of a big
    DiT program costs minutes on a tunneled chip; subsequent processes hit
    the cache) and optionally pin the platform.
    """
    if compilation_cache:
        path = os.path.expanduser(compilation_cache)
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    if force_platform:
        jax.config.update('jax_platforms', force_platform)
