"""Common JAX runtime configuration for entry points."""

from __future__ import annotations

import jax


def setup_jax(cache_dir: str = "/tmp/jax_cache") -> None:
    """Enable the persistent compilation cache (full-resolution model compiles
    take minutes; the cache makes reruns near-instant) and multi-host init."""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    try:  # no-op on a single host
        jax.distributed.initialize()
    except Exception:
        pass
