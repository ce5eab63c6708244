"""Persistent XLA compilation cache.

Compiles route through a remote helper on this TPU platform and cost minutes
for the large detector graphs; caching them on disk makes reruns of bench /
train / eval start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "MODEST_TPU_COMP_CACHE", os.path.expanduser("~/.cache/modest_tpu_xla_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
