"""Persistent XLA compilation cache (compiles here run minutes on the
remote-compile toolchain; caching makes reruns instant)."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.path.join(os.path.expanduser("~"), ".cache",
                                "rca_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
