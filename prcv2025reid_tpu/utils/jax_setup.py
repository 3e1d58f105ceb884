"""Process-level JAX setup helpers."""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache — kernel/graph compiles through the
    remote-compile tunnel can take minutes, so amortize across processes."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "prcv_jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
