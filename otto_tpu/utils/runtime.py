"""Runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — essential when compiles are remote
    (tunneled TPU): a cache hit turns a ~2-minute compile into milliseconds."""
    import jax

    cache = path or os.path.expanduser("~/.jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
