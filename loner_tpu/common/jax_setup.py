"""JAX runtime setup helpers.

``enable_persistent_cache`` turns on the on-disk compilation cache so
jitted programs survive process restarts — load-bearing in this
environment, where TPU compiles go through a slow (and occasionally
flaky) remote compile service.
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str = None) -> None:
    import jax

    # LONER_COMPILE_CACHE overrides the location (cold-start measurement
    # points it at an empty dir to simulate a fresh machine).
    cache_dir = (
        cache_dir
        or os.environ.get("LONER_COMPILE_CACHE")
        or os.path.expanduser("~/.cache/jax_compilation")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
