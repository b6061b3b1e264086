"""Persistent XLA compilation cache.

Full-size 3D train steps take minutes to compile; caching compiled
executables on disk makes reruns (benchmarks, resumed trainings, the
driver's checks) near-instant. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".xla_cache")


def enable_compilation_cache(cache_dir=None, min_compile_secs=5.0):
    import jax

    # CPU executables are AOT-compiled for the exact host CPU; caching them
    # risks SIGILL when the cache moves between machines (observed with the
    # virtual-device dry runs). Only cache accelerator compiles.
    try:
        if jax.default_backend() == "cpu":
            return
    except RuntimeError:
        pass

    cache_dir = cache_dir or os.environ.get("TRANSOAR_XLA_CACHE",
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except (AttributeError, ValueError):  # older jax without these flags
        pass
