"""Persistent XLA compilation cache setup.

Compiles over the tunneled TPU on this box take minutes; caching them on
disk makes every process after the first start instantly. Safe no-op if the
backend rejects the cache.
"""
import os


def enable(path: str = "/root/.cache/jax_brotlig") -> None:
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
