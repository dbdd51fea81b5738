"""Persistent XLA compilation cache setup.

Compiles over the tunneled TPU on this box take minutes; caching them on
disk makes every process after the first start instantly. Safe no-op if the
backend rejects the cache.

The cache directory is namespaced by the resolved jax platform config and
the CPU model: XLA's cache key does NOT include the target machine
configuration, and sessions with the tunneled-TPU plugin loaded write CPU
executables generated with different codegen flags (+prefer-no-scatter /
+prefer-no-gather). A plain-CPU process loading those entries gets XLA's
"machine type doesn't match … SIGILL" warning and deoptimized code that
runs orders of magnitude slower, so the two worlds must not share a dir.
"""
import os


def _tag() -> str:
    import hashlib
    bits = []
    try:
        import jax
        bits.append(str(jax.config.jax_platforms))
    except Exception:
        bits.append(os.environ.get("JAX_PLATFORMS", ""))
    # a process with the tunneled-TPU plugin REGISTERED (even when jax
    # ultimately runs CPU, e.g. JAX_PLATFORMS=cpu with the plugin site
    # on PYTHONPATH) emits CPU code with the deoptimized
    # +prefer-no-scatter codegen flags — those entries must not land in
    # the plain-CPU namespace (observed again round 3: multihost bench
    # loaded them and ran orders slower)
    try:
        from jax._src import xla_bridge as _xb
        if "axon" in getattr(_xb, "_backend_factories", {}):
            bits.append("plugin:axon")
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def enable(path: str = "/root/.cache/jax_brotlig") -> None:
    try:
        import jax
        path = f"{path}_{_tag()}"
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def map_region_count() -> int:
    """This process's current mmap-region count (Linux)."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


# Comfortable margin under the Linux default vm.max_map_count (65530):
# a single heavy test (interpret-mode Pallas fused compiles) can add
# >20K regions, so the guard fires well before half the hard limit.
MAP_REGION_SOFT_LIMIT = 30_000


def clear_if_bloated(limit: int = MAP_REGION_SOFT_LIMIT) -> bool:
    """Drop jax's in-process executable caches when this process holds too
    many mmap regions.

    Every live compiled XLA:CPU executable pins LLVM-JIT code/data
    mappings. A long-lived process that keeps compiling new programs (the
    cold test suite, a many-shape decode service) accumulates mmap regions
    until the kernel's vm.max_map_count, at which point the NEXT JIT
    allocation fails inside LLVM and the process aborts or segfaults
    (measured here: death at ~64.4K maps with the 65530 default, always at
    ~35% of a cold suite run). Recompiles after a clear are served from
    the persistent on-disk cache as cheap loads.

    Returns True when a clear was performed."""
    if map_region_count() < limit:
        return False
    import jax
    jax.clear_caches()
    return True
