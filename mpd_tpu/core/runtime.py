"""Runtime configuration shared by all CLI entry points."""

from __future__ import annotations

import os


def setup_runtime(cpu: bool = False, cache_dir: str = "/root/.jax_cache") -> None:
    """Configure jax before first use: backend choice + persistent
    compilation cache (first compiles of the fused training scan / guided
    sampler are the dominant cold-start latency; the cache removes them on
    subsequent runs)."""
    import jax

    if cpu:
        # No persistent cache on CPU: AOT entries record host CPU features and
        # a cache shared with the remote-compile terminal can produce
        # machine-mismatch loads (observed "+prefer-no-scatter not supported"
        # warnings / potential SIGILL).
        jax.config.update("jax_platforms", "cpu")
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
