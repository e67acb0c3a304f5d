"""Persistent XLA compilation cache (first compile of the fused perception
graph is expensive; cache it across processes)."""

import os


def enable(path: str | None = None) -> None:
    import jax

    cache = path or os.environ.get(
        "SV_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # Near-zero threshold: on the 1-core host even "small" compiles are
    # seconds, and the test suite is dominated by hundreds of them.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
