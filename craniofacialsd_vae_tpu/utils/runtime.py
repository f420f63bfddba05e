"""Runtime setup shared by the CLI entry points.

Two facts about this machine's tunneled TPU drive the design:
  * XLA compiles run through a remote helper with high, variable latency →
    a persistent on-disk compilation cache makes second runs start in
    seconds instead of minutes;
  * a device→host sync costs ~1.8 s round-trip → hot loops must dispatch
    asynchronously and sync at most once per epoch (see
    ModelManager.run_epoch).
"""

from __future__ import annotations

import os

__all__ = ["setup_jax"]


def setup_jax(cache_dir: str | None = None, platform: str | None = None):
    """Configure the JAX runtime: persistent compilation cache + optional
    platform override (the axon plugin ignores JAX_PLATFORMS, so tests and
    CPU-only tools must use jax.config)."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax
