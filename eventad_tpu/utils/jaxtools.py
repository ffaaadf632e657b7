"""JAX runtime helpers shared by the entry points."""
from __future__ import annotations

import os


def setup_compilation_cache(path: str = "/root/.cache/jax_cc"):
    """Persistent compiled-program cache — first compiles of the big fused
    pipeline go over the device tunnel and are expensive; every later process
    reuses them.

    Also honours ``EVENTAD_PLATFORM`` (e.g. ``cpu``): the axon TPU plugin
    ignores ``JAX_PLATFORMS``, so this is the only way to force the entry
    points onto another backend without editing code."""
    import jax
    plat = os.environ.get("EVENTAD_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def setup_debug_nans(enable: bool):
    """TPU analog of the reference's always-on torch detect_anomaly
    (utils/train.py:118) — opt-in here because it inhibits fusion."""
    import jax
    jax.config.update("jax_debug_nans", bool(enable))
