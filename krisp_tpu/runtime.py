"""Runtime setup shared by CLIs and benchmarks.

Enables JAX's persistent compilation cache so repeated command-line
invocations don't pay the (tens of seconds) TPU compile latency — the
reference pays an analogous warm-up via GNU sort process spawns, but ours is
cacheable.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    # honor JAX_PLATFORMS even where a site plugin (e.g. the axon TPU
    # terminal) overrides the environment variable during interpreter start
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass

    if cache_dir is None:
        cache_dir = os.environ.get(
            "KRISP_TPU_CACHE",
            str(Path.home() / ".cache" / "krisp_tpu" / "jax_cache"))
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
