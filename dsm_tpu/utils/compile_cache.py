"""Persistent XLA compilation cache for TPU entrypoints.

Remote-tunnelled TPU compiles of the flagship serving steps run for
minutes, and every bench / CLI / tool invocation is a fresh Python
process compiling the exact same programs — so a persistent on-disk
cache turns all but the first invocation's compile into a disk read.

Enabled only when the resolved JAX backend is a TPU: XLA:CPU AOT
executables embed exact host machine-feature lists and reloading them
risks feature-mismatch (up to SIGILL), while CPU compiles are cheap
anyway.  Opt out with ``DSM_COMPILE_CACHE=0``; an explicit
``JAX_COMPILATION_CACHE_DIR`` (stock JAX env var) takes precedence.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/dsm_tpu/jax_cache"


def enable_if_tpu() -> bool:
    """Enable the persistent compilation cache if the backend is a TPU.

    Initialises the JAX backend (cheap if already initialised).  Safe to
    call multiple times.  Returns True when the cache is active.
    Best-effort: backends that cannot serialise executables simply
    ignore the cache at compile time.
    """
    if os.environ.get("DSM_COMPILE_CACHE", "1") in ("0", "false"):
        return False
    try:
        import jax

        if jax.devices()[0].platform != "tpu":
            return False
        if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            path = os.path.expanduser(_DEFAULT_DIR)
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
        # The serving-step compiles we care about are all minutes-long;
        # 5 s keeps tiny helper programs out of the cache.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # pragma: no cover - cache is an optimisation only
        return False
