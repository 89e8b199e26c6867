"""Persistent XLA compilation cache setup.

Every distinct (rows, width) batch shape compiles its own kernel; without a
persistent cache each process pays ~20s per shape on TPU.  Enabling JAX's
on-disk compilation cache makes repeat searches start hot.  Idempotent; safe
to call from the CLI, the engine, tests, and the bench harness.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache_dir = path or os.environ.get(
        "SWTPU_COMPILE_CACHE", os.path.expanduser("~/.cache/swtpu_jax_cache")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        # Cache is an optimisation only; never fail a search over it.
        pass
