"""Persistent XLA compile cache (process-wide, idempotent).

The remote-compile relay in this environment takes minutes per new kernel
signature; every entry point that builds jitted kernels calls
:func:`enable_compile_cache` so compilations persist across processes.
Override the location with ``EXPECTO_TPU_CACHE_DIR``; set it empty to
disable.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compile_cache() -> None:
    global _ENABLED
    if _ENABLED:
        return
    cache_dir = os.environ.get("EXPECTO_TPU_CACHE_DIR")
    if cache_dir == "":
        return
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "expecto_tpu_jax")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
    except Exception:
        pass
