"""JAX runtime configuration helpers.

TPU compiles of the fused block pipeline take minutes through a remote
compile service; the persistent compilation cache makes every process after
the first start instantly.  Applied on pipeline import (idempotent).
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = "/root/jaxcache" if os.path.isdir("/root/jaxcache") else (
    os.path.expanduser("~/.cache/banzai_tpu/jax")
)
_done = False


def enable_compile_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        cache = (
            path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_CACHE
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # cache is an optimization only
