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


def _cpu_flags() -> bytes:
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    return line
    except OSError:
        pass
    return b""


def enable_compile_cache(path: str | None = None) -> None:
    global _done
    if _done and path is None:
        return                      # idempotent default application
    # An explicit path always re-applies (the pipeline import runs the
    # default first; a user's later call must not be silently ignored).
    _done = True
    try:
        import jax

        cache = (
            path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_CACHE
        )
        # XLA:CPU caches AOT machine code; loading entries compiled on a
        # different host CPU can SIGILL.  Key the directory by a machine
        # fingerprint so caches never cross hosts.
        import hashlib
        import platform

        fp = hashlib.sha256(
            (platform.machine() + platform.processor()).encode()
            + _cpu_flags()
        ).hexdigest()[:12]
        cache = os.path.join(cache, fp)
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        # Cache-key determinism: with full tracebacks on, every MLIR
        # location embeds the whole Python call stack — including the
        # ENTRY SCRIPT's path and line numbers.  The cache key strips
        # debug info from the outer module, but the Pallas kernel rides
        # inside an opaque serialized Mosaic payload whose locations
        # survive canonicalization, so the same pipeline launched from
        # bench.py / the CLI / a notebook hashed to different keys and
        # each paid a multi-minute remote TPU compile.  Innermost-frame
        # locations keep file:line profiling attribution while making
        # the key a function of the traced code only.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass  # cache is an optimization only
