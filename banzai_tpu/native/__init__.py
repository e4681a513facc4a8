"""Native host runtime: C implementations of the byte-serial hot loops.

Compiled on demand with the system C compiler (cc -O3 -shared -fPIC) into a
per-user cache directory and loaded through ctypes — no pybind11/pip
dependency.  Falls back cleanly to the NumPy implementations when no
toolchain is available (the two are differentially tested against each
other)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.environ.get(
    "BANZAI_TPU_NATIVE_CACHE",
    os.path.expanduser("~/.cache/banzai_tpu/native"),
)

_lib = None
_tried = False


def _build() -> ctypes.CDLL | None:
    src = os.path.join(_DIR, "rle1.c")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_CACHE, f"rle1-{tag}.so")
    if not os.path.exists(so):
        os.makedirs(_CACHE, exist_ok=True)
        tmp = so + ".tmp"
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", tmp, src],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
                break
            except Exception:
                continue
        else:
            return None
    lib = ctypes.CDLL(so)
    lib.rle1_block.restype = ctypes.c_int64
    lib.rle1_block.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def get_rle1() -> ctypes.CDLL | None:
    """The native RLE1 library, or None if unavailable."""
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:
            _lib = None
    return _lib


def rle1_block_native(
    lib, data: bytes, offset: int, bound: int
) -> tuple[bytes, int]:
    """Run the native machine for one block; returns (output, consumed)."""
    out = ctypes.create_string_buffer(bound + 8)
    out_len = ctypes.c_int64(0)
    new_i = lib.rle1_block(
        data, len(data), offset, bound, out, ctypes.byref(out_len)
    )
    return out.raw[: out_len.value], int(new_i) - offset
