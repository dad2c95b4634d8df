"""Native (C++) host kernel loader.

Builds ntt_kernels.cpp into a shared library on first use (g++ -O3) and
exposes it through ctypes. All call sites fall back to pure numpy when
the toolchain is unavailable, so the native layer is an accelerator, not
a dependency."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from typing import Optional

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "ntt_kernels.cpp")
_LIB_PATH = os.path.join(_DIR, "_ntt_kernels.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    # Build into a temp file first so concurrent processes don't race on a
    # half-written .so.
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
        os.close(fd)
        # -ffp-contract=off: no FMA contraction, so float64 folds (the
        # Garner decode Horner loop) are bit-identical to numpy's
        # separate multiply and add.
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off",
             "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except Exception as exc:  # toolchain missing / build failure
        print(f"eva_tpu.native: build failed ({exc}); using numpy fallback",
              file=sys.stderr)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded kernel library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _LIB_PATH
    if (not os.path.exists(path)
            or os.path.getmtime(path) < os.path.getmtime(_SRC)):
        path = _build()
        if path is None:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as exc:
        print(f"eva_tpu.native: load failed ({exc}); using numpy fallback",
              file=sys.stderr)
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    for name, args in {
        "ntt_forward": [u64p, ctypes.c_long, ctypes.c_long, ctypes.c_uint64,
                        u64p, u64p, u64p, u64p],
        "ntt_inverse": [u64p, ctypes.c_long, ctypes.c_long, ctypes.c_uint64,
                        u64p, u64p, u64p, u64p],
        "dyadic_mul": [u64p, u64p, u64p, ctypes.c_long, ctypes.c_uint64],
        "dyadic_mul_acc": [u64p, u64p, u64p, ctypes.c_long, ctypes.c_uint64],
        "dyadic_add": [u64p, u64p, u64p, ctypes.c_long, ctypes.c_uint64],
        "dyadic_sub": [u64p, u64p, u64p, ctypes.c_long, ctypes.c_uint64],
        "divide_round": [u64p, u64p, u64p, ctypes.c_long, ctypes.c_uint64,
                         ctypes.c_uint64, ctypes.c_uint64],
        "garner_decode": [u64p, ctypes.c_long, ctypes.c_long, u64p, u64p,
                          u64p, u64p, ctypes.POINTER(ctypes.c_double)],
    }.items():
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = None
    _lib = lib
    return _lib


def as_u64p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
