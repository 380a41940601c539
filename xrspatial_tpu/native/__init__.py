"""Native (C++) host-side kernels, built on demand with the system g++.

The reference compiles its host hot loops with Numba (`@ngjit`); the
TPU build's device path is XLA/Pallas, and the host-sequential ops that
cannot go on device (A*'s priority-queue loop, pathfinding.py:68-230)
get the same native treatment here: a small C++ shared library compiled
once into ``<package>/native/_build/`` and loaded via ctypes.  Pure-JAX/
numpy fallbacks always remain, so a missing/failing toolchain degrades
gracefully (set ``XRSPATIAL_NO_NATIVE=1`` to force the fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()
_CACHE: dict = {}


def _compile(name: str) -> str:
    """Compile ``<name>.cpp`` into ``_build/lib<name>.so``; return path."""
    src = os.path.join(_HERE, f"{name}.cpp")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)  # atomic: parallel test workers may race here
    return out


def _load(name: str):
    if os.environ.get("XRSPATIAL_NO_NATIVE") == "1":
        return None
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        try:
            lib = ctypes.CDLL(_compile(name))
        except Exception as e:  # no g++ / sandboxed fs / bad toolchain
            print(f"xrspatial_tpu: native '{name}' unavailable "
                  f"({type(e).__name__}); using python fallback",
                  file=sys.stderr)
            lib = None
        _CACHE[name] = lib
        return lib


def get_astar():
    """ctypes handle to ``xrspatial_astar`` or None (use python fallback)."""
    lib = _load("astar")
    if lib is None:
        return None
    fn = lib.xrspatial_astar
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # blocked
        ctypes.c_int64, ctypes.c_int64,   # h, w
        ctypes.c_int64, ctypes.c_int64,   # start y, x
        ctypes.c_int64, ctypes.c_int64,   # goal y, x
        ctypes.c_int32,                   # connectivity
        ctypes.POINTER(ctypes.c_double),  # d_from_start (inf-filled)
        ctypes.POINTER(ctypes.c_int64),   # path_out
        ctypes.POINTER(ctypes.c_int64),   # path_len
    ]
    return fn
