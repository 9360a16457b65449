"""Build-on-first-use loader for the native components.

Compiles native/*.cpp into shared objects under native/build/ with g++,
keyed by source mtime; falls back gracefully (native_available() == False)
when no toolchain is present so the pure-numpy paths keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "build")
_LIB = {}


def _compile(src: str, out: str) -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load(name: str):
    if name in _LIB:
        return _LIB[name]
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD, f"lib{name}.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        if not _compile(src, out):
            _LIB[name] = None
            return None
    try:
        _LIB[name] = ctypes.CDLL(out)
    except OSError:
        _LIB[name] = None
    return _LIB[name]


def get_bvh_lib():
    """The BVH builder library with argtypes set, or None."""
    lib = _load("bvh_builder")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        import numpy.ctypeslib as npc
        import numpy as np

        lib.bvh_build.restype = ctypes.c_int64
        lib.bvh_build.argtypes = [
            npc.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # tris (T,9)
            ctypes.c_int64,                                    # T
            ctypes.c_int,                                      # leaf_size
            ctypes.c_int64,                                    # cap
            npc.ndpointer(np.float32, flags="C_CONTIGUOUS"),   # bb_min
            npc.ndpointer(np.float32, flags="C_CONTIGUOUS"),   # bb_max
            npc.ndpointer(np.int32, flags="C_CONTIGUOUS"),     # first
            npc.ndpointer(np.int32, flags="C_CONTIGUOUS"),     # count
            npc.ndpointer(np.int32, flags="C_CONTIGUOUS"),     # skip
            npc.ndpointer(np.int32, flags="C_CONTIGUOUS"),     # perm
            ctypes.c_int,                                      # method
        ]
        lib._configured = True
    return lib


def native_available() -> bool:
    return get_bvh_lib() is not None
