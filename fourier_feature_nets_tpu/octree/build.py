"""Builds and loads the native octree kernels.

The C++ source compiles once per machine into a cached shared library
(g++ -O3); all call sites fall back to the vectorized NumPy
implementation (:mod:`.host_numpy`) when no compiler is available.
"""

import ctypes
import os
import subprocess
import sys

__all__ = ["load_library"]

_CACHED = None
_FAILED = False


def _lib_path() -> str:
    # ".so.lib" suffix: loadable by ctypes but NOT importable as a
    # Python extension module (pkgutil walks would otherwise try)
    src_dir = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(src_dir, f"octree_native_{sys.platform}.so.lib")


def _source_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "csrc", "octree.cpp")


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.c_int64
    f32 = ctypes.c_float
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_f32 = ctypes.POINTER(ctypes.c_float)
    p_f64 = ctypes.POINTER(ctypes.c_double)

    lib.octree_build.restype = i64
    lib.octree_build.argtypes = [p_f32, i64, p_f64, i64,
                                 ctypes.c_int, i64, f32]
    lib.octree_counts.restype = None
    lib.octree_counts.argtypes = [i64, p_i64, p_i64, p_i64]
    lib.octree_export.restype = None
    lib.octree_export.argtypes = [i64, p_i64, p_i64, p_f64]
    lib.octree_release.restype = None
    lib.octree_release.argtypes = [i64]
    lib.octree_batch_query.restype = None
    lib.octree_batch_query.argtypes = [f32, p_i64, i64, p_i64, i64,
                                       p_f32, i64, p_i64]
    lib.octree_batch_intersect.restype = None
    lib.octree_batch_intersect.argtypes = [f32, p_i64, i64, p_i64, i64,
                                           p_f32, p_f32, i64, i64,
                                           p_f32, p_i64]
    lib.octree_decode_ids.restype = None
    lib.octree_decode_ids.argtypes = [p_i64, i64, f32, p_f32, p_i32]
    return lib


def load_library():
    """Returns the native library, compiling it on first use, or None
    when compilation is impossible."""
    global _CACHED, _FAILED
    if _CACHED is not None:
        return _CACHED
    if _FAILED:
        return None

    lib_path = _lib_path()
    src_path = _source_path()
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src_path)):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", src_path, "-o", lib_path],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as error:
            print(f"octree: native build unavailable ({error}); "
                  "using NumPy fallback", file=sys.stderr)
            _FAILED = True
            return None

    _CACHED = _declare(ctypes.CDLL(lib_path))
    return _CACHED
