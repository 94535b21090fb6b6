"""ctypes bindings for the native host runtime (native/srt_native.cpp).

The native library accelerates load-time host work (BVH build, OBJ
scanning) the way the reference's C++ runtime does; every entry point
has a pure-Python fallback, so the library is an optimization, never a
requirement. Build with `make -C native` (g++, no dependencies).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.environ.get(
        "SRT_NATIVE_LIB", os.path.join(root, "native", "libsrt_native.so")
    )


def _try_build(path: str) -> None:
    """Build the library on demand (`make -C native`). The binary is NOT
    checked in (a committed .so can go stale vs srt_native.cpp and is
    platform-specific); failure is tolerated — every caller has a pure-
    Python fallback."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(path)],
            capture_output=True, timeout=120, check=False,
        )
    except Exception:
        pass


def load() -> Optional[ctypes.CDLL]:
    """Load (once) and return the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        _try_build(path)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    # ABI guard: a stale .so (e.g. built before the f64 OBJ outputs)
    # would be called through mismatched prototypes and return garbage
    # geometry with rc=0. Rebuild once on mismatch; refuse if still off.
    ABI = 2
    try:
        lib.srt_abi_version.restype = ctypes.c_int32
        lib.srt_abi_version.argtypes = []
        ver = int(lib.srt_abi_version())
    except AttributeError:
        ver = -1
    if ver != ABI:
        try:
            os.remove(path)
        except OSError:
            return None
        _try_build(path)
        # dlopen caches by pathname and the stale handle is still open,
        # so load the rebuilt library through a unique temp copy
        import shutil
        import tempfile

        tmp_name = None
        try:
            with tempfile.NamedTemporaryFile(
                suffix=".so", delete=False
            ) as tmp:
                tmp_name = tmp.name
                shutil.copyfile(path, tmp_name)
            lib = ctypes.CDLL(tmp_name)
            lib.srt_abi_version.restype = ctypes.c_int32
            lib.srt_abi_version.argtypes = []
            if int(lib.srt_abi_version()) != ABI:
                return None
        except (OSError, AttributeError):
            return None
        finally:
            # dlopen keeps the mapping alive on POSIX; unlinking the temp
            # copy immediately avoids leaking one .so per process
            if tmp_name is not None:
                try:
                    os.unlink(tmp_name)
                except OSError:
                    pass
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.srt_bvh_node_count.restype = ctypes.c_int32
    lib.srt_bvh_node_count.argtypes = [ctypes.c_int32]
    lib.srt_build_bvh.restype = ctypes.c_int32
    lib.srt_build_bvh.argtypes = [ctypes.c_int32] + [f32p] * 3 + [f32p] * 2 + [i32p] * 3 + [f32p]
    lib.srt_parse_obj_counts.restype = ctypes.c_int32
    lib.srt_parse_obj_counts.argtypes = [ctypes.c_char_p, ctypes.c_int64, i32p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.srt_parse_obj.restype = ctypes.c_int32
    lib.srt_parse_obj.argtypes = [ctypes.c_char_p, ctypes.c_int64, f64p, f64p, f64p, i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh_native(bb_min: np.ndarray, bb_max: np.ndarray, areas: np.ndarray):
    """Native BVH build; returns the FlatBVH field tuple or None if the
    library is unavailable. Node order and boxes are bit-identical to the
    NumPy builder (tests/test_native.py asserts this)."""
    lib = load()
    if lib is None:
        return None
    n = int(bb_min.shape[0])
    m = lib.srt_bvh_node_count(n)
    bb_min = np.ascontiguousarray(bb_min, np.float32)
    bb_max = np.ascontiguousarray(bb_max, np.float32)
    areas = np.ascontiguousarray(areas, np.float32)
    node_min = np.empty((m, 3), np.float32)
    node_max = np.empty((m, 3), np.float32)
    left = np.empty(m, np.int32)
    right = np.empty(m, np.int32)
    prim = np.empty(m, np.int32)
    area = np.empty(m, np.float32)
    rc = lib.srt_build_bvh(
        n, _fp(bb_min), _fp(bb_max), _fp(areas),
        _fp(node_min), _fp(node_max), _ip(left), _ip(right), _ip(prim), _fp(area),
    )
    if rc != 0:
        return None
    return node_min, node_max, left, right, prim, area


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_obj_native(text: str):
    """Native OBJ scan: returns (positions (P,3) f64, normals (N,3) f64,
    uvs (T,2) f64, corners (C,3) i32 of (v, vt, vn) with -1 absent), or
    None. f64 so downstream normalization/V-flip matches the pure-Python
    scan bit-for-bit before the final f32 cast."""
    lib = load()
    if lib is None:
        return None
    raw = text.encode("utf-8", errors="replace")
    counts = np.zeros(4, np.int32)
    lib.srt_parse_obj_counts(raw, len(raw), _ip(counts))
    np_, nn, nt, nc = (int(x) for x in counts)
    pos = np.empty((np_, 3), np.float64)
    nrm = np.empty((nn, 3), np.float64)
    uv = np.empty((nt, 2), np.float64)
    corners = np.empty((nc, 3), np.int32)
    rc = lib.srt_parse_obj(raw, len(raw), _dp(pos), _dp(nrm), _dp(uv), _ip(corners))
    if rc != 0:
        return None
    return pos, nrm, uv, corners
