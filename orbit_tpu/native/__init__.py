"""Native (C++) asset-pipeline acceleration, loaded via ctypes.

The compute path of the renderer is all JAX/Pallas on the TPU; this module
covers the host-side baking hot loops (the role meshopt/rayon play in the
reference). Compiled lazily on first use; every entry point has a pure
numpy/Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = Path(__file__).parent / "meshproc.cpp"
    out = Path(__file__).parent / "libmeshproc.so"
    try:
        if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    str(src), "-o", str(out),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(out))
        lib.build_meshlets.restype = ctypes.c_int
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _lib = _build_and_load()
            _tried = True
        return _lib


def build_meshlets_native(
    positions, indices, tri_material, max_verts, max_tris
):
    """C++ meshletizer; returns dict of arrays or None if unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.uint32).reshape(-1)
    n_tris = len(indices) // 3
    cap = max(n_tris, 1)
    tm = (
        np.ascontiguousarray(tri_material, np.int32)
        if tri_material is not None
        else None
    )
    mv = np.zeros((cap, max_verts), np.int32)
    mt = np.zeros((cap, max_tris, 3), np.int8)
    vc = np.zeros(cap, np.int32)
    tc = np.zeros(cap, np.int32)
    sph = np.zeros((cap, 4), np.float32)
    cone = np.zeros((cap, 4), np.float32)
    mat = np.zeros(cap, np.int32)

    c_ptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    n = lib.build_meshlets(
        c_ptr(positions, ctypes.c_float),
        ctypes.c_int32(len(positions)),
        c_ptr(indices, ctypes.c_uint32),
        ctypes.c_int32(n_tris),
        c_ptr(tm, ctypes.c_int32) if tm is not None else None,
        ctypes.c_int32(max_verts),
        ctypes.c_int32(max_tris),
        ctypes.c_int32(cap),
        c_ptr(mv, ctypes.c_int32),
        c_ptr(mt, ctypes.c_int8),
        c_ptr(vc, ctypes.c_int32),
        c_ptr(tc, ctypes.c_int32),
        c_ptr(sph, ctypes.c_float),
        c_ptr(cone, ctypes.c_float),
        c_ptr(mat, ctypes.c_int32),
    )
    return dict(
        count=n, vertices=mv[:n], triangles=mt[:n], vcount=vc[:n],
        tcount=tc[:n], sphere=sph[:n], cone=cone[:n], material=mat[:n],
    )


def qem_simplify_native(positions, indices, target_tris, tri_material=None):
    """C++ QEM half-edge-collapse simplification with border locking.

    Returns (remap [V] i32, new_indices u32, new_tri_material | None) in
    the same convention as assets.lod.simplify (all LODs share the
    original vertex buffer), or None when the library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None or not hasattr(lib, "qem_simplify"):
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.uint32).reshape(-1)
    n_verts = len(positions)
    n_tris = len(indices) // 3
    tm = (
        np.ascontiguousarray(tri_material, np.int32)
        if tri_material is not None
        else None
    )
    remap = np.zeros(n_verts, np.int32)
    out_idx = np.zeros(n_tris * 3, np.uint32)
    out_mat = np.zeros(max(n_tris, 1), np.int32)

    c_ptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.qem_simplify.restype = ctypes.c_int
    n = lib.qem_simplify(
        c_ptr(positions, ctypes.c_float),
        ctypes.c_int32(n_verts),
        c_ptr(indices, ctypes.c_uint32),
        ctypes.c_int32(n_tris),
        c_ptr(tm, ctypes.c_int32) if tm is not None else None,
        ctypes.c_int32(int(target_tris)),
        c_ptr(remap, ctypes.c_int32),
        c_ptr(out_idx, ctypes.c_uint32),
        c_ptr(out_mat, ctypes.c_int32),
    )
    new_idx = out_idx[: n * 3].copy()
    new_mat = out_mat[:n].copy() if tm is not None else None
    return remap, new_idx, new_mat
