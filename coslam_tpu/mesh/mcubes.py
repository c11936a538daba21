"""Marching cubes front-end: native C++ library with a numpy fallback.

API parity with the reference extension's entry point
(reference: external/NumpyMarchingCubes/marching_cubes/_mcubes.pyx:19-24):

    marching_cubes(volume, isovalue, truncation) -> (verts [N,3], faces [M,3])

The native library (native/mc.cpp) is compiled on demand with g++ and
loaded through ctypes; if no compiler is available, a pure-numpy
implementation with identical semantics is used (slower; also serves as
a cross-check in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "mc.cpp")
_SRC_RASTER = os.path.join(_HERE, "native", "raster.cpp")
_LIB_PATH = os.path.join(_HERE, "native", "libmc.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_native() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_RASTER))
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < newest_src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, _SRC_RASTER, "-o", _LIB_PATH],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mc_run.restype = ctypes.c_void_p
        lib.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float]
        lib.mc_num_vertices.restype = ctypes.c_int64
        lib.mc_num_vertices.argtypes = [ctypes.c_void_p]
        lib.mc_num_faces.restype = ctypes.c_int64
        lib.mc_num_faces.argtypes = [ctypes.c_void_p]
        lib.mc_copy.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int64)]
        lib.mc_free.argtypes = [ctypes.c_void_p]
        return lib
    except Exception as e:  # compiler missing / failed
        print(f"[mcubes] native build failed ({e}); using numpy fallback")
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build_native()
        return _lib


def marching_cubes(volume: np.ndarray, isovalue: float = 0.0,
                   truncation: float = 3.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract an isosurface from a truncated SDF volume.

    volume: [nx, ny, nz] float; voxels with |v| >= truncation (or
    non-finite) are treated as unobserved and suppress any cell touching
    them. Vertices are returned in voxel-index coordinates.
    """
    volume = np.ascontiguousarray(volume, np.float32)
    lib = _get_lib()
    if lib is not None:
        handle = lib.mc_run(
            volume.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            volume.shape[0], volume.shape[1], volume.shape[2],
            ctypes.c_float(isovalue), ctypes.c_float(truncation))
        try:
            nv = lib.mc_num_vertices(handle)
            nf = lib.mc_num_faces(handle)
            verts = np.empty((nv, 3), np.float32)
            faces = np.empty((nf, 3), np.int64)
            lib.mc_copy(handle,
                        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        finally:
            lib.mc_free(handle)
        return verts, faces
    return _marching_cubes_numpy(volume, isovalue, truncation)


# ---------------------------------------------------------------------------
# Numpy fallback (same semantics, vectorized corner evaluation)
# ---------------------------------------------------------------------------

_EDGE_CORNERS = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 0],
     [4, 5], [5, 6], [6, 7], [7, 4],
     [0, 4], [1, 5], [2, 6], [3, 7]], np.int32)

# Corner order (Bourke): p010 p110 p100 p000 p011 p111 p101 p001 as
# offsets from the cell center in dual-corner grid index space.
_CORNER_OFF = np.array(
    [[-1, 0, -1], [0, 0, -1], [0, -1, -1], [-1, -1, -1],
     [-1, 0, 0], [0, 0, 0], [0, -1, 0], [-1, -1, 0]], np.int32)


def _load_tables():
    """Parse the shared C header so both implementations use one table."""
    import re

    with open(os.path.join(_HERE, "native", "mc_tables.h")) as f:
        src = f.read()
    m = re.search(r"kEdgeTable\[256\]\s*=\s*\{(.*?)\};", src, re.S)
    edge = np.array([int(x, 0) for x in re.findall(r"0x[0-9a-f]+|\d+",
                                                   m.group(1))], np.int32)
    m = re.search(r"kTriTable\[256\]\[16\]\s*=\s*\{(.*?)\};", src, re.S)
    tri = np.array([int(x) for x in re.findall(r"-?\d+", m.group(1))],
                   np.int32).reshape(256, 16)
    return edge, tri


_EDGE_TABLE, _TRI_TABLE = None, None


def _marching_cubes_numpy(volume, isovalue, truncation):
    global _EDGE_TABLE, _TRI_TABLE
    if _EDGE_TABLE is None:
        _EDGE_TABLE, _TRI_TABLE = _load_tables()

    nx, ny, nz = volume.shape
    finite = np.isfinite(volume) & (np.abs(volume) < truncation)

    # Dual corners at half-integer points (u+.5, v+.5, w+.5): mean of the
    # surrounding 2x2x2 voxel block (all trilerp weights are 0.5^3), valid
    # iff all 8 source voxels are valid.
    def block_sum(a):
        return (a[:-1, :-1, :-1] + a[1:, :-1, :-1] + a[:-1, 1:, :-1]
                + a[:-1, :-1, 1:] + a[1:, 1:, :-1] + a[1:, :-1, 1:]
                + a[:-1, 1:, 1:] + a[1:, 1:, 1:])

    corner_val = block_sum(np.where(finite, volume, 0.0)) / 8.0
    corner_valid = block_sum(finite.astype(np.int8)) == 8
    # corner_val[u,v,w] sits at spatial position (u+0.5, v+0.5, w+0.5)

    verts_accum = []
    # Cells i in [1, nx-2]: their 8 dual corners index u in {i-1, i} etc.
    cu = corner_val
    va = corner_valid
    # Gather the 8 corner values per cell [X, Y, Z, 8]
    Xs, Ys, Zs = nx - 2, ny - 2, nz - 2
    if Xs <= 0 or Ys <= 0 or Zs <= 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    vals = np.empty((Xs, Ys, Zs, 8), np.float32)
    valid = np.ones((Xs, Ys, Zs), bool)
    for c in range(8):
        du, dv, dw = _CORNER_OFF[c] + 1  # cell i=1 -> u = i-1+off in {0,1}
        vals[..., c] = cu[du:du + Xs, dv:dv + Ys, dw:dw + Zs]
        valid &= va[du:du + Xs, dv:dv + Ys, dw:dw + Zs]

    cubeindex = ((vals < isovalue) << np.arange(8)).sum(-1)
    thresh = 10.0
    # Pairwise consistency rejection.
    ok = valid & (np.abs(vals) <= thresh).all(-1)
    a = vals[..., :, None]
    b = vals[..., None, :]
    opp = (a * b) < 0
    bad = np.where(opp, np.abs(a) + np.abs(b) > thresh,
                   np.abs(a - b) > thresh).any((-1, -2))
    ok &= ~bad
    active = ok & (_EDGE_TABLE[cubeindex] != 0) & (_EDGE_TABLE[cubeindex] != 255)

    idxs = np.argwhere(active)
    for (ii, jj, kk) in idxs:
        i, j, k = ii + 1, jj + 1, kk + 1
        d = vals[ii, jj, kk]
        ci = cubeindex[ii, jj, kk]
        # Corner positions in volume coordinates.
        pos = np.array([i, j, k], np.float32) + \
            (_CORNER_OFF.astype(np.float32) + 0.5)
        edges = _EDGE_TABLE[ci]
        vertlist = np.zeros((12, 3), np.float32)
        for e in range(12):
            if edges & (1 << e):
                ca, cb = _EDGE_CORNERS[e]
                d1, d2 = d[ca], d[cb]
                if abs(isovalue - d1) < 1e-5 or abs(d1 - d2) < 1e-5:
                    vertlist[e] = pos[ca]
                elif abs(isovalue - d2) < 1e-5:
                    vertlist[e] = pos[cb]
                else:
                    mu = (isovalue - d1) / (d2 - d1)
                    vertlist[e] = pos[ca] + mu * (pos[cb] - pos[ca])
        row = _TRI_TABLE[ci]
        for t in range(0, 16, 3):
            if row[t] == -1:
                break
            verts_accum.append(vertlist[row[t]])
            verts_accum.append(vertlist[row[t + 1]])
            verts_accum.append(vertlist[row[t + 2]])

    if not verts_accum:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tri_verts = np.asarray(verts_accum, np.float32)
    return _merge_vertices(tri_verts, 1e-5)


def _merge_vertices(tri_verts: np.ndarray, thresh: float):
    """Spatial-hash vertex merge + dedup/degenerate face removal (numpy)."""
    keys = np.round(tri_verts / thresh).astype(np.int64)
    _, first_idx, inverse = np.unique(keys, axis=0, return_index=True,
                                      return_inverse=True)
    verts = tri_verts[first_idx]
    faces = inverse.reshape(-1, 3)
    # remove degenerate
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    faces = faces[good]
    # remove duplicates (orientation-insensitive)
    sf = np.sort(faces, axis=1)
    _, uniq = np.unique(sf, axis=0, return_index=True)
    faces = faces[np.sort(uniq)]
    return verts.astype(np.float32), faces.astype(np.int64)
