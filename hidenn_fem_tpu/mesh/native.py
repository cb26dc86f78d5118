"""ctypes bindings to the native mesh-preprocessing library.

The numpy implementations in ``structured.py`` / ``types.py`` are the
always-available fallback; this module loads ``libhdnn_mesh.so`` (built
from ``csrc/mesh_kernels.cpp``) when present and exposes the accelerated
versions with identical contracts.

Build (one-time, a few seconds):

    python -m hidenn_fem_tpu.mesh.native --build

The library lands in ``csrc/build/libhdnn_mesh.so``; ``available()``
reports whether it loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

__all__ = ["available", "build", "unique_edges", "build_incidence_table",
           "outside_holes"]

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "mesh_kernels.cpp")
_LIB_PATH = os.path.join(_ROOT, "csrc", "build", "libhdnn_mesh.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.path.exists(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.hdnn_unique_edges.restype = ctypes.c_int
            lib.hdnn_node_degrees.restype = ctypes.c_int
            lib.hdnn_incidence.restype = ctypes.c_int
            lib.hdnn_outside_holes.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build(verbose: bool = True) -> str:
    """Compile the native library with g++ (no external deps)."""
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB_PATH, _SRC]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    global _tried, _lib
    _tried = False
    _lib = None
    assert available(), "native library built but failed to load"
    return _LIB_PATH


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def unique_edges(cells: np.ndarray) -> np.ndarray:
    """Native unique undirected edges [E, 2] (int64 for parity with the
    numpy path)."""
    lib = _load()
    conn = _as_i32(cells)
    ne = conn.shape[0]
    out = np.empty((ne * 3, 2), dtype=np.int32)
    count = np.zeros(1, dtype=np.int64)
    rc = lib.hdnn_unique_edges(
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(ne),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert rc == 0
    return out[: int(count[0])].astype(np.int64)


def build_incidence_table(connectivity: np.ndarray, n_nodes: int
                          ) -> np.ndarray:
    """Native node->flat-connectivity incidence table (-1 padded); same
    contract as ``mesh.types.build_incidence_table``."""
    lib = _load()
    conn = _as_i32(connectivity)
    ne = conn.shape[0]
    degrees = np.empty(n_nodes, dtype=np.int32)
    conn_ptr = conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.hdnn_node_degrees(
        conn_ptr, ctypes.c_int64(ne), ctypes.c_int64(n_nodes),
        degrees.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert rc == 0
    maxdeg = int(degrees.max()) if n_nodes else 0
    table = np.empty((n_nodes, maxdeg), dtype=np.int32)
    rc = lib.hdnn_incidence(
        conn_ptr, ctypes.c_int64(ne), ctypes.c_int64(n_nodes),
        ctypes.c_int64(maxdeg),
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert rc == 0
    return table


def outside_holes(points: np.ndarray, holes) -> np.ndarray:
    """keep mask: True where the point lies outside every hole disk."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    hl = np.ascontiguousarray(np.asarray(holes, dtype=np.float64)
                              .reshape(-1, 3))
    keep = np.empty(pts.shape[0], dtype=np.uint8)
    rc = lib.hdnn_outside_holes(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(pts.shape[0]),
        hl.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(hl.shape[0]),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert rc == 0
    return keep.astype(bool)


if __name__ == "__main__":
    if "--build" in sys.argv:
        print("built:", build())
    else:
        print("available:", available())
