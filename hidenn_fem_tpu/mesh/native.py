"""ctypes bindings to the native mesh-preprocessing library.

The numpy implementations in ``structured.py`` / ``types.py`` are the
always-available fallback; this module loads ``libhdnn_mesh.so`` (built
from ``csrc/mesh_kernels.cpp``) when present and exposes the accelerated
versions with identical contracts.

Build (one-time, a few seconds):

    python -m hidenn_fem_tpu.mesh.native --build

The library lands in ``csrc/build/libhdnn_mesh.so``; ``available()``
reports whether it loaded.  Set ``HDNN_NO_NATIVE=1`` to force the
numpy fallbacks even when the library exists (debugging aid; also the
quickest way to rule native code in or out of a crash).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

__all__ = ["available", "build", "unique_edges", "build_incidence_table",
           "outside_holes", "structured_cells", "banded_tables",
           "greedy_color"]

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
    if os.environ.get("HDNN_NO_NATIVE"):
        _lib = None
        return None
    if os.path.exists(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.hdnn_unique_edges.restype = ctypes.c_int
            lib.hdnn_node_degrees.restype = ctypes.c_int
            lib.hdnn_incidence.restype = ctypes.c_int
            lib.hdnn_outside_holes.restype = ctypes.c_int
            lib.hdnn_structured_cells.restype = ctypes.c_int
            lib.hdnn_greedy_color.restype = ctypes.c_int
            lib.hdnn_greedy_match.restype = ctypes.c_int
            lib.hdnn_banded_plan.restype = ctypes.c_int
            lib.hdnn_banded_fill.restype = ctypes.c_int
            _lib = lib
        except (OSError, AttributeError):
            # AttributeError: a stale prebuilt .so from an older checkout
            # is missing a newer symbol — fall back to numpy rather than
            # crash the first native call (rebuild with
            # `python -m hidenn_fem_tpu.mesh.native --build`)
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


def greedy_color(connectivity: np.ndarray, n_nodes: int) -> np.ndarray:
    """Native greedy node coloring of the element-edge adjacency graph
    (same order/tie-breaks as the numpy fallback in ``coloring.py``)."""
    lib = _load()
    conn = _as_i32(connectivity)
    ne = conn.shape[0]
    colors = np.empty(n_nodes, dtype=np.int32)
    n_colors = np.zeros(1, dtype=np.int32)
    rc = lib.hdnn_greedy_color(
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(ne), ctypes.c_int64(n_nodes),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert rc == 0
    return colors


def greedy_match(a: np.ndarray, b: np.ndarray, ne: int):
    """Native sequential first-come greedy maximal matching (exactly the
    pure-Python fallback loop in ``banded._greedy_match``)."""
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)
    accept = np.zeros(a.shape[0], dtype=np.uint8)
    matched = np.zeros(ne, dtype=np.uint8)
    rc = lib.hdnn_greedy_match(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(a.shape[0]), ctypes.c_int64(ne),
        accept.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        matched.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert rc == 0
    return accept.astype(bool), matched.astype(bool)


def structured_cells(nx: int, ny: int, variant: str = "zigzag"
                     ) -> np.ndarray:
    """Native structured triangulation; same interleaved order as
    ``structured.rectangle_tri_zigzag`` (int32 cells)."""
    lib = _load()
    v = {"up": 0, "down": 1, "zigzag": 2}[variant]
    cells = np.empty((2 * (nx - 1) * (ny - 1), 3), dtype=np.int32)
    rc = lib.hdnn_structured_cells(
        ctypes.c_int64(nx), ctypes.c_int64(ny), ctypes.c_int(v),
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert rc == 0
    return cells


def banded_tables(connectivity: np.ndarray, n_nodes: int,
                  incidence: np.ndarray, window_limit: int,
                  block_multiple: int = 1):
    """Native banded-assembly build: same plan + tables as the numpy
    ``mesh.banded.build_banded_assembly`` internals.

    Returns None if not bandable, else a dict with the fwd/bwd/recompute
    arrays and static sizes (recompute keys absent if those tables do not
    fit the window limit).
    """
    lib = _load()
    conn = _as_i32(connectivity)
    inc = _as_i32(incidence)
    ne = conn.shape[0]
    maxdeg = inc.shape[1]
    plan = np.zeros(12, dtype=np.int64)
    c_i64 = ctypes.c_int64
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.hdnn_banded_plan(
        i32p(conn), c_i64(ne), i32p(inc), c_i64(n_nodes), c_i64(maxdeg),
        c_i64(window_limit), c_i64(block_multiple),
        plan.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        return None
    b, eb, wnode, bn, nb, wct, br, nbr, ew, wn, has_re, _ = (
        int(x) for x in plan)
    starts = np.empty(b, np.int32)
    conn_rel = np.empty((b, eb, 3), np.int32)
    ct_starts = np.empty(bn, np.int32)
    inc_rel = np.empty((bn, nb, maxdeg), np.int32)
    if has_re:
        re_nstarts = np.empty(br, np.int32)
        re_estarts = np.empty(br, np.int32)
        re_conn_rel = np.empty((br, ew, 3), np.int32)
        re_inc_rel = np.empty((br, nbr, maxdeg), np.int32)
    else:
        re_nstarts = re_estarts = np.empty(0, np.int32)
        re_conn_rel = np.empty((0, 1, 3), np.int32)
        re_inc_rel = np.empty((0, 1, maxdeg), np.int32)
    rc = lib.hdnn_banded_fill(
        i32p(conn), c_i64(ne), i32p(inc), c_i64(n_nodes), c_i64(maxdeg),
        plan.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        i32p(starts), i32p(conn_rel), i32p(ct_starts), i32p(inc_rel),
        i32p(re_nstarts), i32p(re_estarts), i32p(re_conn_rel),
        i32p(re_inc_rel))
    assert rc == 0
    out = dict(starts=starts, conn_rel=conn_rel, ct_starts=ct_starts,
               inc_rel=inc_rel, wnode=wnode, wct=wct)
    if has_re:
        out.update(re_nstarts=re_nstarts, re_estarts=re_estarts,
                   re_conn_rel=re_conn_rel, re_inc_rel=re_inc_rel,
                   re_wnode=wn, re_ew=ew)
    return out


if __name__ == "__main__":
    if "--build" in sys.argv:
        print("built:", build())
    else:
        print("available:", available())
