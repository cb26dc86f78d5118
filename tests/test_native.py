"""Native (C++/ctypes) mesh-preprocessing kernels: parity with the numpy
fallbacks.  Skipped when the library has not been built
(``python -m hidenn_fem_tpu.mesh.native --build``)."""

import numpy as np
import pytest

from hidenn_fem_tpu.mesh import native, structured

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native mesh library not built")


def _numpy_unique_edges(cells):
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    e = np.concatenate(
        [cells[:, [0, 1]], cells[:, [1, 2]], cells[:, [2, 0]]], axis=0)
    lo, hi = e.min(axis=1), e.max(axis=1)
    keys = np.unique((lo << 32) | hi)
    return np.stack([keys >> 32, keys & 0xFFFFFFFF], axis=1)


def test_unique_edges_parity():
    _, cells = structured.rectangle_tri_zigzag(40, 25, 2.0, 1.0)
    np.testing.assert_array_equal(native.unique_edges(cells),
                                  _numpy_unique_edges(cells))


def test_incidence_parity():
    from hidenn_fem_tpu.mesh import types
    _, cells = structured.rectangle_tri_zigzag(23, 17, 1.0, 1.0)
    n = 23 * 17
    t_native = native.build_incidence_table(cells, n)
    # numpy reference implementation (bypass the native dispatch)
    flat = np.asarray(cells, dtype=np.int64).reshape(-1)
    order = np.argsort(flat, kind="stable")
    sorted_nodes = flat[order]
    counts = np.bincount(sorted_nodes, minlength=n)
    maxdeg = int(counts.max())
    t_np = np.full((n, maxdeg), -1, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ranks = np.arange(flat.size) - starts[sorted_nodes]
    t_np[sorted_nodes, ranks] = order.astype(np.int32)
    assert t_native.shape == t_np.shape
    np.testing.assert_array_equal(np.sort(t_native, axis=1),
                                  np.sort(t_np, axis=1))


def test_outside_holes_parity():
    pts, _ = structured.rectangle_tri_zigzag(50, 30, 2.0, 1.0)
    holes = [(0.5, 0.7, 0.12), (1.0, 0.3, 0.15)]
    keep_native = native.outside_holes(pts, holes)
    keep_np = np.ones(pts.shape[0], bool)
    for cx, cy, r in holes:
        keep_np &= ((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2) > r * r
    np.testing.assert_array_equal(keep_native, keep_np)


def test_structured_cells_parity():
    """Native triangulation == numpy rectangle_tri_zigzag for every
    variant (same interleaved element order)."""
    import importlib

    for variant in ("up", "down", "zigzag"):
        cells_native = native.structured_cells(31, 17, variant)
        # numpy reference: force the fallback branch by calling the
        # module-level implementation with native dispatch bypassed
        xs = np.arange(31)
        i, j = np.meshgrid(np.arange(30), np.arange(16), indexing="ij")
        i, j = i.ravel(), j.ravel()
        ny = 17
        n00 = i * ny + j
        n10 = (i + 1) * ny + j
        n01 = i * ny + (j + 1)
        n11 = (i + 1) * ny + (j + 1)
        up0 = np.stack([n00, n10, n11], axis=1)
        up1 = np.stack([n00, n11, n01], axis=1)
        dn0 = np.stack([n00, n10, n01], axis=1)
        dn1 = np.stack([n10, n11, n01], axis=1)
        if variant == "up":
            t0, t1 = up0, up1
        elif variant == "down":
            t0, t1 = dn0, dn1
        else:
            even = ((i + j) % 2 == 0)[:, None]
            t0 = np.where(even, up0, dn0)
            t1 = np.where(even, up1, dn1)
        want = np.stack([t0, t1], axis=1).reshape(-1, 3)
        np.testing.assert_array_equal(cells_native, want)


def test_banded_tables_parity():
    """Native banded plan + tables == the numpy builder, including the
    recompute-backward tables, across window limits and block multiples."""
    from hidenn_fem_tpu.mesh import banded, types

    _, cells = structured.rectangle_tri_zigzag(33, 17, 2.0, 1.0,
                                               variant="up")
    n = 33 * 17
    inc = types.build_incidence_table(cells, n)
    for wl, bm in ((300, 1), (800, 8), (150, 1)):
        t = native.banded_tables(cells, n, inc, wl, bm)
        # numpy reference: temporarily disable native dispatch
        old = native._lib
        native._lib = None
        try:
            ba = banded.build_banded_assembly(cells, n, inc,
                                              window_limit=wl,
                                              block_multiple=bm)
        finally:
            native._lib = old
        if ba is None:
            assert t is None, (wl, bm)
            continue
        assert t is not None, (wl, bm)
        np.testing.assert_array_equal(t["starts"], np.asarray(ba.starts))
        np.testing.assert_array_equal(t["conn_rel"],
                                      np.asarray(ba.conn_rel))
        np.testing.assert_array_equal(t["ct_starts"],
                                      np.asarray(ba.ct_starts))
        np.testing.assert_array_equal(t["inc_rel"], np.asarray(ba.inc_rel))
        assert t["wnode"] == ba.wnode and t["wct"] == ba.wct
        if ba.re_conn_rel is not None:
            assert t["re_wnode"] == ba.re_wnode and t["re_ew"] == ba.re_ew
            for k, v in (("re_nstarts", ba.re_nstarts),
                         ("re_estarts", ba.re_estarts),
                         ("re_conn_rel", ba.re_conn_rel),
                         ("re_inc_rel", ba.re_inc_rel)):
                np.testing.assert_array_equal(t[k], np.asarray(v))
        else:
            assert "re_conn_rel" not in t
