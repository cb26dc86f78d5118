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
