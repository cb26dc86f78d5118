"""Post-processing / field recovery (device-side, plot-free).

Capability parity with the computational parts of the reference's
``src/plots.py``: per-element derivative recovery (``plots.py:5-27``),
centroid stress evaluation + von Mises (``plots.py:177-201``), nodal
displacement magnitudes (``plots.py:154-164``).  Rendering lives in
``plots.py`` (matplotlib, Agg-safe); these functions return arrays so they
also serve tests and metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh.types import TriMesh
from .models.triangle_p1 import TriangleP1
from .ops.elasticity import von_mises_plane_stress

__all__ = [
    "element_centroid_gradients",
    "von_mises_per_element",
    "displacement_magnitude",
    "derivative_1d_per_element",
    "locate_points",
    "evaluate_at_points",
]


def element_centroid_gradients(model: TriangleP1, params, mesh: TriMesh):
    """grad_u at every element centroid [Ne, 2, 2]
    (``src/plots.py:183-187`` analog; for P1 the centroid gradient is the
    element's constant gradient, so this uses the fused per-element path)."""
    _, grad_u = model.element_fields(params, mesh)
    return grad_u


def von_mises_per_element(model: TriangleP1, params, mesh: TriMesh,
                          E: float, nu: float) -> jax.Array:
    """Per-element plane-stress von Mises stress [Ne]
    (``src/plots.py:177-201`` analog — but E, nu are arguments instead of
    the reference's hard-coded constants at ``plots.py:197-198``)."""
    grad_u = element_centroid_gradients(model, params, mesh)
    return von_mises_plane_stress(grad_u, E, nu)


def displacement_magnitude(model: TriangleP1, params, mesh: TriMesh):
    """(per-node ||u|| [N], per-element mean [Ne])
    (``src/plots.py:154-164`` analog)."""
    u = model.u_full(params, mesh)
    u_mag = jnp.sqrt(jnp.sum(u * u, axis=1))
    tri_mean = jnp.mean(u_mag[mesh.connectivity], axis=1)
    return u_mag, tri_mean


def locate_points(coords, connectivity, points):
    """Host-side point location: physical points -> (elem_id, ref coords).

    Neither the reference nor its examples can evaluate the triangular
    model at physical coordinates — its forward takes (reference coords,
    element id) pairs (``src/models.py:316``).  This fills that gap:
    given current node coordinates and query points, find the containing
    triangle (matplotlib's trapezoid-map finder, O(log Ne) per query) and
    the barycentric reference coordinates (xi, eta) matching the model's
    shape-function convention (vertex0 -> xi, vertex1 -> eta).

    Points outside the mesh get elem_id -1 (evaluate_at_points returns
    NaN there).  Pure host preprocessing — keep outside jit.
    """
    import numpy as np
    from matplotlib.tri import Triangulation

    coords = np.asarray(coords, dtype=np.float64)
    conn = np.asarray(connectivity)
    pts = np.asarray(points, dtype=np.float64)
    tri = Triangulation(coords[:, 0], coords[:, 1], conn)
    finder = tri.get_trifinder()
    elem_id = np.asarray(finder(pts[:, 0], pts[:, 1]), dtype=np.int64)

    # barycentric coords w.r.t. (v0, v1, v2): x = v2 + J [xi, eta]^T
    safe = np.maximum(elem_id, 0)
    v = coords[conn[safe]]                     # [M, 3, 2]
    d = pts - v[:, 2]
    ax = v[:, 0, 0] - v[:, 2, 0]
    ay = v[:, 0, 1] - v[:, 2, 1]
    bx = v[:, 1, 0] - v[:, 2, 0]
    by = v[:, 1, 1] - v[:, 2, 1]
    det = ax * by - bx * ay
    det = np.where(np.abs(det) < 1e-300, 1e-300, det)
    xi = (by * d[:, 0] - bx * d[:, 1]) / det
    eta = (-ay * d[:, 0] + ax * d[:, 1]) / det
    ref = np.stack([xi, eta], axis=1)
    return elem_id, ref


def evaluate_at_points(model: TriangleP1, params, mesh: TriMesh, points):
    """Field values u_h at arbitrary physical points [M, 2] -> [M, dim_u]
    (NaN outside the mesh).  Location runs on host; evaluation is the
    model's batched reference-coordinate forward."""
    import numpy as np

    coords = model.coords(params, mesh)
    elem_id, ref = locate_points(np.asarray(coords),
                                 np.asarray(mesh.connectivity), points)
    inside = elem_id >= 0
    u = model.interpolate(params, mesh,
                          jnp.asarray(ref, model.dtype),
                          jnp.asarray(np.maximum(elem_id, 0)))
    u = jnp.where(jnp.asarray(inside)[:, None], u, jnp.nan)
    return u


def derivative_1d_per_element(model, params) -> jax.Array:
    """Per-element du/dx for a 1D model [n_elem] in ONE batched jvp.

    Replaces the reference's per-element Python loop with one
    ``autograd.grad`` call *per element* (``src/plots.py:15-27`` — O(n)
    graph builds, its slowest code) by a single vectorized forward-mode
    evaluation at all element midpoints.
    """
    grid = model.grid(params)
    mid = 0.5 * (grid[:-1] + grid[1:])
    return model.du_dx(params, mid)
