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
