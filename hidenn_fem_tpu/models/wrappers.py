"""Reference-style stateful wrappers (migration surface).

A user of the reference drives ``nn.Module`` objects with properties like
``.grid`` / ``.u_full`` / ``.coords`` and calls them directly
(``/root/reference/src/models.py``).  The TPU-native core is pure
init/apply functions over parameter pytrees; these thin wrappers hold the
``(model, params)`` pair and expose the reference's surface so existing
scripts translate 1:1.  They are conveniences — solvers operate on the
functional core (``wrapper.model`` / ``wrapper.params``).

Name note: the reference defines ``PiecewiseLinearShapeNN2D`` twice
(structured at ``src/models.py:93``, triangular at ``:241``; the second
shadows the first — quirk E1).  Here they are distinct:
``PiecewiseLinearShapeNN2DStructured`` and ``PiecewiseLinearShapeNN2D``
(the triangular one keeps the name the reference resolves to at runtime).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.types import TriMesh
from .bilinear2d import Bilinear2D
from .linear1d import Linear1D
from .triangle_p1 import TriangleP1

__all__ = [
    "PiecewiseLinearShapeNN",
    "PiecewiseLinearShapeNN2DStructured",
    "PiecewiseLinearShapeNN2D",
    "NeumannEdgesWrapper",
    "ConnectivityWrapper",
]


class PiecewiseLinearShapeNN:
    """1D model wrapper (``src/models.py:6-90`` surface)."""

    def __init__(self, node_coords, r_adapt=False, u0=None, uN=None):
        self.model, self.params = Linear1D.from_node_coords(
            np.asarray(node_coords), r_adapt=r_adapt, u0=u0, uN=uN)

    @property
    def grid(self):
        return self.model.grid(self.params)

    @property
    def u_full(self):
        return self.model.u_full(self.params)

    def __call__(self, x_eval):
        return self.model.apply(self.params, x_eval)

    forward = __call__


class PiecewiseLinearShapeNN2DStructured:
    """Structured bilinear wrapper (``src/models.py:93-212`` surface —
    the class that is unreachable in the reference due to shadowing)."""

    def __init__(self, grid_x, grid_y, boundary_mask_x=None,
                 boundary_mask_y=None, r_adapt=False, u_fixed=None, seed=0):
        self.model, self.params = Bilinear2D.create(
            np.asarray(grid_x), np.asarray(grid_y),
            boundary_mask_x=boundary_mask_x,
            boundary_mask_y=boundary_mask_y,
            r_adapt=r_adapt, u_fixed=u_fixed, seed=seed)

    @property
    def grid(self):
        return self.model.grid(self.params)

    @property
    def u_full(self):
        return self.model.u_full(self.params)

    def __call__(self, x_eval):
        return self.model.apply(self.params, x_eval)

    forward = __call__


class NeumannEdgesWrapper:
    """Indexable (x_i, x_ip1) view of Neumann-edge endpoint coordinates
    (``src/models.py:214-226`` surface)."""

    def __init__(self, coords, edges):
        self.coords = jnp.asarray(coords)
        self.edges = jnp.asarray(edges)

    def __getitem__(self, idx):
        return (self.coords[self.edges[idx, 0]],
                self.coords[self.edges[idx, 1]])

    def __len__(self):
        return int(self.edges.shape[0])


class ConnectivityWrapper:
    """Indexable [3, 2] triangle-vertex view
    (``src/models.py:228-238`` surface)."""

    def __init__(self, coords, connectivity):
        self.coords = jnp.asarray(coords)
        self.connectivity = jnp.asarray(connectivity)

    def __getitem__(self, idx):
        return self.coords[self.connectivity[idx]]

    def __len__(self):
        return int(self.connectivity.shape[0])


class PiecewiseLinearShapeNN2D:
    """Triangular P1 wrapper (``src/models.py:241-376`` surface — the
    definition the reference actually resolves to at runtime)."""

    def __init__(self, node_coords, connectivity, boundary_mask=None,
                 dirichlet_mask=None, u_fixed=None, neumann_edges=None,
                 seed=0):
        self.mesh = TriMesh.from_arrays(
            coords=np.asarray(node_coords),
            connectivity=np.asarray(connectivity),
            geom_boundary_mask=boundary_mask,
            dirichlet_mask=dirichlet_mask,
            neumann_mask=None,
            neumann_edges=neumann_edges,
        )
        self.model = TriangleP1(
            u_fixed=0.0 if u_fixed is None else float(np.asarray(u_fixed)
                                                      .reshape(-1)[0]))
        self.params = self.model.init(jax.random.PRNGKey(seed), self.mesh)

    # ------------------------------------------------ reference properties
    @property
    def Nnodes(self):
        return self.mesh.n_nodes

    @property
    def Nelems(self):
        return self.mesh.n_elements

    @property
    def N_edges(self):
        return self.mesh.n_neumann_edges

    @property
    def connectivity(self):
        return self.mesh.connectivity

    @property
    def neumann_edges(self):
        return self.mesh.neumann_edges

    @property
    def coords(self):
        return self.model.coords(self.params, self.mesh)

    @property
    def u_full(self):
        return self.model.u_full(self.params, self.mesh)

    @property
    def domain_elements(self):
        return ConnectivityWrapper(self.coords, self.mesh.connectivity)

    @property
    def nm_edges(self):
        return NeumannEdgesWrapper(self.coords, self.mesh.neumann_edges)

    # --------------------------------------------------------- forward
    def __call__(self, x_eval, elem_id, edge=False):
        if edge:
            return self.model.apply_edge(self.params, self.mesh,
                                         jnp.asarray(x_eval).reshape(-1),
                                         elem_id)
        return self.model.apply_domain(self.params, self.mesh, x_eval,
                                       elem_id)

    forward = __call__
