"""Unstructured P1-triangle FE interpolant (vector field, r-adaptive).

Capability parity with the reference's second ``PiecewiseLinearShapeNN2D``
(``/root/reference/src/models.py:241-376``) — linear triangle elements over
an explicit connectivity table with a 2-component displacement field —
redesigned TPU-first:

* **Masked full-size parameters instead of boolean scatter.** The reference
  splits free/fixed nodes into separate tensors and scatters them back each
  call (``src/models.py:256-305``); that is dynamic-shape-hostile.  Here
  ``params`` hold *full* [N, 2] arrays and fixed entries are pinned with
  ``jnp.where`` against the mesh masks — static shapes, identical gradients
  on free entries, zero gradients on pinned entries (so any first-order
  optimizer leaves them untouched).
* **Closed-form 2x2 Jacobian algebra.** The reference calls
  ``torch.linalg.det/inv`` on [M,2,2] batches (``src/models.py:336-343``);
  we write the determinant/adjugate by hand so XLA fuses the whole element
  kernel into one elementwise pass (no batched LAPACK-ish op).
* Element-reference input contract kept: ``apply_domain(params, mesh,
  x_ref[M,2], elem_id[M]) -> (u_h[M,2], detJ[M], grad_u[M,2,2])`` matching
  ``src/models.py:316-357``; edge path ``apply_edge`` matching
  ``src/models.py:359-376``.
* The reference's conditional-buffer crashes (quirk E4: ``u_fixed`` /
  ``neumann_edges`` unset -> AttributeError, ``src/models.py:275-282``) are
  fixed: all optional fields are always defined.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..mesh.types import TriMesh

__all__ = ["TriangleP1"]

_EPS_DET = 1e-12  # detJ division guard; healthy meshes are unaffected


@dataclasses.dataclass(frozen=True)
class TriangleP1:
    """Static config for the P1 triangular model.

    Attributes:
      dim_u: field components (2 for plane elasticity, as the reference's
        ``dim_u`` at ``src/models.py:247``).
      u_fixed: prescribed value on Dirichlet nodes (scalar broadcast or
        per-component tuple); reference ``src/models.py:276-277``.
      init_scale: stddev of the random nodal-value init
        (reference ``scale = 1e-5``, ``src/models.py:245``).
      dtype: compute dtype.
    """

    dim_u: int = 2
    u_fixed: float = 0.0
    init_scale: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # "exact": correct chain rule dN/dx = J^{-T} @ D_N.
    # "reference": reproduce the reference's Jacobian-transpose quirk
    #   (``src/models.py:351`` computes J^{-1} @ D_N although J = dx/dxi,
    #   so dxi/dx must enter transposed; wrong strain on any element whose
    #   Jacobian is non-symmetric — verified by the linear patch test).
    compat: str = "exact"

    # ---------------------------------------------------------------- init
    def init(self, key, mesh: TriMesh) -> dict:
        """Initial parameters: full-size coords (at mesh positions) and
        small-random nodal values (``src/models.py:261, 274`` analogs)."""
        n = mesh.n_nodes
        u0 = self.init_scale * jax.random.normal(
            key, (n, self.dim_u), dtype=self.dtype)
        return {
            "coords": jnp.asarray(mesh.coords, dtype=self.dtype),
            "u": u0,
        }

    # ------------------------------------------------------------- getters
    def coords(self, params, mesh: TriMesh) -> jax.Array:
        """Current node coordinates [N,2]; geometric-boundary nodes pinned
        to their initial positions (``src/models.py:293-297`` analog)."""
        pin = mesh.geom_boundary_mask[:, None]
        return jnp.where(pin, jnp.asarray(mesh.coords, self.dtype),
                         params["coords"])

    def u_full(self, params, mesh: TriMesh) -> jax.Array:
        """Nodal field [N, dim_u]; Dirichlet nodes pinned to ``u_fixed``
        (``src/models.py:299-305`` analog).  ``u_fixed`` may be a scalar,
        a [dim_u] vector, or a full [N, dim_u] per-node table (the
        reference passes full-size tensors, ``src/models.py:266-277``)."""
        fixed = jnp.broadcast_to(
            jnp.asarray(self.u_fixed, self.dtype),
            (mesh.n_nodes, self.dim_u))
        return jnp.where(mesh.dirichlet_mask[:, None], fixed, params["u"])

    def packed_nodes(self, params, mesh: TriMesh) -> jax.Array:
        """All nodal data as ONE [N, 4] array (cx, cy, ux, uy) with both BC
        pinnings applied.

        TPU hot-path layout: one wide array means the element kernels do a
        *single* connectivity gather ([Ne, 3, 4]) instead of four separate
        [N, 2]-row gathers — TPU gathers run at ~1 row/cycle, so halving
        the row count halves the dominant assembly cost.
        """
        coords = self.coords(params, mesh)
        u = self.u_full(params, mesh)
        return jnp.concatenate([coords, u], axis=1)

    # ----------------------------------------------------- element algebra
    @staticmethod
    def _jacobian(v0, v1, v2):
        """detJ and row-major J^{-1} entries for J = [v0-v2 | v1-v2].

        Closed form replaces ``torch.linalg.det/inv``
        (``src/models.py:339-343``):  J = [[ax, bx], [ay, by]] with
        a = v0-v2, b = v1-v2;  J^{-1} = adj(J)/det.
        """
        ax = v0[..., 0] - v2[..., 0]
        ay = v0[..., 1] - v2[..., 1]
        bx = v1[..., 0] - v2[..., 0]
        by = v1[..., 1] - v2[..., 1]
        det = ax * by - bx * ay
        safe = jnp.where(jnp.abs(det) < _EPS_DET,
                         jnp.where(det < 0, -_EPS_DET, _EPS_DET), det)
        inv = 1.0 / safe
        # J^{-1} = [[by, -bx], [-ay, ax]] / det
        return det, (by * inv, -bx * inv, -ay * inv, ax * inv)

    def _dN_dx(self, jinv):
        """Material shape-function gradients dN_a/dx_j, a in {0,1,2}.

        With the barycentric shape functions N = (xi, eta, 1-xi-eta) and
        local-derivative operator D_N = [[1, 0, -1], [0, 1, -1]]
        (``src/models.py:347-348``), the chain rule gives
        dN_a/dx_j = sum_k D_N[k, a] * (dxi_k/dx_j) = (J^{-T} D_N)[j, a]:
        dN0 = row 0 of J^{-1}, dN1 = row 1, dN2 = -(dN0 + dN1).

        ``compat="reference"`` instead uses the *columns* of J^{-1},
        reproducing the reference's transpose quirk (``src/models.py:351``).
        """
        i00, i01, i10, i11 = jinv
        if self.compat == "reference":
            dN0x, dN1x = i00, i01
            dN0y, dN1y = i10, i11
        else:
            dN0x, dN1x = i00, i10
            dN0y, dN1y = i01, i11
        # ((dN0/dx, dN1/dx, dN2/dx), (dN0/dy, dN1/dy, dN2/dy))
        return ((dN0x, dN1x, -(dN0x + dN1x)),
                (dN0y, dN1y, -(dN0y + dN1y)))

    # ------------------------------------------------------------- forward
    def apply_domain(self, params, mesh: TriMesh, x_ref, elem_id
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Evaluate at reference coords (xi, eta) inside elements.

        Args:
          x_ref: [M, 2] points in the reference triangle.
          elem_id: [M] int element ids.
        Returns:
          (u_h [M, dim_u], detJ [M], grad_u [M, dim_u, 2]) — the reference
          forward contract (``src/models.py:316-357``).
        """
        x_ref = jnp.asarray(x_ref, self.dtype)
        coords = self.coords(params, mesh)
        u = self.u_full(params, mesh)

        from ..ops.assembly import flat_gather
        conn = mesh.connectivity[elem_id]           # [M, 3]
        v = flat_gather(coords, conn)               # [M, 3, 2]
        u_nodes = flat_gather(u, conn)              # [M, 3, dim_u]

        xi = x_ref[:, 0]
        eta = x_ref[:, 1]
        zeta = 1.0 - xi - eta
        # u_h = xi*u0 + eta*u1 + zeta*u2   (barycentric blend,
        # src/models.py:323-333 — note node order (xi, eta, 1-xi-eta))
        u_h = (xi[:, None] * u_nodes[:, 0] + eta[:, None] * u_nodes[:, 1]
               + zeta[:, None] * u_nodes[:, 2])

        det, jinv = self._jacobian(v[:, 0], v[:, 1], v[:, 2])
        (dN0x, dN1x, dN2x), (dN0y, dN1y, dN2y) = self._dN_dx(jinv)

        # grad_u[m, i, j] = sum_a u_nodes[m, a, i] * dN_a/dx_j
        gx = (u_nodes[:, 0] * dN0x[:, None] + u_nodes[:, 1] * dN1x[:, None]
              + u_nodes[:, 2] * dN2x[:, None])      # [M, dim_u] = d/dx
        gy = (u_nodes[:, 0] * dN0y[:, None] + u_nodes[:, 1] * dN1y[:, None]
              + u_nodes[:, 2] * dN2y[:, None])      # [M, dim_u] = d/dy
        grad_u = jnp.stack([gx, gy], axis=2)        # [M, dim_u, 2]
        return u_h, det, grad_u

    def element_fields(self, params, mesh: TriMesh
                       ) -> Tuple[jax.Array, jax.Array]:
        """Per-element (detJ [Ne], grad_u [Ne, dim_u, 2]) computed once.

        P1 strain is constant per element, so energy assembly only needs one
        Jacobian/gradient per element — the quadrature loop collapses to a
        weight sum.  Produces bit-identical energies to evaluating
        ``apply_domain`` at every quadrature point while reading each
        element's nodes once instead of ``n_gauss`` times.
        """
        coords = self.coords(params, mesh)
        u = self.u_full(params, mesh)
        from ..ops.assembly import flat_gather
        conn = mesh.connectivity                    # [Ne, 3]
        v = flat_gather(coords, conn)
        u_nodes = flat_gather(u, conn)
        det, jinv = self._jacobian(v[:, 0], v[:, 1], v[:, 2])
        (dN0x, dN1x, dN2x), (dN0y, dN1y, dN2y) = self._dN_dx(jinv)
        gx = (u_nodes[:, 0] * dN0x[:, None] + u_nodes[:, 1] * dN1x[:, None]
              + u_nodes[:, 2] * dN2x[:, None])
        gy = (u_nodes[:, 0] * dN0y[:, None] + u_nodes[:, 1] * dN1y[:, None]
              + u_nodes[:, 2] * dN2y[:, None])
        return det, jnp.stack([gx, gy], axis=2)

    def interpolate(self, params, mesh: TriMesh, x_ref, elem_id) -> jax.Array:
        """u_h only (no Jacobian work) — for body-force work terms."""
        x_ref = jnp.asarray(x_ref, self.dtype)
        u = self.u_full(params, mesh)
        u_nodes = u[mesh.connectivity[elem_id]]
        xi = x_ref[:, 0:1]
        eta = x_ref[:, 1:2]
        return (xi * u_nodes[:, 0] + eta * u_nodes[:, 1]
                + (1.0 - xi - eta) * u_nodes[:, 2])

    def apply_edge(self, params, mesh: TriMesh, xi, edge_id
                   ) -> Tuple[jax.Array, jax.Array]:
        """Evaluate on Neumann edges at reference coordinate xi in [0, 1].

        Returns (u_h [M, dim_u], ds [M] edge lengths), matching the
        reference edge branch (``src/models.py:359-376``).
        """
        xi = jnp.asarray(xi, self.dtype).reshape(-1)
        coords = self.coords(params, mesh)
        u = self.u_full(params, mesh)
        from ..ops.assembly import flat_gather
        edges = mesh.neumann_edges[edge_id]         # [M, 2]
        u_nodes = flat_gather(u, edges)             # [M, 2, dim_u]
        u_h = (1.0 - xi)[:, None] * u_nodes[:, 0] + xi[:, None] * u_nodes[:, 1]
        p0 = coords[edges[:, 0]]
        p1 = coords[edges[:, 1]]
        d = p1 - p0
        ds = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
        return u_h, ds

    def edge_points(self, params, mesh: TriMesh, xi, edge_id) -> jax.Array:
        """Physical coordinates of edge reference points (for tractions)."""
        xi = jnp.asarray(xi, self.dtype).reshape(-1)
        coords = self.coords(params, mesh)
        edges = mesh.neumann_edges[edge_id]
        p0 = coords[edges[:, 0]]
        p1 = coords[edges[:, 1]]
        return (1.0 - xi)[:, None] * p0 + xi[:, None] * p1

    # --------------------------------------------------------- diagnostics
    def min_abs_detJ(self, params, mesh: TriMesh) -> jax.Array:
        """Mesh-quality scalar: min |detJ| over elements (degeneracy watch;
        the reference README documents detJ->0 gradient spikes)."""
        det, _ = self.element_fields(params, mesh)
        return jnp.min(jnp.abs(det))
