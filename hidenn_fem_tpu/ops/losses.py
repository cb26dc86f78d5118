"""Variational losses: L2 projection, 1D bar energy, 2D plane-stress energy.

Capability parity with the reference's loss layer:

* L2 projection — inline MSE losses in ``/root/reference/examples/example1.py:38``
  and ``examples/example2.py:42-46``.
* 1D bar total potential energy — inline ``energy_loss`` in
  ``examples/example3.py:27-70``.
* ``PlaneStressEnergy`` — class ``EnergyLoss2D`` in
  ``/root/reference/src/loss.py:6-116``.

Everything is a pure function of the parameter pytree, so r-adaptivity
gradients (w.r.t. nodal coordinates) come from the same ``jax.grad`` call as
solution gradients — no parameter groups plumbing at the loss level.

Reference-fidelity notes (quirks catalogued in SURVEY.md §2.1 plus one more
found while rebuilding; each is reproduced behind ``compat="reference"``):

E3  ``EnergyLoss2D.edge_energy`` consumes Gauss-Legendre points from [-1, 1]
    as if they were edge coordinates in [0, 1] (``src/loss.py:96-101``) —
    traction work ~2x and partly off-edge.  Default here: correct [0,1] rule.
E5  The 1D bar loss maps quadrature geometry under ``no_grad``
    (``examples/example3.py:41-50``) so r-adaptivity gradients do not flow
    through integration weights.  Default here: fully differentiable.
E7  (new) The reference's order-4 triangle rule is double-scaled: weights
    sum to 0.25 instead of the triangle area 0.5 (``src/utils.py:39``
    applies 0.5 * [-27/96, 25/96, ...] which is already area-scaled) — the
    default domain energy is half the true integral.  Default here: correct.
E8  (new) The body-force callback receives *reference-triangle* coordinates,
    not physical points (``src/loss.py:60, 80`` pass the broadcast
    ``self.xg``).  Invisible with the default zero body force.  Default
    here: physical quadrature points.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..mesh.types import TriMesh
from ..models.triangle_p1 import TriangleP1
from . import quadrature as quad
from .elasticity import plane_stress_C, strain_voigt_from_grad, energy_density

__all__ = ["l2_loss", "bar_energy_1d", "PlaneStressEnergy",
           "mesh_quality_penalty"]


def mesh_quality_penalty(model, params, mesh) -> jax.Array:
    """Mean element shape-quality penalty for r-adaptive solves.

    The reference hints at (but never implements) a mesh-quality
    regularizer for the alternating scheme
    (``examples/example4.py:107`` commented: ``0.1 * mesh_quality_loss``);
    its README documents the failure mode it guards: r-adaptivity driving
    detJ -> 0 and spiking gradients (``README.md:264-268``).

    Uses the classic condition-number-style measure: per triangle,
    sum of squared edge lengths over (4*sqrt(3)*area) — equal to 1 for an
    equilateral triangle and diverging as the element degenerates, so it
    acts as a smooth inversion barrier.
    """
    from .assembly import flat_gather
    coords = model.coords(params, mesh)
    v = flat_gather(coords, mesh.connectivity)
    e0 = v[:, 1] - v[:, 0]
    e1 = v[:, 2] - v[:, 1]
    e2 = v[:, 0] - v[:, 2]
    l2 = (jnp.sum(e0 * e0, axis=1) + jnp.sum(e1 * e1, axis=1)
          + jnp.sum(e2 * e2, axis=1))
    det, _ = model.element_fields(params, mesh)
    area = 0.5 * jnp.abs(det)
    q = l2 / jnp.clip(4.0 * jnp.sqrt(3.0) * area, min=1e-30)
    return jnp.mean(q)


# --------------------------------------------------------------------- L2
def l2_loss(model, params, x, u_true) -> jax.Array:
    """Mean-squared collocation loss — the reference's L2-projection
    objective (``examples/example1.py:38``, ``examples/example2.py:46``)."""
    pred = model.apply(params, x)
    return jnp.mean((pred - u_true) ** 2)


# ----------------------------------------------------------------- 1D bar
def bar_energy_1d(model, params, n_gauss: int, b_force: Callable,
                  E: float, differentiable_geometry: bool = True
                  ) -> jax.Array:
    """Total potential energy of a 1D bar:  sum_q w_q (0.5 E u'^2 - b u).

    Rebuilds ``examples/example3.py:27-70``: per-element affine map of the
    [-1, 1] Gauss rule, du/dx via input-gradient AD (the reference's
    ``autograd.grad(u, xq, create_graph=True)``, here a ``jax.jvp`` which
    composes cleanly with the outer reverse-mode parameter gradient).

    Args:
      differentiable_geometry: if True (default) r-adaptivity gradients flow
        through the quadrature map; if False, reproduce the reference's
        ``no_grad`` detach (quirk E5).
    """
    xi, wi = quad.interval_gauss_points_m11(n_gauss, dtype=model.dtype)
    grid = model.grid(params)
    if not differentiable_geometry:
        grid = jax.lax.stop_gradient(grid)
    x_i = grid[:-1, None]                    # [n_elem, 1]
    x_ip1 = grid[1:, None]
    xq = 0.5 * (x_ip1 - x_i) * xi + 0.5 * (x_ip1 + x_i)   # [n_elem, ng]
    wq = 0.5 * (x_ip1 - x_i) * wi

    u, du_dx = jax.jvp(lambda x: model.apply(params, x), (xq,),
                       (jnp.ones_like(xq),))
    total = 0.5 * E * du_dx ** 2 - b_force(xq) * u
    return jnp.sum(wq * total)


# ------------------------------------------------------------ 2D elasticity
@dataclasses.dataclass(frozen=True)
class PlaneStressEnergy:
    """Plane-stress total potential energy for the P1 triangle model.

    Rebuilds ``EnergyLoss2D`` (``src/loss.py:6-116``): constitutive matrix
    precomputed at construction, domain energy by Gaussian quadrature over
    all elements in one batched pass, Neumann traction work over boundary
    edges, ``total = domain - edge``.

    Args:
      model: the TriangleP1 static config.
      E, nu: Young's modulus / Poisson ratio (defaults ``src/loss.py:9-10``).
      gauss_order / gauss_order_1d: quadrature orders (``src/loss.py:13-14``).
      F_total, traction_length: parameters of the default uniform +x traction
        t = (F_total / traction_length, 0) (``src/loss.py:47-51``).
      body_force / traction: optional callables x[M,2] -> [M,2] overriding
        the defaults (zero body force / uniform traction).
      assembly: "fused" exploits P1 constant strain — one Jacobian per
        element, quadrature collapses to the weight sum (bit-equal energy,
        ~n_gauss x less memory traffic); "quadrature" evaluates the model at
        every quadrature point exactly like the reference hot path
        (``src/loss.py:60-65``).
      compat: "exact" (correct numerics) or "reference" (reproduce quirks
        E3/E7/E8 above for baseline validation).
    """

    model: TriangleP1
    E: float = 10e9
    nu: float = 0.3
    gauss_order: int = 4
    gauss_order_1d: int = 2
    F_total: float = 100e3
    traction_length: float = 1.0
    body_force: Optional[Callable] = None
    traction: Optional[Callable] = None
    assembly: str = "fused"
    compat: str = "exact"
    # elementwise-kernel backend for the fused path: "auto" picks the
    # fused Pallas kernel on TPU and plain XLA elsewhere; "pallas" forces
    # the compiled kernel, "pallas_interpret" runs it in the Pallas
    # interpreter (CPU-testable), "xla" forces the jnp pipeline.
    backend: str = "auto"
    # weight of the element shape-quality regularizer (0 disables) — the
    # guard against r-adaptive element collapse the reference hints at
    # (examples/example4.py:107)
    mesh_penalty_weight: float = 0.0
    # Fold the Neumann traction work into the element gather/kernel
    # (edges as (n0,n1,n1) pseudo-element columns masked by iota; see
    # _fused_total).  Equality-tested, but measured net-SLOWER on v5e at
    # 6.4K elements (119 vs 101 µs/step) despite fewer launched kernels —
    # the step is bound by the ~0.5 rows/cycle gather rate and the extra
    # edge columns ride the critical gathers — so it stays opt-in.
    fuse_edges: bool = False

    def __post_init__(self):
        if self.assembly not in ("fused", "quadrature"):
            raise ValueError(f"unknown assembly mode {self.assembly!r}")
        if self.compat not in ("exact", "reference"):
            raise ValueError(f"unknown compat mode {self.compat!r}")
        if self.backend not in ("auto", "pallas", "pallas_blockfused",
                                "pallas_interpret", "xla"):
            raise ValueError(f"unknown backend {self.backend!r}")

    def _resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        if self.model.dtype != jnp.float32:
            return "xla"  # the Pallas kernel is f32; f64 runs pure XLA
        return "pallas" if jax.default_backend() not in ("cpu",) else "xla"

    # ------------------------------------------------------------- tables
    @property
    def C(self) -> jax.Array:
        return plane_stress_C(self.E, self.nu, dtype=self.model.dtype)

    def _domain_rule(self):
        pts, w = quad.triangle_gauss_points(self.gauss_order,
                                            dtype=self.model.dtype)
        if self.compat == "reference" and self.gauss_order == 4:
            w = 0.5 * w  # quirk E7: reference double-scales the 4-pt rule
        return pts, w

    def _edge_rule(self):
        if self.compat == "reference":
            # quirk E3: raw [-1,1] points used as edge coordinates
            return quad.interval_gauss_points_m11(self.gauss_order_1d,
                                                  dtype=self.model.dtype)
        return quad.interval_gauss_points(self.gauss_order_1d,
                                          dtype=self.model.dtype)

    def _default_traction(self, x: jax.Array) -> jax.Array:
        t_x = jnp.full((x.shape[0],), self.F_total / self.traction_length,
                       dtype=x.dtype)
        return jnp.stack([t_x, jnp.zeros_like(t_x)], axis=1)

    def _body_work_gathered(self, g: jax.Array, pts: jax.Array,
                            w: jax.Array) -> jax.Array:
        """Body-force work  sum_e |detJ_e| sum_q w_q b(x_q).u(x_q)  from
        an already-gathered [rows, 3, 4] corner array (cx, cy, ux, uy).

        The fast-path body-force term: everything (quadrature points,
        interpolated u, |detJ|) comes from the packed corners the elastic
        term gathered anyway, so a body force costs one extra elementwise
        pass — NOT the general path's per-quad-point connectivity gathers
        (which made ``body_force != None`` a silent ~2x step-time cliff
        at scale).  Padding rows (banded layouts) have degenerate
        corners, detJ = 0, and so contribute exactly nothing.
        Matches ``/root/reference/src/loss.py:80-88`` with physical-point
        evaluation (quirk E8 corrected; this path requires
        ``compat == "exact"``)."""
        v0, v1, v2 = g[:, 0, :], g[:, 1, :], g[:, 2, :]
        det = ((v0[:, 0] - v2[:, 0]) * (v1[:, 1] - v2[:, 1])
               - (v1[:, 0] - v2[:, 0]) * (v0[:, 1] - v2[:, 1]))
        xi = pts[None, :, 0, None]                     # [1, ng, 1]
        eta = pts[None, :, 1, None]
        lam = 1.0 - xi - eta
        xq = (xi * v0[:, None, 0:2] + eta * v1[:, None, 0:2]
              + lam * v2[:, None, 0:2])               # [rows, ng, 2]
        uq = (xi * v0[:, None, 2:4] + eta * v1[:, None, 2:4]
              + lam * v2[:, None, 2:4])
        b = self.body_force(xq.reshape(-1, 2)).reshape(uq.shape)
        return jnp.sum(jnp.abs(det)
                       * jnp.sum(w[None, :] * jnp.sum(b * uq, axis=2),
                                 axis=1))

    # ------------------------------------------------------------- domain
    def domain_energy(self, params, mesh: TriMesh) -> jax.Array:
        """Elastic strain energy minus body-force work
        (``src/loss.py:55-88`` analog).

        The fused path is the TPU hot loop: ONE packed connectivity gather
        ([Ne, 3, 4] of cx,cy,ux,uy), then one fully-fused elementwise block
        computing detJ and the constant P1 strain *scalar-wise* (no [.., 2]
        stacks, no Voigt matmul — the MXU's bf16 default costs 1e-3
        relative error and the VPU does this faster anyway), then one
        reduction.  Bit-comparable to evaluating every quadrature point
        (P1 strain is constant per element; the quadrature loop collapses
        to the weight sum).
        """
        pts, w = self._domain_rule()
        ng = w.shape[0]
        n_elem = mesh.n_elements

        if self.assembly == "fused" and self.compat == "exact":
            E, nu = self.E, self.nu
            f = E / (1.0 - nu ** 2)
            node = self.model.packed_nodes(params, mesh)
            backend0 = self._resolve_backend()
            if (mesh.banded is not None
                    and backend0 in ("pallas", "pallas_blockfused",
                                     "pallas_interpret")
                    and self.model.dim_u == 2 and self.body_force is None):
                # big-mesh default: block-fused banded energy (gathers
                # consumed in-block by the Pallas kernels; see
                # ops/banded_energy.py).  With the single-pass recompute
                # backward this beats the gather-then-kernel path 32.5 vs
                # 36.7 ms fwd+bwd at 922K elements (measured round 2), so
                # it is now the auto backend whenever banded tables exist.
                from .banded_energy import banded_element_energy
                # quad-paired tables when available: same physics from
                # ~2/3 of the gather rows and lower incidence degree —
                # measured 2.0x on the vg chain (mesh/banded.py:
                # pair_connectivity)
                ba = (mesh.banded_paired if mesh.banded_paired is not None
                      else mesh.banded)
                return banded_element_energy(
                    node, ba, float(E), float(nu),
                    quad.triangle_weight_sum(self.gauss_order),
                    backend0 == "pallas_interpret")
            if mesh.banded is not None:
                from .assembly import gather_banded
                # [B*EB, 3, 4]; >= Ne rows, padding slots are degenerate
                g = gather_banded(node, mesh.banded)
            elif mesh.incidence is not None:
                from .assembly import gather_with_incidence
                g = gather_with_incidence(node, mesh.connectivity,
                                          mesh.incidence)
            else:
                g = node[mesh.connectivity]
            n_rows = g.shape[0]
            backend = self._resolve_backend()
            if backend != "xla" and self.model.dim_u == 2:
                from .pallas_energy import element_energy_pallas
                gT = g.reshape(n_rows, 12).T          # [12, Ne] lane-major
                # host-side static scalar (the staged weight table may be
                # a tracer inside scanned bodies)
                w_sum = quad.triangle_weight_sum(self.gauss_order)
                elastic = element_energy_pallas(
                    gT, float(E), float(nu), w_sum,
                    backend == "pallas_interpret")
                if self.body_force is None:
                    return elastic
                return elastic - self._body_work_gathered(g, pts, w)
            v0, v1, v2 = g[:, 0, :], g[:, 1, :], g[:, 2, :]
            ax = v0[:, 0] - v2[:, 0]
            ay = v0[:, 1] - v2[:, 1]
            bx = v1[:, 0] - v2[:, 0]
            by = v1[:, 1] - v2[:, 1]
            d0x = v0[:, 2] - v2[:, 2]
            d0y = v0[:, 3] - v2[:, 3]
            d1x = v1[:, 2] - v2[:, 2]
            d1y = v1[:, 3] - v2[:, 3]
            det = ax * by - bx * ay
            safe = jnp.where(jnp.abs(det) < 1e-12,
                             jnp.where(det < 0, -1e-12, 1e-12), det)
            inv = 1.0 / safe
            # strains: eps = (J^{-T} D_N) u_nodes, written scalar-wise
            exx = (by * d0x - ay * d1x) * inv
            eyy = (-bx * d0y + ax * d1y) * inv
            gxy = ((by * d0y - ay * d1y) + (-bx * d0x + ax * d1x)) * inv
            dens = 0.5 * (f * (exx * exx + eyy * eyy + 2 * nu * exx * eyy)
                          + f * (1 - nu) / 2 * gxy * gxy)
            elastic = jnp.sum(w) * jnp.sum(jnp.abs(det) * dens)
            if self.body_force is None:
                return elastic
            return elastic - self._body_work_gathered(g, pts, w)

        # general quadrature path — the reference's exact hot loop shape
        # (also used for compat="reference", where the quirks live)
        x_ref = jnp.tile(pts, (n_elem, 1))                # [Ne*ng, 2]
        elem_id = jnp.repeat(jnp.arange(n_elem), ng)
        qw = jnp.tile(w, (n_elem,))
        u_q, det, grad_u = self.model.apply_domain(params, mesh, x_ref,
                                                   elem_id)
        eps = strain_voigt_from_grad(grad_u)
        dens = energy_density(eps, self.C)
        qw = qw * jnp.abs(det)
        elastic = jnp.sum(qw * dens)
        if self.body_force is None:
            return elastic
        b = self.body_force(self._quad_points(params, mesh, x_ref, elem_id))
        return elastic - jnp.sum(qw * jnp.sum(b * u_q, axis=1))

    def _quad_points(self, params, mesh, x_ref, elem_id) -> jax.Array:
        """Physical quadrature points (or reference coords in compat mode,
        reproducing quirk E8)."""
        if self.compat == "reference":
            return x_ref
        coords = self.model.coords(params, mesh)
        v = coords[mesh.connectivity[elem_id]]            # [M, 3, 2]
        xi = x_ref[:, 0:1]
        eta = x_ref[:, 1:2]
        return xi * v[:, 0] + eta * v[:, 1] + (1.0 - xi - eta) * v[:, 2]

    # --------------------------------------------------------------- edge
    def edge_energy(self, params, mesh: TriMesh) -> jax.Array:
        """Neumann traction work (``src/loss.py:91-110`` analog).

        Unlike the reference (quirk E4 crash), a mesh with zero Neumann
        edges contributes exactly 0.
        """
        n_edges = mesh.n_neumann_edges
        if n_edges == 0:
            return jnp.zeros((), dtype=self.model.dtype)

        if (self.traction is None and self.compat == "exact"
                and self.assembly == "fused"):
            # Uniform traction on linear edge elements: the quadrature is
            # exact analytically — integral t . u ds = t_x (u0x+u1x)/2 ds.
            # One packed gather, one fused block, one reduce.
            en = self.model.packed_nodes(params, mesh)[mesh.neumann_edges]
            dx = en[:, 1, 0] - en[:, 0, 0]
            dy = en[:, 1, 1] - en[:, 0, 1]
            ds = jnp.sqrt(dx * dx + dy * dy)
            t_x = self.F_total / self.traction_length
            return t_x * jnp.sum(ds * 0.5 * (en[:, 0, 2] + en[:, 1, 2]))

        xi, w = self._edge_rule()
        ng = w.shape[0]
        xi_flat = jnp.tile(xi, (n_edges,))                # [E*ng]
        edge_id = jnp.repeat(jnp.arange(n_edges), ng)
        wq = jnp.tile(w, (n_edges,))

        u_edge, ds = self.model.apply_edge(params, mesh, xi_flat, edge_id)
        xq = self.model.edge_points(params, mesh, xi_flat, edge_id)
        t = (self.traction or self._default_traction)(xq)
        return jnp.sum(jnp.sum(u_edge * t, axis=1) * wq * ds)

    # -------------------------------------------------------------- total
    def _fused_total(self, params, mesh: TriMesh):
        """Domain + edge energy in ONE gather and ONE Pallas kernel, or
        None when the configuration can't use it.

        Neumann edges ride the element pipeline as (n0, n1, n1)
        pseudo-elements (``mesh.fused_connectivity``) with a 13th
        traction-weight row; their cotangents flow through the same
        incidence-gather backward.  Saves the entire separate edge
        subgraph (~8 µs/step of kernel-launch overhead at 6.4K elements,
        where the step is launch-bound).
        """
        backend = self._resolve_backend()
        if (not self.fuse_edges
                or self.assembly != "fused" or self.compat != "exact"
                or self.traction is not None or self.body_force is not None
                or self.model.dim_u != 2
                or mesh.fused_connectivity is None
                or mesh.banded is not None
                or backend not in ("pallas", "pallas_interpret")):
            return None
        from .assembly import gather_with_incidence
        from .pallas_energy import element_energy_pallas
        node = self.model.packed_nodes(params, mesh)
        g = gather_with_incidence(node, mesh.fused_connectivity,
                                  mesh.fused_incidence)
        n_rows = g.shape[0]
        gT = g.reshape(n_rows, 12).T
        # total = domain - traction work, hence the negative edge weight;
        # edge columns are the static suffix [n_elements, n_rows) so the
        # kernel applies the term by iota mask — no extra rows, no copies
        t_x = self.F_total / self.traction_length
        w_sum = quad.triangle_weight_sum(self.gauss_order)
        return element_energy_pallas(gT, float(self.E), float(self.nu),
                                     w_sum, backend == "pallas_interpret",
                                     mesh.n_elements, -float(t_x))

    def _lattice_total(self, params, mesh: TriMesh):
        """Gather-free route for lattice-detected meshes (or None).

        When the TriMesh carries a recovered lattice structure
        (``mesh/lattice.py``) the whole energy — domain and traction —
        evaluates from [nx, ny] node-lattice slices: zero gathers for
        identity numberings, one N-row permutation fill otherwise,
        instead of the 3*Ne-row connectivity gather + incidence
        backward that bound the unstructured step.  Same numerics as
        the fused path (equality-tested both-gradients in
        tests/test_lattice_route.py); ``body_force`` rides the route
        via slice-based work (``lattice_body_work``), and a custom
        ``traction`` callable keeps the DOMAIN on the route (the edge
        term is O(boundary) and evaluates generically)."""
        if (mesh.lattice is None or self.assembly != "fused"
                or self.compat != "exact" or self.model.dim_u != 2
                or getattr(self.model, "compat", "exact") != "exact"):
            return None
        node = self.model.packed_nodes(params, mesh)
        if self.traction is None:
            return self._lattice_total_node(node, mesh)
        from .lattice_energy import (lattice_domain_energy,
                                     lattice_body_work)
        w_sum = quad.triangle_weight_sum(self.gauss_order)
        e = lattice_domain_energy(node, mesh.lattice, float(self.E),
                                  float(self.nu), w_sum)
        if self.body_force is not None:
            pts, w = self._domain_rule()
            e = e - lattice_body_work(node, mesh.lattice,
                                      self.body_force, pts, w)
        return e - self.edge_energy(params, mesh)

    def total_from_nodes(self, node, mesh: TriMesh) -> jax.Array:
        """Energy as a function of the packed [N, 4] node table (BC
        values already baked in) — the node-space solve entry
        (``solve/nodespace.py``): optimizers that iterate on the node
        table directly skip the per-step Dirichlet selects + concat of
        ``packed_nodes`` and the matching backward unpack.

        Lattice-routable configurations only (where those passes are a
        measurable share of the step); other assemblies raise."""
        if self.mesh_penalty_weight:
            raise ValueError("node-space energy does not carry the "
                             "mesh-quality penalty (it needs params)")
        e = self._lattice_total_node(node, mesh)
        if e is None:
            raise ValueError("total_from_nodes requires a lattice-"
                             "routable configuration (lattice mesh, "
                             "fused assembly, exact compat, default "
                             "traction, no body force)")
        return e

    def _hybrid_total(self, params, mesh: TriMesh):
        """Slice+gather route for hybrid lattice+collar meshes (or None).

        ``mesh.hybrid`` (``mesh/hybrid.py``) splits the element set into
        a node-table-prefix lattice (energy + face traction from slices,
        zero gathers) and a small collar of irregular triangles around
        the hole rims (one O(rim) gather).  Same numerics as the fused
        path up to reassociation — equality-tested value + both gradient
        groups in tests/test_hybrid.py."""
        if (mesh.hybrid is None or self.assembly != "fused"
                or self.compat != "exact" or self.model.dim_u != 2
                or getattr(self.model, "compat", "exact") != "exact"):
            return None
        from .lattice_energy import (lattice_total, collar_energy,
                                     lattice_body_work,
                                     lattice_domain_energy)
        hy = mesh.hybrid
        node = self.model.packed_nodes(params, mesh)
        w_sum = quad.triangle_weight_sum(self.gauss_order)
        if self.traction is None:
            t_x = self.F_total / self.traction_length
            e = lattice_total(node, hy.lattice, float(self.E),
                              float(self.nu), w_sum, float(t_x))
        else:
            # custom traction: domain stays on the route, the
            # O(boundary) edge term evaluates generically
            e = (lattice_domain_energy(node, hy.lattice, float(self.E),
                                       float(self.nu), w_sum)
                 - self.edge_energy(params, mesh))
        pts = w = None
        if self.body_force is not None:
            pts, w = self._domain_rule()
            e = e - lattice_body_work(node, hy.lattice, self.body_force,
                                      pts, w)
        if hy.extra_conn.shape[0]:
            e = e + collar_energy(node, hy, float(self.E),
                                  float(self.nu), w_sum,
                                  body_force=self.body_force,
                                  pts=pts, w=w)
        return e

    def _lattice_total_node(self, node, mesh: TriMesh):
        if (mesh.lattice is None or self.assembly != "fused"
                or self.compat != "exact" or self.traction is not None
                or self.model.dim_u != 2
                or getattr(self.model, "compat", "exact") != "exact"):
            return None
        from .lattice_energy import lattice_total, lattice_body_work
        w_sum = quad.triangle_weight_sum(self.gauss_order)
        t_x = self.F_total / self.traction_length
        backend = self._resolve_backend()
        if self.body_force is not None:
            # body-force work from the same lattice slices — stays on
            # the fast path (the slab kernel below doesn't support it)
            pts, w = self._domain_rule()
            return (lattice_total(node, mesh.lattice, float(self.E),
                                  float(self.nu), w_sum, float(t_x))
                    - lattice_body_work(node, mesh.lattice,
                                        self.body_force, pts, w))
        if backend in ("pallas", "pallas_interpret"):
            # single-pass slab kernel (ops/lattice_slab.py).  The
            # on-chip A/B measured it SLOWER than the XLA route on
            # every leg (the step is VPU-compute-bound, not
            # materialization-bound — numbers in the kernel's module
            # doc), so hardware routing stays opt-in
            # (HDNN_LATTICE_SLAB=1) as a tested negative; HDNN_NO_SLAB
            # opts out even of interpret mode, which is
            # equality-proven and on by default.
            import os
            from .lattice_slab import lattice_total_slab, slab_supported
            if (slab_supported(mesh.lattice, node.dtype)
                    and not os.environ.get("HDNN_NO_SLAB")
                    and (backend == "pallas_interpret"
                         or os.environ.get("HDNN_LATTICE_SLAB"))):
                return lattice_total_slab(
                    node, mesh.lattice, float(self.E), float(self.nu),
                    w_sum, float(t_x),
                    interpret=(backend == "pallas_interpret"))
        return lattice_total(node, mesh.lattice, float(self.E),
                             float(self.nu), w_sum, float(t_x))

    def total(self, params, mesh: TriMesh) -> jax.Array:
        """Total potential = domain - edge (``src/loss.py:113-116``),
        plus the optional mesh-quality regularization."""
        e = self._lattice_total(params, mesh)
        if e is None:
            e = self._hybrid_total(params, mesh)
        if e is None:
            e = self._fused_total(params, mesh)
        if e is None:
            e = self.domain_energy(params, mesh) - self.edge_energy(
                params, mesh)
        if self.mesh_penalty_weight:
            e = e + self.mesh_penalty_weight * mesh_quality_penalty(
                self.model, params, mesh)
        return e

    __call__ = total
