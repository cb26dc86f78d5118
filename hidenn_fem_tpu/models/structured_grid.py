"""Gather-free P1 elasticity on structured grids (the TPU speed king).

The general ``TriangleP1`` path is gather-bound: TPU gathers move ~1 row
per cycle, so at ~1M elements the two assembly gathers cost ~20 ms/step no
matter how fused the math is.  On a *structured* grid none of that is
necessary: every element's nodes are fixed index offsets of a [nx, ny]
node lattice, so per-element nodal data are **array slices** — and the
backward of a slice is a pad, both running at HBM bandwidth on the VPU.

``StructuredGridP1`` keeps full r-adaptivity (nodal coordinates are
parameters like the unstructured model) and supports holes by masking
whole quads (weight-0 quads contribute nothing to energy or gradients).
``to_trimesh`` emits the exactly-equivalent unstructured ``TriMesh`` (same
triangles, same DOFs), so all post-processing/plot tooling — and the
equality tests — reuse the general path.

Triangulation variants (static ``split`` field, matching
``mesh.structured.rectangle_tri_zigzag``):

* "up": every quad (i, j) splits into T1 = (n00, n10, n11) and
  T2 = (n00, n11, n01) along the n00-n11 diagonal;
* "down": along the n10-n01 diagonal, T1 = (n00, n10, n01),
  T2 = (n10, n11, n01);
* "zigzag": alternating by (i+j) parity — the reference's default
  meshzoo topology (``/root/reference/src/mesh.py:187``).

Boundary conditions generalize the reference plate
(``/root/reference/src/mesh.py:104-122``): Dirichlet nodes pinned to a
scalar or per-node prescribed field, geometric-boundary node coordinates
frozen, and constant traction on masked edge segments of ANY of the four
faces (per-face traction vectors).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StructuredGrid", "StructuredGridP1",
           "generate_structured_grid", "pad_lattice",
           "pad_lattice_side"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StructuredGrid:
    """Static lattice data (pytree of [nx, ny]-shaped arrays).

    Attributes:
      coords: [nx, ny, 2] initial node coordinates.
      geom_boundary_mask / dirichlet_mask: [nx, ny] bool node masks.
      quad_mask: [nx-1, ny-1] float 1/0 — active quads (0 = punched).
      neumann_edge_masks: dict face -> float 1/0 segment mask carrying
        the traction: 'left'/'right' are [ny-1] (segments between nodes
        (0|nx-1, j) and (.., j+1)), 'up'/'down' are [nx-1].  Missing or
        all-zero faces carry none.
      u_dirichlet: optional [nx, ny, 2] prescribed nodal values on
        Dirichlet nodes (None -> the model's scalar ``u_fixed``).
      split: triangulation variant ("up" | "down" | "zigzag"), static.
    """

    coords: jax.Array
    geom_boundary_mask: jax.Array
    dirichlet_mask: jax.Array
    quad_mask: jax.Array
    neumann_edge_masks: Dict[str, jax.Array]
    u_dirichlet: Optional[jax.Array] = None
    split: str = dataclasses.field(metadata=dict(static=True),
                                   default="up")
    # parity phase of the zigzag split: quad (i, j) uses the "up" diagonal
    # when (i + j + zigzag_phase) is even.  pad_lattice bumps it so row
    # padding preserves the physical triangulation.
    zigzag_phase: int = dataclasses.field(metadata=dict(static=True),
                                          default=0)

    @property
    def neumann_edge_mask(self) -> Optional[jax.Array]:
        """Back-compat alias: the right-face segment mask."""
        return self.neumann_edge_masks.get("right")

    @property
    def nx(self) -> int:
        return self.coords.shape[0]

    @property
    def ny(self) -> int:
        return self.coords.shape[1]

    @property
    def n_elements(self) -> int:
        """Active triangle count (2 per active quad)."""
        return 2 * int(np.asarray(self.quad_mask).sum())


def generate_structured_grid(
    length: float = 2.0,
    height: float = 1.0,
    holes: Sequence[Tuple[float, float, float]] = (),
    boundaries: Optional[Dict[str, int]] = None,
    nx: int = 100,
    ny: int = 50,
    split: str = "up",
    u_dirichlet=None,
) -> StructuredGrid:
    """Structured-lattice analog of ``mesh.generate_mesh``.

    Holes are punched by deactivating every quad with at least one corner
    inside a hole (the lattice keeps its full shape; punched quads carry
    weight 0).  BC surface matches the reference's face->condition dict
    (``/root/reference/src/mesh.py:104-122``): faces marked 1 are
    Dirichlet, faces marked 2 carry traction (any face; segments adjacent
    to punched quads are masked out, matching the general path's
    both-nodes-Neumann edge filter).

    ``split`` picks the triangulation variant ("up" | "down" | "zigzag");
    ``u_dirichlet`` optionally prescribes nodal values (scalar or
    [nx, ny, 2]) on Dirichlet nodes.
    """
    if split not in ("up", "down", "zigzag"):
        raise ValueError(f"unknown split {split!r}")
    if boundaries is None:
        boundaries = {"up": 0, "down": 0, "right": 2, "left": 1}
    xs = np.linspace(0.0, length, nx)
    ys = np.linspace(0.0, height, ny)
    xv, yv = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([xv, yv], axis=-1)

    inside = np.zeros((nx, ny), bool)
    for cx, cy, r in holes:
        inside |= ((xv - cx) ** 2 + (yv - cy) ** 2) <= r * r
    corner_bad = (inside[:-1, :-1] | inside[1:, :-1]
                  | inside[1:, 1:] | inside[:-1, 1:])
    quad_mask = (~corner_bad).astype(np.float32)

    tol = 1e-6
    face = {
        "left": np.abs(xv - 0.0) < tol,
        "right": np.abs(xv - length) < tol,
        "down": np.abs(yv - 0.0) < tol,
        "up": np.abs(yv - height) < tol,
    }
    geom = face["left"] | face["right"] | face["down"] | face["up"]
    # nodes of punched quads neighbouring active ones are geometric
    # boundary (their coordinates must stay frozen under r-adaptivity)
    act = quad_mask > 0
    touched = np.zeros((nx, ny), bool)
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        touched[di:nx - 1 + di, dj:ny - 1 + dj] |= act
    geom |= inside | (touched & _dilate_inactive(act, nx, ny))

    bc = np.zeros((nx, ny), bool)
    # quads adjacent to each face's segments (traction on a segment whose
    # quad is punched would act on a nonexistent element edge)
    adj_quad = {
        "right": quad_mask[-1, :], "left": quad_mask[0, :],
        "up": quad_mask[:, -1], "down": quad_mask[:, 0],
    }
    mn_masks = {}
    for f, condition in boundaries.items():
        if condition == 1:
            bc |= face[f]
        elif condition == 2:
            mn_masks[f] = jnp.asarray(
                (adj_quad[f] > 0).astype(np.float32))

    ud = None
    if u_dirichlet is not None:
        ud = jnp.broadcast_to(
            jnp.asarray(u_dirichlet, jnp.float32), (nx, ny, 2))

    return StructuredGrid(
        coords=jnp.asarray(coords, jnp.float32),
        geom_boundary_mask=jnp.asarray(geom),
        dirichlet_mask=jnp.asarray(bc),
        quad_mask=jnp.asarray(quad_mask),
        neumann_edge_masks=mn_masks,
        u_dirichlet=ud,
        split=split,
    )


def _face_active(grid: StructuredGrid, face: str) -> bool:
    m = grid.neumann_edge_masks.get(face)
    return m is not None and bool(np.asarray(m).any())


def pad_lattice_side(grid: StructuredGrid) -> str:
    """Which side ``pad_lattice`` will add dead rows on: "prepend"
    (default; keeps a right-face traction at lattice index -1) or
    "append" (when the left face carries an active traction, which must
    stay at index 0).  Callers that later unpad (e.g. the sharded MG
    engines) use this to slice the correct end."""
    return "append" if _face_active(grid, "left") else "prepend"


def pad_lattice(grid: StructuredGrid, params: Optional[dict],
                multiple: int) -> Tuple[StructuredGrid, Optional[dict]]:
    """Pad the lattice i-axis to a multiple of ``multiple`` (for sharding
    the row axis over a device mesh; GSPMD turns the stencil slices into
    halo exchanges automatically, but requires divisible dimensions).

    Dead rows (quads deactivated, coordinates frozen via the geom mask,
    values pinned via the dirichlet mask) contribute nothing to energy
    or gradients.  The pad side follows the tractions: ``edge_energy``
    reads the right face at lattice index -1 and the left face at index
    0, so rows are PREPENDED by default (right-face traction stays at
    -1) but APPENDED when the left face carries the (only) active
    traction.  Tractions on BOTH x-faces cannot survive row padding —
    pad the column axis instead (transpose the grid).
    """
    nx = grid.nx
    k = (-nx) % multiple
    if k == 0:
        return grid, params

    append = pad_lattice_side(grid) == "append"
    if append and _face_active(grid, "right"):
        raise NotImplementedError(
            "pad_lattice cannot pad the row axis with active tractions "
            "on BOTH x-faces; pad the column axis instead (transpose "
            "the grid)")

    def prep(a, fill=None):
        a = np.asarray(a)
        src = a[-1:] if append else a[0:1]
        row = np.repeat(src, k, axis=0) if fill is None \
            else np.full((k,) + a.shape[1:], fill, a.dtype)
        parts = [a, row] if append else [row, a]
        return jnp.asarray(np.concatenate(parts, axis=0))

    def prep_seg(f, m):
        if f in ("up", "down"):    # [nx-1] segment masks grow with rows
            z = np.zeros(k, np.asarray(m).dtype)
            parts = [np.asarray(m), z] if append else [z, np.asarray(m)]
            return jnp.asarray(np.concatenate(parts))
        return m

    grid2 = StructuredGrid(
        coords=prep(grid.coords),
        geom_boundary_mask=prep(grid.geom_boundary_mask, True),
        dirichlet_mask=prep(grid.dirichlet_mask, True),
        quad_mask=prep(grid.quad_mask, 0.0),
        neumann_edge_masks={f: prep_seg(f, m)
                            for f, m in grid.neumann_edge_masks.items()},
        u_dirichlet=(None if grid.u_dirichlet is None
                     else prep(grid.u_dirichlet)),
        split=grid.split,
        # appended rows don't shift existing quad parities; prepended
        # rows shift them by k
        zigzag_phase=(grid.zigzag_phase + (0 if append else k)) % 2,
    )
    params2 = None
    if params is not None:
        params2 = {"coords": prep(params["coords"]),
                   "u": prep(params["u"], 0.0)}
    return grid2, params2


def _dilate_inactive(act: np.ndarray, nx: int, ny: int) -> np.ndarray:
    """Nodes adjacent to at least one INACTIVE quad (hole rims)."""
    inact = ~act
    out = np.zeros((nx, ny), bool)
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        out[di:nx - 1 + di, dj:ny - 1 + dj] |= inact
    return out


@dataclasses.dataclass(frozen=True)
class StructuredGridP1:
    """Gather-free structured plate model + plane-stress energy.

    Same parameter semantics as ``TriangleP1`` (full-size masked params):
    ``params = {"coords": [nx, ny, 2], "u": [nx, ny, 2]}``.
    """

    E: float = 10e9
    nu: float = 0.3
    F_total: float = 100e3
    traction_length: float = 1.0
    u_fixed: float = 0.0
    init_scale: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # optional per-face constant traction vectors, face -> (tx, ty);
    # faces absent from the dict use (F_total / traction_length, 0)
    tractions: Optional[Dict[str, Tuple[float, float]]] = None

    # ---------------------------------------------------------------- init
    def init(self, key, grid: StructuredGrid) -> dict:
        u0 = self.init_scale * jax.random.normal(
            key, (grid.nx, grid.ny, 2), dtype=self.dtype)
        return {"coords": jnp.asarray(grid.coords, self.dtype), "u": u0}

    # ------------------------------------------------------------- getters
    def coords(self, params, grid: StructuredGrid) -> jax.Array:
        pin = grid.geom_boundary_mask[..., None]
        return jnp.where(pin, jnp.asarray(grid.coords, self.dtype),
                         params["coords"])

    def u_full(self, params, grid: StructuredGrid) -> jax.Array:
        fixed = (jnp.asarray(grid.u_dirichlet, self.dtype)
                 if grid.u_dirichlet is not None
                 else jnp.asarray(self.u_fixed, self.dtype))
        return jnp.where(grid.dirichlet_mask[..., None], fixed,
                         params["u"])

    # -------------------------------------------------------------- energy
    def _tri_energy(self, v0, v1, v2):
        """Energy contribution of one triangle family, all inputs
        [nx-1, ny-1, 4] corner slices (cx, cy, ux, uy)."""
        f = self.E / (1.0 - self.nu ** 2)
        nu = self.nu
        ax = v0[..., 0] - v2[..., 0]
        ay = v0[..., 1] - v2[..., 1]
        bx = v1[..., 0] - v2[..., 0]
        by = v1[..., 1] - v2[..., 1]
        d0x = v0[..., 2] - v2[..., 2]
        d0y = v0[..., 3] - v2[..., 3]
        d1x = v1[..., 2] - v2[..., 2]
        d1y = v1[..., 3] - v2[..., 3]
        det = ax * by - bx * ay
        safe = jnp.where(jnp.abs(det) < 1e-12,
                         jnp.where(det < 0, -1e-12, 1e-12), det)
        inv = 1.0 / safe
        exx = (by * d0x - ay * d1x) * inv
        eyy = (-bx * d0y + ax * d1y) * inv
        gxy = ((by * d0y - ay * d1y) + (-bx * d0x + ax * d1x)) * inv
        dens = 0.5 * (f * (exx * exx + eyy * eyy + 2 * nu * exx * eyy)
                      + f * (1 - nu) / 2 * gxy * gxy)
        return jnp.abs(det) * dens                  # per-element, x area 2

    def _node(self, params, grid: StructuredGrid) -> jax.Array:
        """Packed nodal lattice [nx, ny, 4] of (cx, cy, ux, uy) with both
        BC pinnings applied — built ONCE per energy evaluation and shared
        by the domain and edge terms (total())."""
        return jnp.concatenate(
            [self.coords(params, grid), self.u_full(params, grid)],
            axis=-1)

    def domain_energy(self, params, grid: StructuredGrid) -> jax.Array:
        """Elastic strain energy; exact (constant-strain) integration."""
        return self._domain_from_node(self._node(params, grid), grid)

    def _domain_from_node(self, node, grid: StructuredGrid) -> jax.Array:
        import os
        if (node.dtype == jnp.float32
                and os.environ.get("HDNN_LATTICE_SLAB")
                and jax.default_backend() not in ("cpu",)):
            # opt-in single-pass Pallas stencil (ops/lattice_slab.py);
            # single-device only — the shard_map/GSPMD paths keep the
            # XLA stencil (a pallas call does not GSPMD-partition).
            from ..ops.lattice_slab import structured_domain_slab
            return structured_domain_slab(node, grid.quad_mask,
                                          grid.split,
                                          grid.zigzag_phase,
                                          self.E, self.nu)
        n00 = node[:-1, :-1]
        n10 = node[1:, :-1]
        n11 = node[1:, 1:]
        n01 = node[:-1, 1:]
        # "up" split: T1 = (n00, n10, n11), T2 = (n00, n11, n01) along the
        # n00-n11 diagonal; "down": T1 = (n00, n10, n01),
        # T2 = (n10, n11, n01) along n10-n01; zigzag alternates by parity.
        if grid.split == "up":
            e = (self._tri_energy(n00, n10, n11)
                 + self._tri_energy(n00, n11, n01))
        elif grid.split == "down":
            e = (self._tri_energy(n00, n10, n01)
                 + self._tri_energy(n10, n11, n01))
        elif grid.split == "zigzag":
            e_up = (self._tri_energy(n00, n10, n11)
                    + self._tri_energy(n00, n11, n01))
            e_dn = (self._tri_energy(n00, n10, n01)
                    + self._tri_energy(n10, n11, n01))
            ii = jnp.arange(grid.nx - 1)[:, None]
            jj = jnp.arange(grid.ny - 1)[None, :]
            even = (ii + jj + grid.zigzag_phase) % 2 == 0
            e = jnp.where(even, e_up, e_dn)
        else:
            raise ValueError(f"unknown split {grid.split!r}")
        # w_sum = 0.5 (triangle-rule weight sum) applied to |det|*dens
        return 0.5 * jnp.sum(grid.quad_mask * e)

    def edge_energy(self, params, grid: StructuredGrid) -> jax.Array:
        """Constant-traction work on active edge segments of any face
        (exact for linear edge elements).

        Per-face traction vectors come from ``self.tractions`` (face ->
        (tx, ty)); faces not listed default to the reference's uniform +x
        pull (F_total / traction_length, 0)
        (``/root/reference/src/loss.py:47-51``).
        """
        coords = self.coords(params, grid)
        u = self.u_full(params, grid)
        # scalar-column face slices (i, j, component), matching the shape
        # XLA fuses best (see total())
        sel = {
            "right": lambda a, k: a[-1, :, k],
            "left": lambda a, k: a[0, :, k],
            "up": lambda a, k: a[:, -1, k],
            "down": lambda a, k: a[:, 0, k],
        }
        t_default = (self.F_total / self.traction_length, 0.0)
        terms = []
        for f, mask in grid.neumann_edge_masks.items():
            cx = sel[f](coords, 0)
            cy = sel[f](coords, 1)
            ds = jnp.sqrt((cx[1:] - cx[:-1]) ** 2
                          + (cy[1:] - cy[:-1]) ** 2)
            tx, ty = (self.tractions or {}).get(f, t_default)
            # statically-zero traction components trace no ops and no
            # gradient path; scalars stay outside the reduction
            if tx:
                ux = sel[f](u, 0)
                terms.append(tx * jnp.sum(
                    mask * ds * 0.5 * (ux[1:] + ux[:-1])))
            if ty:
                uy = sel[f](u, 1)
                terms.append(ty * jnp.sum(
                    mask * ds * 0.5 * (uy[1:] + uy[:-1])))
        if not terms:
            return jnp.zeros((), self.dtype)
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    def total(self, params, grid: StructuredGrid) -> jax.Array:
        # NOTE: domain and edge each rebuild coords/u_full and XLA CSEs
        # them; explicitly sharing one packed [nx,ny,4] node array was
        # measured 3x SLOWER at 922K (331 vs 99 us/step — the joint
        # cotangent de-fuses the backward), and so was threading the
        # edge term through [ny,2] sub-slices (+22 us).  The fastest
        # measured shape is the one below: scalar column slices, scalar
        # traction factored outside the reduction.
        return self.domain_energy(params, grid) - self.edge_energy(
            params, grid)

    __call__ = total

    # --------------------------------------------------------- conversion
    def to_trimesh(self, grid: StructuredGrid):
        """The exactly-equivalent unstructured TriMesh (active triangles
        only, same node set/order flattened i*ny+j) — for postproc, plots,
        and equality tests against TriangleP1."""
        from ..mesh.structured import unique_edges
        from ..mesh.types import TriMesh

        nx, ny = grid.nx, grid.ny
        coords = np.asarray(grid.coords).reshape(-1, 2)
        i, j = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                           indexing="ij")
        i, j = i.ravel(), j.ravel()
        n00 = i * ny + j
        n10 = (i + 1) * ny + j
        n01 = i * ny + (j + 1)
        n11 = (i + 1) * ny + (j + 1)
        up1 = np.stack([n00, n10, n11], 1)
        up2 = np.stack([n00, n11, n01], 1)
        dn1 = np.stack([n00, n10, n01], 1)
        dn2 = np.stack([n10, n11, n01], 1)
        if grid.split == "up":
            t1, t2 = up1, up2
        elif grid.split == "down":
            t1, t2 = dn1, dn2
        else:
            even = ((i + j + grid.zigzag_phase) % 2 == 0)[:, None]
            t1 = np.where(even, up1, dn1)
            t2 = np.where(even, up2, dn2)
        cells = np.stack([t1, t2], axis=1).reshape(-1, 3)
        active = np.repeat(np.asarray(grid.quad_mask).ravel() > 0, 2)
        cells = cells[active]

        face_nodes = {
            "right": (nx - 1) * ny + np.arange(ny),
            "left": np.arange(ny),
            "up": np.arange(nx) * ny + (ny - 1),
            "down": np.arange(nx) * ny,
        }
        mn_mask = np.zeros(nx * ny, bool)
        all_edges = []
        for f, m in grid.neumann_edge_masks.items():
            em = np.asarray(m) > 0
            line = face_nodes[f]
            e = np.stack([line[:-1], line[1:]], axis=1)[em]
            all_edges.append(e)
            mn_mask[e.ravel()] = True
        edges = (np.concatenate(all_edges, axis=0) if all_edges
                 else np.zeros((0, 2), np.int64))

        return TriMesh.from_arrays(
            coords=coords,
            connectivity=cells,
            geom_boundary_mask=np.asarray(grid.geom_boundary_mask).ravel(),
            dirichlet_mask=np.asarray(grid.dirichlet_mask).ravel(),
            neumann_mask=mn_mask,
            neumann_edges=np.sort(edges, axis=1),
        )
