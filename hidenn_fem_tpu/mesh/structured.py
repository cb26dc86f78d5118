"""Structured triangular mesh generation (host-side, numpy; no 3rd-party
meshing dependency).

Capability parity with the reference's meshzoo-based ``generate_mesh``
(``/root/reference/src/mesh.py:155-276``): rectangle triangulated with the
alternating-diagonal ("zigzag") pattern, circular holes punched by node
deletion, geometric-boundary / Dirichlet / Neumann masks by coordinate
tolerance, and Neumann edges extracted as unique element edges whose both
endpoints carry the Neumann tag.  The reference needs ``meshzoo`` for the
base grid (``src/mesh.py:187``); here the zigzag triangulation is built
directly so tests and examples never need external meshers.

All of this is one-time host preprocessing; the output is a ``TriMesh``
pytree of device arrays (the model/loss input contract).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .types import TriMesh

__all__ = ["rectangle_tri_zigzag", "generate_mesh", "proxy_plate_mesh"]

_TOL = 1e-6


def rectangle_tri_zigzag(nx: int, ny: int, length: float, height: float,
                         variant: str = "zigzag"
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Triangulate [0,length]x[0,height] on an nx-by-ny point grid.

    variant:
      * "zigzag" (default): alternating diagonals by (i+j) parity — the
        same topology family as meshzoo's ``variant="zigzag"``
        (``src/mesh.py:187``).
      * "up": every quad split along the n00-n11 diagonal (the baseline
        proxy-plate triangulation from BASELINE.md).
      * "down": every quad split along the n10-n01 diagonal.

    All triangles are counter-clockwise (detJ > 0).
    Returns (points [N,2] f64, cells [Ne,3] int64).
    """
    xs = np.linspace(0.0, length, nx)
    ys = np.linspace(0.0, height, ny)
    xv, yv = np.meshgrid(xs, ys, indexing="ij")
    points = np.stack([xv.ravel(), yv.ravel()], axis=1)  # idx = i*ny + j

    from . import native
    if variant in ("up", "down", "zigzag") and native.available():
        return points, native.structured_cells(nx, ny, variant)

    i, j = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1), indexing="ij")
    i = i.ravel()
    j = j.ravel()
    n00 = i * ny + j
    n10 = (i + 1) * ny + j
    n01 = i * ny + (j + 1)
    n11 = (i + 1) * ny + (j + 1)

    up0 = np.stack([n00, n10, n11], axis=1)    # diagonal n00-n11
    up1 = np.stack([n00, n11, n01], axis=1)
    dn0 = np.stack([n00, n10, n01], axis=1)    # diagonal n10-n01
    dn1 = np.stack([n10, n11, n01], axis=1)
    if variant == "up":
        t0, t1 = up0, up1
    elif variant == "down":
        t0, t1 = dn0, dn1
    elif variant == "zigzag":
        even = ((i + j) % 2 == 0)[:, None]
        t0 = np.where(even, up0, dn0)
        t1 = np.where(even, up1, dn1)
    else:
        raise ValueError(f"unknown variant {variant!r}")
    # interleave the two triangles of each quad so consecutive elements
    # reference nearby nodes — keeps the element order banded (required by
    # the blocked-window assembly, mesh/banded.py)
    cells = np.stack([t0, t1], axis=1).reshape(-1, 3)
    return points, cells


def _face_mask(points: np.ndarray, face: str, length: float, height: float
               ) -> np.ndarray:
    """Coordinate-tolerance face selector (``src/mesh.py:231-244`` analog)."""
    if face == "up":
        return np.abs(points[:, 1] - height) < _TOL
    if face == "down":
        return np.abs(points[:, 1] - 0.0) < _TOL
    if face == "left":
        return np.abs(points[:, 0] - 0.0) < _TOL
    if face == "right":
        return np.abs(points[:, 0] - length) < _TOL
    return np.zeros(points.shape[0], dtype=bool)


def unique_edges(cells: np.ndarray) -> np.ndarray:
    """All unique (sorted) element edges (``src/mesh.py:252-256`` analog).

    Edges are packed into single int64 keys (min*2^32 + max) so dedup is a
    1D ``np.unique`` — ~20x faster than the rowwise ``unique(axis=0)`` the
    reference's approach implies at million-element scale.  The native
    preprocessing library (``hidenn_fem_tpu.mesh.native``) is used when
    built, which is faster still.
    """
    from . import native
    if native.available():
        return native.unique_edges(cells)
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    all_edges = np.concatenate(
        [cells[:, [0, 1]], cells[:, [1, 2]], cells[:, [2, 0]]], axis=0)
    lo = all_edges.min(axis=1)
    hi = all_edges.max(axis=1)
    keys = np.unique((lo << 32) | hi)
    return np.stack([keys >> 32, keys & 0xFFFFFFFF], axis=1)


def generate_mesh(
    length: float = 2.0,
    height: float = 1.0,
    holes: List[Tuple[float, float, float]] = (
        (0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1)),
    boundaries: Dict[str, int] = None,
    nx: int = 100,
    ny: int = 50,
    variant: str = "zigzag",
    keep_dead_nodes: bool = False,
) -> TriMesh:
    """Rectangle-with-holes triangular mesh + BC tags.

    Same contract and defaults as the reference (``src/mesh.py:155-276``):
    ``boundaries`` maps face -> {0: none, 1: Dirichlet, 2: Neumann}.
    Returns a ``TriMesh`` (use ``.astuple()`` for the raw 6-tuple).

    ``keep_dead_nodes=True`` keeps hole-interior nodes in the node set
    (pinned: Dirichlet + frozen coordinates, referenced by no triangle)
    instead of deleting and renumbering.  Physics and element set are
    identical; the node numbering then stays the identity lattice
    numbering, so the lattice energy route (``mesh/lattice.py``) runs
    with ZERO gathers — at 922K elements with 3 holes that is ~4.9 ms
    -> ~0.1 ms per fwd+bwd step.  The cost: N includes the dead nodes
    (they carry exactly-zero gradients and solution values).
    """
    if boundaries is None:
        boundaries = {"up": 0, "down": 0, "right": 2, "left": 1}

    points, cells = rectangle_tri_zigzag(nx, ny, length, height, variant)

    # --- punch holes: drop inside-nodes (src/mesh.py:192-197)
    keep = np.ones(points.shape[0], dtype=bool)
    for cx, cy, r in holes:
        dx = points[:, 0] - cx
        dy = points[:, 1] - cy
        keep &= (dx * dx + dy * dy) > r * r
    if keep_dead_nodes:
        points_kept = points
        old_to_new = np.arange(points.shape[0], dtype=np.int64)
    else:
        points_kept = points[keep]
        old_to_new = -np.ones(points.shape[0], dtype=np.int64)
        old_to_new[keep] = np.arange(points_kept.shape[0])

    # --- keep fully-surviving triangles; survivors of cut triangles are
    #     geometric boundary nodes (src/mesh.py:204-216), vectorized
    tri_keep = keep[cells].all(axis=1)
    cells_kept = old_to_new[cells[tri_keep]]
    geom_boundary = np.zeros(points_kept.shape[0], dtype=bool)
    partial = cells[~tri_keep]
    if partial.size:
        surv = partial[keep[partial]]
        geom_boundary[old_to_new[surv]] = True
    dead = ~keep if keep_dead_nodes else None
    if dead is not None:
        geom_boundary |= dead      # frozen coordinates

    # --- outer rectangle boundary (src/mesh.py:219-224)
    for face in ("up", "down", "left", "right"):
        geom_boundary |= _face_mask(points_kept, face, length, height)

    # --- BC masks (src/mesh.py:227-249)
    bc_mask = np.zeros(points_kept.shape[0], dtype=bool)
    mn_mask = np.zeros(points_kept.shape[0], dtype=bool)
    for face, condition in boundaries.items():
        if condition == 0:
            continue
        m = _face_mask(points_kept, face, length, height)
        if condition == 1:
            bc_mask |= m
        elif condition == 2:
            mn_mask |= m
    if dead is not None:
        bc_mask |= dead            # values pinned (zero grads + zeros
        mn_mask &= ~dead           # in the solution at dead nodes)

    # --- Neumann edges: both endpoints Neumann (src/mesh.py:252-259).
    # Filter to candidate edges BEFORE dedup: the full-mesh unique-edge
    # sort is O(3 Ne log Ne) (~3 s at 3.7M elements) while Neumann
    # candidates are O(boundary) — same result, startup-time win.
    mn_elem = mn_mask[cells_kept]                       # [Ne, 3]
    cand = []
    for a, b in ((0, 1), (1, 2), (2, 0)):
        sel = mn_elem[:, a] & mn_elem[:, b]
        if sel.any():
            cand.append(cells_kept[sel][:, [a, b]])
    if cand:
        pairs = np.concatenate(cand, axis=0).astype(np.int64)
        lo = pairs.min(axis=1)
        hi = pairs.max(axis=1)
        keys = np.unique((lo << 32) | hi)
        neumann_edges = np.stack([keys >> 32, keys & 0xFFFFFFFF], axis=1)
    else:
        neumann_edges = np.zeros((0, 2), dtype=np.int64)

    return TriMesh.from_arrays(
        coords=points_kept.astype(np.float32),
        connectivity=cells_kept,
        geom_boundary_mask=geom_boundary,
        dirichlet_mask=bc_mask,
        neumann_mask=mn_mask,
        neumann_edges=neumann_edges,
    )


def proxy_plate_mesh(nx: int = 81, ny: int = 41, length: float = 2.0,
                     height: float = 1.0, variant: str = "up") -> TriMesh:
    """The hole-free benchmark plate from BASELINE.md: structured
    triangulation (uniform "up" diagonals — the variant whose
    reference-compat plateau matches the measured baseline), left edge
    Dirichlet, right edge Neumann (100 kN default traction comes from the
    energy loss).  nx=81, ny=41 gives 6,400 P1 elements / 3,321 nodes —
    the measured-baseline configuration."""
    return generate_mesh(length=length, height=height, holes=(),
                         boundaries={"up": 0, "down": 0, "right": 2,
                                     "left": 1},
                         nx=nx, ny=ny, variant=variant)
