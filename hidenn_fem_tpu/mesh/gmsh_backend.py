"""gmsh-based unstructured mesh generation (optional dependency, gated).

Capability parity with the reference's ``generate_mesh_gmsh``
(``/root/reference/src/mesh.py:8-153``): OCC rectangle minus circular
holes, 2D triangular meshing at size ``lc``, geometric-boundary detection
from boundary curves plus a radial hole test, coordinate-tolerance BC masks,
and Neumann-edge extraction.

gmsh is host-only C++ behind a Python API; like the reference, it runs as
pure preprocessing outside any jit boundary.  The import is gated so the
rest of the framework (and the test suite) never needs gmsh — the
structured generator in ``structured.py`` covers that.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .structured import unique_edges, _face_mask
from .types import TriMesh

__all__ = ["generate_mesh_gmsh", "have_gmsh", "assemble_gmsh_mesh"]


def have_gmsh() -> bool:
    try:
        import gmsh  # noqa: F401
        return True
    except ImportError:
        return False


def assemble_gmsh_mesh(node_tags, points, tri_tags, boundary_node_tags,
                       holes, boundaries, length, height,
                       reorder: bool = False) -> TriMesh:
    """Pure post-gmsh assembly (no gmsh API): tag remap, geometric
    boundary + radial hole safety net, coordinate-tolerance BC masks,
    Neumann-edge extraction (``/root/reference/src/mesh.py:48-153``
    analog).  Split out of ``generate_mesh_gmsh`` so it is unit-testable
    without gmsh installed (a fake gmsh module drives the API shell).

    Args:
      node_tags: [N] gmsh node tags (arbitrary positive ints, any order).
      points: [N, 2] node coordinates in tag order.
      tri_tags: [Ne, 3] triangle connectivity IN TAGS.
      boundary_node_tags: set/array of tags on boundary curves/points.
      holes / boundaries / length / height: the generator's arguments.
      reorder: apply the bandwidth-reducing RCM node permutation +
        min-node element sort before building the device tables.
        Generator front-ends default this ON: raw mesher node order
        scatters each element block's node window across the whole
        table and defeats the blocked-window assembly (measured 47.9
        vs 18.3 ms/step at ~900K elements on v5e).  Default False here
        so the pure assembly preserves tag order for unit tests.
    """
    node_tags = np.asarray(node_tags)
    points = np.asarray(points, dtype=np.float64)
    tri_tags = np.asarray(tri_tags, dtype=np.int64)
    if np.array_equal(node_tags, np.arange(len(node_tags))):
        # identity tags (e.g. the Delaunay backend): skip the dict remap
        cells = tri_tags
    elif tri_tags.size:
        tag_to_idx = {int(t): i for i, t in enumerate(node_tags)}
        remap = np.vectorize(tag_to_idx.__getitem__, otypes=[np.int64])
        cells = remap(tri_tags)
    else:
        cells = tri_tags.astype(np.int64)

    bset = set(int(t) for t in boundary_node_tags)
    geom_boundary = np.array([int(t) in bset for t in node_tags])
    # radial hole test as a safety net (src/mesh.py:90-95)
    for cx, cy, r in holes:
        dist = np.hypot(points[:, 0] - cx, points[:, 1] - cy)
        geom_boundary |= np.abs(dist - r) < 1e-6

    bc_mask = np.zeros(points.shape[0], dtype=bool)
    mn_mask = np.zeros(points.shape[0], dtype=bool)
    for face, condition in boundaries.items():
        if condition == 0:
            continue
        m = _face_mask(points, face, length, height)
        if condition == 1:
            bc_mask |= m
        elif condition == 2:
            mn_mask |= m

    if reorder and cells.size:
        from .banded import rcm_node_order
        perm = rcm_node_order(cells, len(points))
        inv = np.empty(len(points), dtype=np.int64)
        inv[perm] = np.arange(len(points))
        points = points[perm]
        geom_boundary = geom_boundary[perm]
        bc_mask = bc_mask[perm]
        mn_mask = mn_mask[perm]
        cells = inv[cells]
        cells = cells[np.argsort(cells.min(axis=1), kind="stable")]

    uedges = unique_edges(cells)
    neumann_edges = uedges[np.all(mn_mask[uedges], axis=1)]

    return TriMesh.from_arrays(
        coords=points.astype(np.float32),
        connectivity=cells,
        geom_boundary_mask=geom_boundary,
        dirichlet_mask=bc_mask,
        neumann_mask=mn_mask,
        neumann_edges=neumann_edges,
    )


def generate_mesh_gmsh(
    length: float = 2.0,
    height: float = 1.0,
    holes: List[Tuple[float, float, float]] = (
        (0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1)),
    boundaries: Dict[str, int] = None,
    lc: float = 1e-1,
    reorder: bool = True,
) -> TriMesh:
    """Rectangle-with-holes unstructured mesh via gmsh OCC boolean cut.

    Mirrors ``src/mesh.py:8-153`` (same arguments and defaults).  Raises
    ImportError with a pointer to the structured fallback when gmsh is not
    installed.

    ``reorder`` (default True) applies the RCM bandwidth-reducing node
    permutation before the device tables are built — raw gmsh node
    order defeats the blocked-window assembly (2.6x slower steps at
    ~900K elements; see ``assemble_gmsh_mesh``).  Node/element indexing
    then differs from raw gmsh output; disable for tag-order fidelity.
    """
    try:
        import gmsh
    except ImportError as e:
        raise ImportError(
            "gmsh is not installed; use hidenn_fem_tpu.mesh.generate_mesh "
            "(structured triangulation, no external deps) instead"
        ) from e

    if boundaries is None:
        boundaries = {"up": 0, "down": 0, "right": 2, "left": 1}

    gmsh.initialize()
    try:
        gmsh.model.add("plate_with_holes")
        rect = gmsh.model.occ.addRectangle(0, 0, 0, length, height)
        hole_tags = [(2, gmsh.model.occ.addDisk(cx, cy, 0, r, r))
                     for cx, cy, r in holes]
        if hole_tags:
            out = gmsh.model.occ.cut([(2, rect)], hole_tags)
            domain = out[0][0][1]
        else:
            domain = rect
        gmsh.model.occ.synchronize()
        gmsh.model.mesh.setSize(gmsh.model.getEntities(0), lc)
        gmsh.model.mesh.generate(2)

        node_tags, node_xyz, _ = gmsh.model.mesh.getNodes()
        points = np.asarray(node_xyz).reshape(-1, 3)[:, :2]

        elem_types, _, elem_node_tags = gmsh.model.mesh.getElements(2)
        tris = [np.asarray(nodes).reshape(-1, 3)
                for etype, nodes in zip(elem_types, elem_node_tags)
                if etype == 2]
        tri_tags = (np.vstack(tris) if tris
                    else np.zeros((0, 3), dtype=np.int64))

        # geometric boundary: nodes on all boundary curves and their points
        boundary_node_tags = set()
        for dim, tag in gmsh.model.getBoundary([(2, domain)], oriented=False,
                                               recursive=False):
            boundary_node_tags.update(gmsh.model.mesh.getNodes(dim, tag)[0])
            for pdim, ptag in gmsh.model.getBoundary([(dim, tag)],
                                                     oriented=False,
                                                     recursive=False):
                boundary_node_tags.update(
                    gmsh.model.mesh.getNodes(pdim, ptag)[0])
    finally:
        gmsh.finalize()

    return assemble_gmsh_mesh(node_tags, points, tri_tags,
                              boundary_node_tags, holes, boundaries,
                              length, height, reorder=reorder)
