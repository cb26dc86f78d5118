"""Device-resident mesh containers (frozen pytrees).

The reference passes a 6-tuple of torch tensors around
(``/root/reference/src/mesh.py:146-153``); here the same contract is a
registered-dataclass pytree so it can flow through ``jit``/``pjit`` as an
operand (no recompilation per mesh, shardable, donate-able).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TriMesh", "build_incidence_table"]


def build_incidence_table(connectivity: np.ndarray, n_nodes: int
                          ) -> np.ndarray:
    """Node -> flat-connectivity-row incidence table [N, max_degree].

    Entry [n, k] is the k-th index into the flattened [Ne*3] connectivity
    that references node n (-1 padding for nodes of lower degree).  Built
    once on the host in O(Ne); lets reverse-mode assembly gather per-row
    element cotangents instead of scatter-adding them (the TPU scatter is
    the single slowest op in the energy backward).
    """
    from . import native
    if native.available():
        return native.build_incidence_table(connectivity, n_nodes)
    flat = np.asarray(connectivity, dtype=np.int64).reshape(-1)
    order = np.argsort(flat, kind="stable")
    sorted_nodes = flat[order]
    counts = np.bincount(sorted_nodes, minlength=n_nodes)
    maxdeg = int(counts.max()) if counts.size else 0
    table = np.full((n_nodes, maxdeg), -1, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # rank of each sorted entry within its node's group
    ranks = np.arange(flat.size) - starts[sorted_nodes]
    table[sorted_nodes, ranks] = order.astype(np.int32)
    return table


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriMesh:
    """An unstructured triangular mesh with BC tags.

    Same information as the reference's mesh-generator return contract
    (``src/mesh.py:139-153``):

    Attributes:
      coords: [N, 2] float — initial node coordinates.
      connectivity: [Ne, 3] int32 — P1 triangle node indices.
      geom_boundary_mask: [N] bool — geometric boundary nodes (their
        coordinates stay frozen under r-adaptivity).
      dirichlet_mask: [N] bool — nodes with prescribed displacement.
      neumann_mask: [N] bool — nodes on the traction boundary.
      neumann_edges: [E, 2] int32 — edges whose both nodes are Neumann.
    """

    coords: jax.Array
    connectivity: jax.Array
    geom_boundary_mask: jax.Array
    dirichlet_mask: jax.Array
    neumann_mask: jax.Array
    neumann_edges: jax.Array
    # Optional node -> (element, vertex) incidence table [N, max_degree]
    # indexing rows of the flattened [Ne*3] connectivity; unused slots hold
    # -1 (gathers the appended zeros row in the transposed-assembly
    # backward, so padding needs no masks).  Lets the energy backward
    # replace the TPU-slow scatter-add with a gather (scatter runs ~7x
    # slower per row than gather on v5e — measured).  None -> plain
    # scatter-add AD (required for element-sharded multichip meshes, where
    # nodal grads reduce across shards).
    incidence: Optional[jax.Array] = None
    # Optional blocked-window assembly tables for large banded meshes
    # (mesh/banded.py): keeps every assembly gather below the TPU's
    # ~256K-row table cliff.  Auto-built by from_arrays for big meshes.
    banded: Optional[object] = None
    # Optional quad-paired blocked-window tables (mesh/banded.py:
    # build_paired_assembly, k=4): edge-adjacent triangles share 4
    # gather/cotangent rows instead of 6 and incidence degree drops,
    # which on the per-row-latency-bound v5e gathers is a measured 2.0x
    # on the unstructured vg chain (tools/microbench_quadpair.py).  The
    # Pallas banded route AND shard_map_banded_energy prefer these
    # tables when present (reband_for_shards rebuilds them with the
    # device-count block multiple); the triangle tables stay for the
    # XLA fallback.  Disable with build_banded="nopair" or
    # HDNN_NO_PAIR=1.  Tests: tests/test_paired_banded.py.
    banded_paired: Optional[object] = None
    # Optional fused domain+edge tables (ops/pallas_energy.py 13-row
    # kernel): connectivity with Neumann edges appended as (n0, n1, n1)
    # pseudo-elements, and the incidence table over THAT augmented flat
    # row space — so traction work rides the element gather/kernel and
    # its cotangents flow through the same incidence backward.  Built by
    # from_arrays whenever edges exist; None disables the fused-total
    # path.
    fused_connectivity: Optional[jax.Array] = None
    fused_incidence: Optional[jax.Array] = None
    # Optional recovered lattice structure (mesh/lattice.py): set when
    # the mesh is a lattice triangulation (the structured generator's
    # output, with or without punched holes).  Lets the energy replace
    # its assembly gathers with lattice slices — the gather-free
    # structured fast path behind the unstructured API.  None for
    # genuinely unstructured (gmsh-style) meshes and for element-sharded
    # copies (the sharded paths own their distribution).
    lattice: Optional[object] = None
    # Optional hybrid lattice+collar route (mesh/hybrid.py): a lattice
    # covering the node-table prefix plus a small irregular element set
    # (hole collars).  Attached by generate_mesh_hybrid — detection
    # can't find it (rim nodes are off-lattice); the energy evaluates
    # the lattice part from slices and only the collar by gather.
    hybrid: Optional[object] = None

    @property
    def n_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def n_elements(self) -> int:
        return self.connectivity.shape[0]

    @property
    def n_neumann_edges(self) -> int:
        return self.neumann_edges.shape[0]

    @classmethod
    def from_arrays(cls, coords, connectivity, geom_boundary_mask=None,
                    dirichlet_mask=None, neumann_mask=None,
                    neumann_edges=None, dtype=jnp.float32,
                    build_incidence=True, build_banded="auto",
                    build_lattice=True, build_fused=True) -> "TriMesh":
        """Normalize host arrays into a device-ready TriMesh.

        build_banded: "auto" builds blocked-window assembly tables when
        any assembly gather table would exceed the TPU row-rate cliff
        (large meshes); True forces it; False skips.
        build_lattice: attempt lattice detection (mesh/lattice.py) so
        lattice-topology meshes get the gather-free energy route; the
        detector rejects genuinely unstructured meshes cheaply.
        """
        coords = jnp.asarray(np.asarray(coords), dtype=dtype)
        n = coords.shape[0]

        def _mask(m):
            if m is None:
                return jnp.zeros((n,), dtype=bool)
            return jnp.asarray(np.asarray(m), dtype=bool)

        if neumann_edges is None:
            neumann_edges = np.zeros((0, 2), dtype=np.int32)
        conn_np = np.asarray(connectivity)
        inc_np = (build_incidence_table(conn_np, n)
                  if build_incidence and conn_np.size else None)

        banded = banded_paired = None
        want_banded = (build_banded in (True, "nopair") or (
            build_banded == "auto"
            and conn_np.size
            and max(n, 3 * conn_np.shape[0]) > 250_000))
        if want_banded and inc_np is not None:
            from .banded import build_banded_assembly
            banded = build_banded_assembly(conn_np, n, inc_np)
            import os
            if (banded is not None and build_banded != "nopair"
                    and not os.environ.get("HDNN_NO_PAIR")):
                from .banded import (build_paired_assembly,
                                     build_striped_assembly)
                if os.environ.get("HDNN_STRIPS"):
                    # opt-in k=6 strip tables (4 triangles / 6 rows):
                    # see strip_connectivity; falls back to pairs
                    banded_paired = build_striped_assembly(conn_np, n)
                if banded_paired is None:
                    banded_paired = build_paired_assembly(conn_np, n)

        edges_np = np.asarray(neumann_edges)
        lattice = None
        if build_lattice and conn_np.size:
            from .lattice import detect_lattice
            lattice = detect_lattice(np.asarray(coords), conn_np,
                                     edges_np)

        fused_conn = fused_inc = None
        if build_fused and build_incidence and conn_np.size \
                and edges_np.size:
            edge_tri = np.concatenate(
                [edges_np, edges_np[:, 1:2]], axis=1)     # (n0, n1, n1)
            fused_conn = np.concatenate(
                [conn_np, edge_tri]).astype(np.int32)
            fused_inc = build_incidence_table(fused_conn, n)

        return cls(
            coords=coords,
            connectivity=jnp.asarray(conn_np, dtype=jnp.int32),
            geom_boundary_mask=_mask(geom_boundary_mask),
            dirichlet_mask=_mask(dirichlet_mask),
            neumann_mask=_mask(neumann_mask),
            neumann_edges=jnp.asarray(np.asarray(neumann_edges),
                                      dtype=jnp.int32),
            incidence=jnp.asarray(inc_np) if inc_np is not None else None,
            banded=banded,
            banded_paired=banded_paired,
            fused_connectivity=(jnp.asarray(fused_conn)
                                if fused_conn is not None else None),
            fused_incidence=(jnp.asarray(fused_inc)
                             if fused_inc is not None else None),
            lattice=lattice,
        )

    def astuple(self):
        """The reference's 6-tuple contract (``src/mesh.py:146-153``)."""
        return (self.coords, self.connectivity, self.geom_boundary_mask,
                self.dirichlet_mask, self.neumann_mask, self.neumann_edges)
