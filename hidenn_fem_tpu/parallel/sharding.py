"""Element-batch data parallelism over a JAX device mesh.

The reference has no distributed code at all (SURVEY.md §2: no
torch.distributed/NCCL/MPI anywhere); its only parallelism is one batched
tensor op on one device (``src/loss.py:60-65``).  The TPU-native scaling
axis for HiDeNN-FEM is the **element/quadrature-point dimension**: the
total energy is a sum of independent per-element terms that only *gather*
from small replicated nodal arrays, so the natural distribution is

* shard ``connectivity`` (and ``neumann_edges``) along the element axis
  across chips,
* replicate nodal parameter arrays (they are O(N) small vs O(Ne*ng)
  activations),
* let XLA/GSPMD partition the gathers + elementwise energy kernel and
  insert the final cross-chip ``psum`` for the scalar reduction —
  collectives ride ICI, no halo exchange is ever needed.

Two implementations are provided:

* ``shard_mesh`` + plain ``jit``: GSPMD auto-partitioning from sharded
  operands (the idiomatic pjit route; works with every solver in
  ``solve/`` unchanged).
* ``shard_map_energy``: explicit per-device energy with a hand-placed
  ``psum`` (useful for inspection and as a cross-check).

Padding: element counts must divide the mesh axis; ``pad_mesh`` appends
*degenerate* elements (all three nodes = node 0) and edges (both nodes =
node 0).  These contribute exactly zero to energy and gradients: identical
nodes give grad_u == 0 and detJ == 0 (and ds == 0 for edges), so every
padded term is 0 * 0 — no masking arrays needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.types import TriMesh

__all__ = ["device_mesh", "pad_mesh", "shard_mesh", "replicate",
           "shard_map_energy", "mesh_shardings", "reband_for_shards",
           "shard_map_banded_energy"]

ELEM_AXIS = "elem"


def device_mesh(n_devices: Optional[int] = None, axis: str = ELEM_AXIS
                ) -> Mesh:
    """1D device mesh over the element axis (the domain's single natural
    parallel axis; see module docstring)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _ceil_to(n: int, k: int) -> int:
    return -(-n // k) * k


def pad_mesh(tri: TriMesh, n_shards: int) -> TriMesh:
    """Pad element/edge tables to multiples of ``n_shards`` with degenerate
    (zero-contribution) entries; node arrays are untouched."""
    ne = tri.n_elements
    ne_pad = _ceil_to(ne, n_shards)
    conn = tri.connectivity
    if ne_pad != ne:
        pad = jnp.zeros((ne_pad - ne, 3), dtype=conn.dtype)
        conn = jnp.concatenate([conn, pad], axis=0)
    nedg = tri.n_neumann_edges
    nedg_pad = _ceil_to(max(nedg, 1), n_shards) if nedg else 0
    edges = tri.neumann_edges
    if nedg and nedg_pad != nedg:
        pad = jnp.zeros((nedg_pad - nedg, 2), dtype=edges.dtype)
        edges = jnp.concatenate([edges, pad], axis=0)
    # a stored lattice route no longer describes the padded connectivity
    return dataclasses.replace(tri, connectivity=conn,
                               neumann_edges=edges, lattice=None)


def mesh_shardings(dmesh: Mesh, axis: str = ELEM_AXIS) -> TriMesh:
    """A TriMesh of NamedShardings: element tables sharded, nodes
    replicated (pass as in_shardings / to device_put).  The incidence
    field is None: sharded meshes use the scatter-add AD path, whose
    cross-shard psum produces the correct reduced nodal gradients."""
    elem = NamedSharding(dmesh, P(axis))
    repl = NamedSharding(dmesh, P())
    return TriMesh(
        coords=repl,
        connectivity=elem,
        geom_boundary_mask=repl,
        dirichlet_mask=repl,
        neumann_mask=repl,
        neumann_edges=elem,
        incidence=None,
        banded=None,
        fused_connectivity=None,
        fused_incidence=None,
        lattice=None,
    )


def shard_mesh(tri: TriMesh, dmesh: Mesh, axis: str = ELEM_AXIS) -> TriMesh:
    """Pad + place a TriMesh onto the device mesh: connectivity and
    neumann_edges sharded over ``axis``, nodal arrays replicated.

    The returned mesh can be closed over (or passed) into any jitted loss;
    GSPMD propagates the shardings through gathers and inserts the psum
    for scalar reductions.
    """
    tri = dataclasses.replace(pad_mesh(tri, dmesh.devices.size),
                              incidence=None, banded=None,
                              banded_paired=None,
                              fused_connectivity=None,
                              fused_incidence=None, lattice=None,
                              hybrid=None)
    shardings = mesh_shardings(dmesh, axis)
    return jax.tree.map(jax.device_put, tri, shardings)


def replicate(pytree, dmesh: Mesh):
    """Replicate a parameter pytree across the device mesh."""
    repl = NamedSharding(dmesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), pytree)


def shard_map_energy(energy, dmesh: Mesh, axis: str = ELEM_AXIS):
    """Explicit-collective version: per-device partial energies + psum.

    Returns ``loss_fn(params, tri_mesh)`` where ``tri_mesh`` must already
    be padded (``pad_mesh``).  Each device computes the energy of its
    element block against the fully replicated nodal arrays, then the
    scalar partials are psum-reduced over ICI.

    Note: the domain/edge partial energies are linear in the element set,
    so psum(partials) == total exactly (up to float reassociation).
    """
    in_specs = (P(), TriMesh(
        coords=P(), connectivity=P(axis), geom_boundary_mask=P(),
        dirichlet_mask=P(), neumann_mask=P(), neumann_edges=P(axis),
        incidence=None, banded=None,
        fused_connectivity=None, fused_incidence=None, lattice=None))

    def per_device(params, tri):
        dom = energy.domain_energy(params, tri)
        edg = energy.edge_energy(params, tri)
        return jax.lax.psum(dom - edg, axis)

    fn = jax.shard_map(per_device, mesh=dmesh, in_specs=in_specs,
                       out_specs=P(), check_vma=False)

    def loss_fn(params, tri):
        # incidence/banded are derived single-device assembly tables; the
        # scatter-AD + psum path owns gradient reduction under sharding
        return fn(params, dataclasses.replace(tri, incidence=None,
                                              banded=None,
                                              banded_paired=None,
                                              fused_connectivity=None,
                                              fused_incidence=None,
                                              lattice=None, hybrid=None))

    return loss_fn


def reband_for_shards(tri: TriMesh, n_shards: int,
                      window_limit: Optional[int] = None,
                      pair: bool = True) -> TriMesh:
    """Rebuild a TriMesh's banded tables with block counts divisible by
    ``n_shards`` so ``shard_map_banded_energy`` can hand each device a
    contiguous slice of element/node blocks.

    ``pair=True`` (default) builds the quad-paired tables
    (``mesh/banded.py:build_paired_assembly``) with the device block
    multiple, so the sharded path runs the SAME table layout as the
    single-device production route (the measured ~1.56x pairing win at
    922K carries over per device).  Only the table set that will
    actually run is built and shipped (``shard_map_banded_energy``
    prefers paired): when pairing succeeds the triangle tables are
    dropped rather than duplicated on every device.  Set ``pair=False``
    — or export HDNN_NO_PAIR — to shard the triangle tables only."""
    import os
    from ..mesh.banded import (build_banded_assembly,
                               build_paired_assembly, WINDOW_LIMIT)
    from ..mesh.types import build_incidence_table

    conn = np.asarray(tri.connectivity)
    wl = window_limit or WINDOW_LIMIT
    if pair and not os.environ.get("HDNN_NO_PAIR"):
        paired = build_paired_assembly(conn, tri.n_nodes,
                                       window_limit=wl,
                                       block_multiple=n_shards)
        if paired is not None and paired.re_conn_rel is not None:
            return dataclasses.replace(tri, banded=None,
                                       banded_paired=paired)
    inc = (np.asarray(tri.incidence) if tri.incidence is not None
           else build_incidence_table(conn, tri.n_nodes))
    ba = build_banded_assembly(conn, tri.n_nodes, inc,
                               window_limit=wl, block_multiple=n_shards)
    if ba is None or ba.re_conn_rel is None:
        raise ValueError(
            f"mesh not bandable with block counts divisible by {n_shards} "
            "(try reorder_mesh or a larger window_limit)")
    return dataclasses.replace(tri, banded=ba, banded_paired=None)


def shard_map_banded_energy(energy, dmesh: Mesh, axis: str = ELEM_AXIS):
    """Element-sharded energy that KEEPS the single-chip fast paths.

    Unlike ``shard_map_energy`` (global gathers + scatter-add AD), this
    composes the blocked-window Pallas energy with the device mesh: the
    banded tables' *block axes* are sharded over devices, so each device
    scans its contiguous slice of element blocks (forward, psum of scalar
    partials) and of node blocks (backward).  The single-pass recompute
    backward makes this communication-free for gradients: a node block's
    gradient only needs its incident element window, which its owner
    recomputes locally (halo recompute instead of halo exchange); the
    per-device zero-padded nodal cotangents are summed by shard_map's
    transpose of the replicated node-table input.

    Requires tables built with ``reband_for_shards(tri, n_devices)``.
    Returns ``loss_fn(params, tri)``.
    """
    from ..mesh.banded import BandedAssembly
    from ..ops import quadrature as quad
    from ..ops.banded_energy import _banded_energy_rows

    D = dmesh.devices.size

    def loss_fn(params, tri):
        # same preference order as the single-device route
        # (ops/losses.py): quad-paired tables when present
        ba = (tri.banded_paired if tri.banded_paired is not None
              else tri.banded)
        if ba is None or ba.re_conn_rel is None:
            raise ValueError("mesh has no recompute banded tables; "
                             "build with reband_for_shards")
        if ba.starts.shape[0] % D or ba.re_nstarts.shape[0] % D:
            raise ValueError("banded block counts not divisible by the "
                             "device count; rebuild with reband_for_shards")
        node = energy.model.packed_nodes(params, tri)
        w_sum = quad.triangle_weight_sum(energy.gauss_order)
        E, nu = float(energy.E), float(energy.nu)
        interpret = (energy.backend == "pallas_interpret"
                     or jax.default_backend() == "cpu")
        nbr = ba.re_inc_rel.shape[1]
        rows_per_dev = (ba.re_nstarts.shape[0] // D) * nbr
        row_starts = jnp.arange(D, dtype=jnp.int32) * rows_per_dev
        has_own = ba.re_own_lo is not None
        own = (jnp.stack([ba.re_own_lo, ba.re_own_hi], axis=1) if has_own
               else jnp.zeros((ba.re_nstarts.shape[0], 2), jnp.int32))

        def body(node_rep, starts, conn_rel, re_ns, re_cr, re_ir, ow, rs):
            ba_loc = BandedAssembly(
                starts=starts, conn_rel=conn_rel,
                ct_starts=None, inc_rel=None,
                re_nstarts=re_ns, re_estarts=None,
                re_conn_rel=re_cr, re_inc_rel=re_ir,
                re_own_lo=ow[:, 0] if has_own else None,
                re_own_hi=ow[:, 1] if has_own else None,
                wnode=ba.wnode, wct=0,
                re_wnode=ba.re_wnode, re_ew=ba.re_ew, k=ba.k)
            part = _banded_energy_rows(node_rep, ba_loc, E, nu, w_sum,
                                       interpret, rs[0])
            return jax.lax.psum(part, axis)

        fn = jax.shard_map(
            body, mesh=dmesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis)),
            out_specs=P(), check_vma=False)
        dom = fn(node, ba.starts, ba.conn_rel, ba.re_nstarts,
                 ba.re_conn_rel, ba.re_inc_rel, own, row_starts)
        return dom - energy.edge_energy(params, tri)

    return loss_fn
