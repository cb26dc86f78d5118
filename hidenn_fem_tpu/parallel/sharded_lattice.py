"""Multi-chip lattice-route energy: the fastest single-chip path on ICI.

The lattice route (``ops/lattice_energy.py``) evaluates the plane-stress
energy of lattice-topology TriMeshes from SLICES of the [nx, ny, 4]
node lattice — zero assembly gathers.  This module row-shards that
lattice over the device mesh under GSPMD, the same proven pattern as
``parallel/sharded_mg.py``:

* pad the row axis with DEAD quad rows (``t1 = t2 = 0`` masks, zero
  node rows) until it divides the device count — the padded quads mix
  real and zero corners, but their energy AND its gradient are exactly
  zero through the mask multiply (and the safe-det guard keeps the
  masked values finite), so no further masking is needed;
* a ``with_sharding_constraint`` row-shards the padded lattice; the
  stencil slices ``lat[:-1] / lat[1:]`` become ICI halo exchanges
  automatically under GSPMD;
* the traction work reads O(boundary) face slices of the UNPADDED
  lattice, so padding side never interacts with the loaded faces (the
  ``pad_lattice_side`` concern of the structured grid does not arise).

Zero-padding and row-slicing are adjoint, so value AND both gradient
groups match the single-device route exactly up to float reassociation
(equality-tested in ``tests/test_sharding.py``).

The reference has no distributed anything (SURVEY §5 — grep-verified);
this composes its hot path (``/root/reference/src/loss.py:55-116``) at
lattice speed with the element-DP mandate.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import quadrature as quad
from ..ops.lattice_energy import (_domain_from_lat, _edge_work, _lat,
                                  body_work_from_lat, collar_energy)
from .sharding import ELEM_AXIS

__all__ = ["sharded_lattice_energy"]


def _pad_route_rows(route, k: int):
    """Route with ``k`` dead quad rows appended: presence masks zero
    (padded quads contribute exactly nothing), ``sel`` arbitrary (1),
    edge masks dropped (the traction term always reads the unpadded
    lattice)."""
    if k == 0:
        return dataclasses.replace(route, edge_masks={})
    z = ((0, k), (0, 0))
    return dataclasses.replace(
        route,
        sel=jnp.pad(route.sel, z, constant_values=1.0),
        t1=jnp.pad(route.t1, z),
        t2=jnp.pad(route.t2, z),
        edge_masks={},
        all_present=False,      # pad quads rely on the t1/t2 masks
        nx=route.nx + k)


def sharded_lattice_energy(energy, dmesh: Mesh, axis: str = ELEM_AXIS):
    """``loss_fn(params, tri_mesh)`` == ``energy.total`` with the node
    lattice row-sharded over ``dmesh``.

    ``tri_mesh.lattice`` must be present (lattice-topology meshes: the
    structured generator's output, holes included; prefer
    ``generate_mesh(..., keep_dead_nodes=True)`` so hole meshes keep the
    zero-gather identity numbering — a renumbered mesh's permutation
    fill runs replicated before the shard constraint).  The energy must
    be on the lattice-routable configuration (fused assembly, exact
    compat, default traction; body force rides the sharded slices) —
    same guards as ``PlaneStressEnergy._lattice_total``.
    """
    n_dev = int(dmesh.devices.size)
    spec = NamedSharding(dmesh, P(axis, None, None))

    def loss_fn(params, tri):
        route = tri.lattice
        hy = getattr(tri, "hybrid", None)
        if route is None and hy is not None:
            # hybrid lattice+collar meshes (mesh/hybrid.py): the heavy
            # lattice block shards exactly like a plain lattice mesh;
            # the O(rim) collar gather stays replicated (a few thousand
            # rows — GSPMD keeps it off the sharded axis)
            route = hy.lattice
        if route is None:
            raise ValueError("mesh has no lattice route (gmsh-style "
                             "meshes: use shard_map_banded_energy)")
        if (energy.assembly != "fused" or energy.compat != "exact"
                or energy.traction is not None):
            raise ValueError("energy configuration is not "
                             "lattice-routable (see docstring)")
        node = energy.model.packed_nodes(params, tri)
        lat = _lat(node, route)
        t_x = energy.F_total / energy.traction_length
        work = _edge_work(lat, route, float(t_x))
        k = (-route.nx) % n_dev
        lat_p = jnp.pad(lat, ((0, k), (0, 0), (0, 0)))
        lat_p = jax.lax.with_sharding_constraint(lat_p, spec)
        w_sum = quad.triangle_weight_sum(energy.gauss_order)
        route_p = _pad_route_rows(route, k)
        dom = _domain_from_lat(lat_p, route_p, float(energy.E),
                               float(energy.nu), w_sum)
        e = dom - work
        pts = w = None
        if energy.body_force is not None:
            # body work shards like the domain term: the padded dead
            # quad rows have t1 = t2 = 0, masking them out of the sum
            pts, w = energy._domain_rule()
            e = e - body_work_from_lat(lat_p, route_p,
                                       energy.body_force, pts, w)
        if hy is not None and tri.lattice is None and \
                hy.extra_conn.shape[0]:
            e = e + collar_energy(node, hy, float(energy.E),
                                  float(energy.nu), w_sum,
                                  body_force=energy.body_force,
                                  pts=pts, w=w)
        return e

    return loss_fn
