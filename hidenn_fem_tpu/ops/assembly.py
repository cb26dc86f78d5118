"""Gather/scatter assembly primitives tuned for TPU.

FEM assembly is gathers of nodal data per element (forward) and the
transposed scatter-add of per-element cotangents back to nodes (reverse).
On TPU, gathers run at ~1 row/cycle but XLA's scatter-add with duplicate
indices is ~7x slower per row (measured on v5e) — it dominates the energy
backward.  ``gather_with_incidence`` keeps the forward gather but replaces
the AD scatter with a second *gather* over a precomputed node->element
incidence table (``mesh.types.build_incidence_table``):

    grad_node[n] = sum_k ct_flat[incidence[n, k]]

Unused incidence slots hold -1, which (as a negative index) gathers the
zeros row appended to the cotangent — no masks, and element padding
appended after the table was built is harmless because padded degenerate
elements produce exactly-zero cotangents.

Not used for element-sharded meshes: there the nodal gradient needs a
cross-shard reduction, which the scatter-add AD + psum already provides
(``parallel/sharding.py`` drops the incidence field when sharding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gather_with_incidence"]


@jax.custom_vjp
def gather_with_incidence(node, conn, incidence):
    """node[conn] with a gather-based (scatter-free) backward.

    Args:
      node: [N, F] nodal data.
      conn: [Ne, V] int element connectivity.
      incidence: [N, max_degree] int table from
        ``build_incidence_table(conn, N)`` (-1 padded).
    Returns:
      [Ne, V, F] gathered rows.
    """
    return node[conn]


def _fwd(node, conn, incidence):
    return node[conn], (conn, incidence, node.shape)


def _bwd(res, ct):
    conn, incidence, node_shape = res
    f = ct.shape[-1]
    ct_flat = ct.reshape(-1, f)
    ct_flat = jnp.concatenate(
        [ct_flat, jnp.zeros((1, f), ct_flat.dtype)], axis=0)
    grad_node = jnp.sum(ct_flat[incidence], axis=1)
    return grad_node, None, None


gather_with_incidence.defvjp(_fwd, _bwd)
