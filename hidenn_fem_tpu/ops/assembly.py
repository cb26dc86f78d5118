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

__all__ = ["flat_gather", "gather_with_incidence", "gather_banded"]


def flat_gather(table, idx):
    """table[idx] with the index array flattened first.

    XLA lowers row gathers with multi-dimensional index arrays to a ~2.5x
    slower TPU gather than the equivalent flat-index gather (measured on
    v5e at ~1M rows: 21.8ms vs 8.7ms for [EB,3]-shaped vs [EB*3]-shaped
    indices into the same table).  Shape is restored after the gather.
    """
    idx = jnp.asarray(idx)
    out = table[idx.reshape(-1)]
    return out.reshape(*idx.shape, table.shape[-1])


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
    return flat_gather(node, conn)


def _fwd(node, conn, incidence):
    return flat_gather(node, conn), (conn, incidence, node.shape)


# Below this many output rows the split per-slot form LOSES: each of the
# K separate gathers pays a fixed per-op cost that small shapes cannot
# amortize — the 2.5K-row hybrid collar measured 1723 us/step split vs
# 377 flat (tools/microbench_collar.py), while the ~29K-row banded node
# blocks measured 9.29 ms split vs 12.14 flat at 922K
# (tools/microbench_pairlegs.py legs D2/D3).  Both forms are exactly
# equal; the gate is a trace-time static-shape branch.
_SPLIT_MIN_ROWS = 16384


def incidence_gather_sum(table, inc):
    """Sum incident rows ``table[inc[:, k]]`` over the degree axis.

    For large outputs (>= ``_SPLIT_MIN_ROWS`` rows) this issues K
    separate per-slot gathers, NOT one flat [N*K] gather+reshape+sum:
    when the [N, F] result is an output (grad rows, scan ys), XLA keeps
    each per-slot gather fused into the elementwise add tree and the
    chain runs at the per-row gather rate, while the flat form
    materializes the unfused [N*K, F] gather result and pays the
    lost-fusion penalty (~2 ms at 922K banded;
    ``tools/microbench_pairlegs.py`` legs D2 vs D3: 12.14 -> 9.29
    ms/step on v5e).  Small outputs keep the flat form (see
    ``_SPLIT_MIN_ROWS``)."""
    if inc.shape[0] < _SPLIT_MIN_ROWS:
        return jnp.sum(flat_gather(table, inc), axis=1)
    g = table[inc[:, 0]]
    for k in range(1, inc.shape[1]):
        g = g + table[inc[:, k]]
    return g


def weighted_incidence_gather_sum(table, inc, w):
    """``incidence_gather_sum`` with a per-slot weight: returns
    ``sum_k w[:, k, None] * table[inc[:, k]]`` as K fused per-slot
    gathers above the same size gate (see ``_SPLIT_MIN_ROWS``)."""
    if inc.shape[0] < _SPLIT_MIN_ROWS:
        return jnp.sum(w[..., None] * flat_gather(table, inc), axis=1)
    g = w[:, 0, None] * table[inc[:, 0]]
    for k in range(1, inc.shape[1]):
        g = g + w[:, k, None] * table[inc[:, k]]
    return g


def _bwd(res, ct):
    conn, incidence, node_shape = res
    f = ct.shape[-1]
    ct_flat = ct.reshape(-1, f)
    ct_flat = jnp.concatenate(
        [ct_flat, jnp.zeros((1, f), ct_flat.dtype)], axis=0)
    grad_node = incidence_gather_sum(ct_flat, incidence)
    return grad_node, None, None


gather_with_incidence.defvjp(_fwd, _bwd)


# ------------------------------------------------------------------ banded
@jax.custom_vjp
def gather_banded(node, ba):
    """Blocked-window gather for large banded meshes.

    Both the forward gather and the reverse assembly run against
    dynamic-sliced node/cotangent windows small enough to stay below the
    TPU gather row-rate cliff (see ``mesh.banded``).  Returns
    [B*EB, 3, F] gathered rows, where B*EB >= Ne (padding slots are
    degenerate node-0 triples).
    """
    return _banded_fwd_gather(node, ba)


def _banded_fwd_gather(node, ba):
    f = node.shape[-1]
    wnode = ba.wnode

    def body(_, inp):
        rel, s = inp
        win = jax.lax.dynamic_slice(node, (s, 0), (wnode, f))
        return None, flat_gather(win, rel)         # [EB, 3, F]

    _, out = jax.lax.scan(body, None, (ba.conn_rel, ba.starts))
    return out.reshape(-1, 3, f)


def _banded_fwd(node, ba):
    return _banded_fwd_gather(node, ba), (ba, node.shape[0])


def _banded_bwd(res, ct):
    ba, n_nodes = res
    f = ct.shape[-1]
    ct_flat = ct.reshape(-1, f)                    # [B*EB*3, F]
    wct = ba.wct

    def body(_, inp):
        rel, s = inp                               # rel [NB, maxdeg]
        win = jax.lax.dynamic_slice(ct_flat, (s, 0), (wct, f))
        win = jnp.concatenate(
            [win, jnp.zeros((1, f), win.dtype)], axis=0)
        return None, incidence_gather_sum(win, rel)    # [NB, F]

    _, out = jax.lax.scan(body, None, (ba.inc_rel, ba.ct_starts))
    grad_node = out.reshape(-1, f)[:n_nodes]
    return grad_node, None


gather_banded.defvjp(_banded_fwd, _banded_bwd)
