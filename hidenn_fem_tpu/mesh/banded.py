"""Banded (blocked-window) assembly tables for large meshes.

TPU gathers have a table-row-count cliff: gathering from tables with more
than ~256K rows runs at ~190 Mrows/s vs ~475 Mrows/s below it (measured on
v5e; independent of row width and index order).  At the ~1M-element scale
the nodal table (~500K rows) and the cotangent table (~3M rows) are both
over the cliff, and the two assembly gathers dominate the energy step.

Fix: exploit mesh *bandwidth*.  After a locality-preserving node ordering
(structured meshes are already banded; ``reorder_mesh_rcm`` handles general
ones via reverse Cuthill-McKee), consecutive elements reference nodes in a
narrow window.  Partition elements into a few blocks, ``dynamic_slice`` the
node window of each block into a small (<200K-row) table, and gather with
window-relative indices — every gather runs below the cliff, and the window
slices are contiguous (bandwidth-speed).  The same construction transposed
serves the backward: node blocks gather their incident element cotangents
from windows of the flat cotangent array.

All tables are built once on the host in O(Ne).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BandedAssembly", "build_banded_assembly",
           "build_paired_assembly", "build_striped_assembly",
           "pair_connectivity", "strip_connectivity", "rcm_node_order",
           "reorder_mesh"]

# keep windows comfortably below the measured ~256K-row gather cliff
WINDOW_LIMIT = 196_608
_BLOCK_CANDIDATES = (4, 8, 16, 32, 64, 128)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandedAssembly:
    """Device tables for blocked-window assembly.

    Forward (element blocks over node windows):
      starts:   [B] int32 — node-window start row per element block.
      conn_rel: [B, EB, 3] int32 — window-relative connectivity; padding
        slots are (0,0,0) (degenerate => exactly-zero energy/cotangent).

    Backward (node blocks over cotangent windows):
      ct_starts: [Bn] int32 — cotangent-window start row per node block.
      inc_rel:   [Bn, NB, maxdeg] int32 — window-relative incidence into
        the flat [3*Ne] cotangent rows; unused slots hold the window size
        (index of a zeros row appended per window).

    Recompute backward (node blocks over *element* windows — the
    single-pass block-fused backward of ``ops/banded_energy.py``: each
    node block recomputes the cotangents of its incident element window
    in-block and consumes them immediately, so no global cotangent array
    is ever materialized):
      re_nstarts:  [Br] int32 — node-window start (for the recompute
        gather of nodal data) per node block.
      re_estarts:  [Br] int32 — element-window start per node block.
      re_conn_rel: [Br, EW, 3] int32 — element-window connectivity,
        relative to ``re_nstarts``.
      re_inc_rel:  [Br, NBr, maxdeg] int32 — flat (e_rel*3 + v) indices
        into the block's recomputed [EW*3, F] cotangents; unused slots
        hold 3*EW (a zeros row appended in-block).
      re_own_lo/re_own_hi: [Br] int32 — window-relative element ownership
        interval per node block: the owned half-open column ranges
        partition [0, Ne) across blocks, so the single-pass
        value-and-grad backward can accumulate each element's energy
        exactly once while elements on block seams (halo) are still
        recomputed for their cotangents.  None when the element windows
        don't tile [0, Ne) in order (falls back to forward-scan energy).
    """

    starts: jax.Array
    conn_rel: jax.Array
    ct_starts: jax.Array
    inc_rel: jax.Array
    re_nstarts: Optional[jax.Array] = None
    re_estarts: Optional[jax.Array] = None
    re_conn_rel: Optional[jax.Array] = None
    re_inc_rel: Optional[jax.Array] = None
    re_own_lo: Optional[jax.Array] = None
    re_own_hi: Optional[jax.Array] = None
    # static window sizes (pytree metadata, not leaves)
    wnode: int = dataclasses.field(metadata=dict(static=True), default=0)
    wct: int = dataclasses.field(metadata=dict(static=True), default=0)
    re_wnode: int = dataclasses.field(metadata=dict(static=True), default=0)
    re_ew: int = dataclasses.field(metadata=dict(static=True), default=0)
    # vertex slots per assembly "element": 3 = triangles, 4 = edge-paired
    # triangle pairs (slots (0,1,2) and (0,1,3) are the two triangles
    # sharing edge (0,1); unmatched triangles ride as degenerate pairs
    # with slot 3 repeating slot 0 — exactly-zero energy AND cotangent,
    # same eps-guarded-det argument as the (0,0,0) padding convention).
    k: int = dataclasses.field(metadata=dict(static=True), default=3)

    @property
    def n_element_blocks(self) -> int:
        return self.conn_rel.shape[0]

    @property
    def elements_per_block(self) -> int:
        return self.conn_rel.shape[1]


def build_banded_assembly(connectivity: np.ndarray, n_nodes: int,
                          incidence: np.ndarray,
                          window_limit: int = WINDOW_LIMIT,
                          block_multiple: int = 1
                          ) -> Optional[BandedAssembly]:
    """Build a BandedAssembly, or None if the mesh is not bandable.

    Returns None when no candidate block count keeps every node window
    under ``window_limit`` — callers fall back to global-gather assembly
    (consider ``rcm_node_order`` + ``structured.reorder_mesh`` first).

    ``block_multiple``: force every block count to be a multiple of this
    (the device count, for element-sharded shard_map execution where each
    device scans a contiguous slice of blocks).
    """
    conn = np.asarray(connectivity, dtype=np.int64)
    ne = conn.shape[0]
    k = conn.shape[1] if conn.ndim == 2 else 3
    if ne == 0:
        return None

    from . import native
    if native.available() and k == 3:
        t = native.banded_tables(connectivity, n_nodes,
                                 incidence, window_limit, block_multiple)
        if t is None:
            return None
        if "re_estarts" in t:
            own = _ownership_intervals(t["re_estarts"], t["re_ew"], ne)
            if own is not None:
                t["re_own_lo"], t["re_own_hi"] = own
        return BandedAssembly(
            **{k: (v if isinstance(v, int) else jnp.asarray(v))
               for k, v in t.items()})

    # ---- forward tables: element blocks -> node windows
    fwd = None
    for b in _BLOCK_CANDIDATES:
        if b % block_multiple:
            continue
        eb = -(-ne // b)
        pad = b * eb - ne
        # pad with a degenerate triple of the last element's first node:
        # zero contribution AND stays inside the last block's band (a
        # node-0 pad would widen that window to the whole mesh)
        pad_row = np.full((pad, k), conn[-1, 0], np.int64)
        conn_p = np.concatenate([conn, pad_row]) if pad else conn
        blocks = conn_p.reshape(b, eb, k)
        wmin = blocks.reshape(b, -1).min(axis=1)
        wmax = blocks.reshape(b, -1).max(axis=1)
        wsize = int((wmax - wmin + 1).max())
        if wsize <= window_limit:
            wnode = min(wsize, n_nodes)
            starts = np.minimum(wmin, n_nodes - wnode).astype(np.int32)
            conn_rel = (blocks - starts[:, None, None]).astype(np.int32)
            fwd = (starts, conn_rel, wnode)
            break
    if fwd is None:
        return None

    # ---- backward tables: node blocks -> cotangent windows
    inc = np.asarray(incidence, dtype=np.int64)      # [N, maxdeg], -1 pad
    n, maxdeg = inc.shape
    n_ct_rows = ne * k
    bwd = None
    for bn in _BLOCK_CANDIDATES:
        if bn % block_multiple:
            continue
        nb = -(-n // bn)
        pad = bn * nb - n
        inc_p = np.concatenate(
            [inc, np.full((pad, maxdeg), -1, np.int64)]) if pad else inc
        blocks = inc_p.reshape(bn, nb, maxdeg)
        valid = blocks >= 0
        # min/max over valid entries per block
        big = np.where(valid, blocks, np.int64(n_ct_rows))
        small = np.where(valid, blocks, np.int64(-1))
        wmin = big.reshape(bn, -1).min(axis=1)
        wmax = small.reshape(bn, -1).max(axis=1)
        empty = wmax < 0
        wmin = np.where(empty, 0, wmin)
        wmax = np.where(empty, 0, wmax)
        wsize = int((wmax - wmin + 1).max())
        if wsize <= window_limit:
            wct = min(wsize, n_ct_rows)
            ct_starts = np.minimum(wmin, n_ct_rows - wct).astype(np.int32)
            rel = blocks - ct_starts[:, None, None]
            rel = np.where(valid, rel, np.int64(wct)).astype(np.int32)
            bwd = (ct_starts, rel, wct)
            break
    if bwd is None:
        return None

    starts, conn_rel, wnode = fwd
    ct_starts, inc_rel, wct = bwd
    re = _build_recompute_tables(conn, inc, n_nodes, ne, window_limit,
                                 block_multiple)
    re_kwargs = {}
    if re is not None:
        nstarts, estarts, re_conn_rel, re_inc_rel, re_wnode, re_ew = re
        re_kwargs = dict(
            re_nstarts=jnp.asarray(nstarts),
            re_estarts=jnp.asarray(estarts),
            re_conn_rel=jnp.asarray(re_conn_rel),
            re_inc_rel=jnp.asarray(re_inc_rel),
            re_wnode=re_wnode,
            re_ew=re_ew,
        )
        own = _ownership_intervals(estarts, re_ew, ne)
        if own is not None:
            re_kwargs["re_own_lo"] = jnp.asarray(own[0])
            re_kwargs["re_own_hi"] = jnp.asarray(own[1])
    return BandedAssembly(
        starts=jnp.asarray(starts),
        conn_rel=jnp.asarray(conn_rel),
        ct_starts=jnp.asarray(ct_starts),
        inc_rel=jnp.asarray(inc_rel),
        wnode=wnode,
        wct=wct,
        k=k,
        **re_kwargs,
    )


def _build_recompute_tables(conn, inc, n_nodes, ne, window_limit,
                            block_multiple=1):
    """Tables for the single-pass recompute backward (see class docstring).

    Picks the smallest node-block count whose element windows keep both
    the in-block cotangent table (3*EW rows) and the recompute node
    window under ``window_limit``.  Returns None if no candidate fits —
    the energy backward falls back to the two-pass scheme.
    """
    n = inc.shape[0]
    maxdeg = inc.shape[1]
    k = conn.shape[1]
    rmin = conn.min(axis=1)
    rmax = conn.max(axis=1)
    for br in _BLOCK_CANDIDATES:
        if br % block_multiple:
            continue
        nb = -(-n // br)
        pad = br * nb - n
        inc_p = np.concatenate(
            [inc, np.full((pad, maxdeg), -1, np.int64)]) if pad else inc
        blocks = inc_p.reshape(br, nb, maxdeg)
        valid = blocks >= 0
        e_of = np.where(valid, blocks // k, np.int64(-1))
        emin = np.where(valid, e_of, np.int64(ne)).reshape(br, -1).min(1)
        emax = e_of.reshape(br, -1).max(1)
        empty = emax < 0
        emin = np.where(empty, 0, emin)
        emax = np.where(empty, 0, emax)
        ew = int((emax - emin + 1).max())
        if k * ew > window_limit:
            continue
        ew = min(ew, ne)
        estarts = np.minimum(emin, ne - ew).astype(np.int64)
        nmin = np.array([rmin[s:s + ew].min() for s in estarts])
        nmax = np.array([rmax[s:s + ew].max() for s in estarts])
        wn = int((nmax - nmin + 1).max())
        if wn > window_limit:
            continue
        wn = min(wn, n_nodes)
        nstarts = np.minimum(nmin, n_nodes - wn).astype(np.int64)
        conn_win = np.stack([conn[s:s + ew] for s in estarts])
        conn_rel = (conn_win - nstarts[:, None, None]).astype(np.int32)
        rel3 = blocks - k * estarts[:, None, None]
        rel3 = np.where(valid, rel3, np.int64(k * ew)).astype(np.int32)
        return (nstarts.astype(np.int32), estarts.astype(np.int32),
                conn_rel, rel3, wn, ew)
    return None


def _ownership_intervals(estarts, ew, ne):
    """Window-relative element ownership intervals for the recompute node
    blocks (see ``BandedAssembly`` docstring): greedy left-to-right
    assignment so the owned ranges partition [0, ne).  Returns
    (lo, hi) int32 arrays, or None when the element windows don't cover
    [0, ne) in order (then the energy value must come from the forward
    element scan, not the single-pass value-and-grad backward).
    """
    s = np.asarray(estarts, dtype=np.int64)
    lo = np.empty(s.shape[0], np.int64)
    hi = np.empty(s.shape[0], np.int64)
    cur = 0
    for i, si in enumerate(s):
        if cur < si:       # gap: elements [cur, si) not in this window
            return None
        lo[i] = cur
        cur = max(cur, min(si + ew, ne))
        hi[i] = cur
    if cur != ne:
        return None
    return ((lo - s).astype(np.int32), (hi - s).astype(np.int32))


def pair_connectivity(connectivity: np.ndarray) -> Optional[np.ndarray]:
    """Edge-pair triangles into 4-slot rows (greedy maximal matching).

    Row layout: slots (0, 1) are the shared edge, (0, 1, 2) and
    (0, 1, 3) are the two triangles.  Unmatched triangles (<1% on our
    Delaunay/structured meshes) become degenerate pairs with slot 3
    repeating slot 0 (zero second-triangle energy AND cotangent).  Rows
    are sorted by min node so the banded windows keep their locality.

    Rationale (measured, ``tools/microbench_quadpair.py``): TPU v5e
    gathers are latency-bound PER ROW, so halving the corner/cotangent/
    incidence rows is a full 2.0x on the unstructured vg chain at 65K
    elements.  Returns None when fewer than half the triangles pair
    (pairing would then mostly add filler slots).
    """
    conn = np.asarray(connectivity, dtype=np.int64)
    ne = conn.shape[0]
    if ne < 2 or conn.shape[1] != 3:
        return None
    edges = np.concatenate(
        [conn[:, [0, 1]], conn[:, [1, 2]], conn[:, [2, 0]]], axis=0)
    opp = np.concatenate([conn[:, 2], conn[:, 0], conn[:, 1]])
    tri = np.tile(np.arange(ne), 3)
    edges = np.sort(edges, axis=1)
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    es, ts, os_ = edges[order], tri[order], opp[order]
    shared = np.where((es[1:] == es[:-1]).all(axis=1))[0]
    accept, matched = _greedy_match(ts[shared], ts[shared + 1], ne)
    if 2 * int(accept.sum()) < ne // 2:
        return None
    i = shared[accept]
    paired = np.stack([es[i, 0], es[i, 1], os_[i], os_[i + 1]], axis=1)
    rest = conn[~matched]
    if rest.size:
        filler = np.concatenate([rest, rest[:, :1]], axis=1)
        paired = np.concatenate([paired, filler], axis=0)
    return paired[np.argsort(paired.min(axis=1), kind="stable")]


def _greedy_match(a_all: np.ndarray, b_all: np.ndarray, ne: int):
    """Sequential first-come greedy maximal matching over ordered
    candidate endpoint pairs: accept candidate i iff neither endpoint
    was claimed by a lower-ranked accepted candidate.

    The rank order is the QUALITY lever: edge-lexsort order pairs ~100%
    of structured and ~97% of Delaunay triangles, where a random order
    leaves ~12% unmatched (measured r5).  Two implementations of the
    identical semantics (parity-tested): the native C++ loop
    (``csrc/mesh_kernels.cpp:hdnn_greedy_match``, ~10 ms at 1.4M
    candidates) and the numpy/Python fallback below (~1-2 s at 922K).
    A vectorized conflict-resolution formulation was tried r5 and
    REMOVED: its round count is the longest rank-monotone conflict
    chain, and lexsorted candidates chain along mesh rows (~1,400
    rounds / 36 s at 922K structured — slower than the plain loop).

    Returns (accept [n_cand] bool, matched [ne] bool).
    """
    from . import native
    if native.available():
        return native.greedy_match(a_all, b_all, ne)
    n_cand = a_all.shape[0]
    accept = np.zeros(n_cand, bool)
    matched = np.zeros(ne, bool)
    for i in range(n_cand):
        a, b = a_all[i], b_all[i]
        if matched[a] or matched[b]:
            continue
        matched[a] = matched[b] = True
        accept[i] = True
    return accept, matched


def strip_connectivity(connectivity: np.ndarray):
    """Merge edge-paired triangle pairs into 6-node 4-triangle strips.

    Row layout: sliding triples — triangle ``i`` of a row is slots
    ``(i, i+1, i+2)``, i = 0..3, so the 24-row strip kernel evaluates
    four triangles from contiguous row slices of ONE 6-node gather
    (1.5 gather/cotangent rows per triangle vs 2.0 for pairs, 3.0 for
    triangles).  A pair P can extend a pair Q across a shared outer
    edge ``s`` iff they INTERLOCK: the end-opposite vertex of each lies
    on the other's internal edge (otherwise the 4-path has a fan turn
    and no sliding encoding exists).  Greedy matching over interlocking
    joins covers ~100% of pairs on structured meshes and ~97% on
    Delaunay output (measured); leftovers ride as strips whose trailing
    triangles are degenerate (repeated slots -> exactly-zero energy and
    cotangent, the established filler convention).

    Returns ``(strips [S, 6] int64, keep [S, 6] bool)`` — ``keep``
    flags slots with a live cotangent (dead trailing slots of leftover
    rows are excluded from incidence tables) — or None when the mesh
    doesn't pair.
    """
    paired = pair_connectivity(connectivity)
    if paired is None:
        return None
    real = paired[:, 3] != paired[:, 0]
    rows = paired[real]
    fillers = paired[~real]
    r = rows.shape[0]

    # candidate joins: the 4 outer edges per pair row (2 per end tri),
    # with (row, p = the internal vertex on the edge, o = end opposite)
    edges, meta = [], []
    for k in (2, 3):
        o = rows[:, k]
        for j in (0, 1):
            p = rows[:, j]
            edges.append(np.stack([np.minimum(p, o),
                                   np.maximum(p, o)], axis=1))
            meta.append(np.stack([np.arange(r), p, o], axis=1))
    e = np.concatenate(edges) if r else np.empty((0, 2), np.int64)
    m = np.concatenate(meta) if r else np.empty((0, 3), np.int64)
    nmax = int(connectivity.max()) + 1 if connectivity.size else 1
    key = e[:, 0] * nmax + e[:, 1]
    order = np.argsort(key, kind="stable")
    ks, ms = key[order], m[order]
    same = np.nonzero(ks[1:] == ks[:-1])[0]
    a_m, b_m = ms[same], ms[same + 1]
    valid = ((a_m[:, 0] != b_m[:, 0])
             & (a_m[:, 2] == b_m[:, 1]) & (b_m[:, 2] == a_m[:, 1]))
    a_m, b_m = a_m[valid], b_m[valid]
    accept, matched = _greedy_match(a_m[:, 0], b_m[:, 0], r)

    out, keep = [], []
    ja, jb = a_m[accept], b_m[accept]
    if ja.shape[0]:
        ra, pa, oa = ja[:, 0], ja[:, 1], ja[:, 2]
        rb, pb, ob = jb[:, 0], jb[:, 1], jb[:, 2]
        # v-sequence (see docstring derivation): T1 = A's non-join tri,
        # T2 = A's join tri, T3 = B's join tri, T4 = B's non-join tri
        v0 = np.where(rows[ra, 3] == oa, rows[ra, 2], rows[ra, 3])
        v2 = pa
        v1 = np.where(rows[ra, 0] == pa, rows[ra, 1], rows[ra, 0])
        v3 = oa                                   # == pb, on B.internal
        v4 = np.where(rows[rb, 0] == v3, rows[rb, 1], rows[rb, 0])
        v5 = np.where(rows[rb, 3] == ob, rows[rb, 2], rows[rb, 3])
        strips = np.stack([v0, v1, v2, v3, v4, v5], axis=1)
        out.append(strips)
        keep.append(np.ones(strips.shape, bool))
    rest = rows[~matched]
    if rest.shape[0]:
        # leftover pair (a, b | c, d): strip (c, a, b, d, b, d) — T3/T4
        # degenerate, slots 4/5 dead
        lp = np.stack([rest[:, 2], rest[:, 0], rest[:, 1], rest[:, 3],
                       rest[:, 1], rest[:, 3]], axis=1)
        out.append(lp)
        km = np.ones(lp.shape, bool)
        km[:, 4:] = False
        keep.append(km)
    if fillers.shape[0]:
        # lone triangle (a, b, c): strip (a, b, c, b, c, b) — T2..T4
        # degenerate, slots 3/4/5 dead
        ft = np.stack([fillers[:, 0], fillers[:, 1], fillers[:, 2],
                       fillers[:, 1], fillers[:, 2], fillers[:, 1]],
                      axis=1)
        out.append(ft)
        km = np.ones(ft.shape, bool)
        km[:, 3:] = False
        keep.append(km)
    if not out:
        return None
    strips = np.concatenate(out)
    keep = np.concatenate(keep)
    perm = np.argsort(strips.min(axis=1), kind="stable")
    return strips[perm], keep[perm]


def build_striped_assembly(connectivity: np.ndarray, n_nodes: int,
                           window_limit: int = WINDOW_LIMIT,
                           block_multiple: int = 1
                           ) -> Optional[BandedAssembly]:
    """Strip-merged BandedAssembly (``k=6``), or None when the mesh
    doesn't strip / band.  Same table semantics as the paired tables;
    the 24-row kernel in ``ops/banded_energy.py`` dispatches on row
    count."""
    sk = strip_connectivity(connectivity)
    if sk is None:
        return None
    strips, keep = sk
    inc = _incidence_k(strips, n_nodes, keep=keep)
    return build_banded_assembly(strips, n_nodes, inc,
                                 window_limit=window_limit,
                                 block_multiple=block_multiple)


def _incidence_k(conn: np.ndarray, n_nodes: int,
                 skip_filler: bool = True,
                 keep: Optional[np.ndarray] = None) -> np.ndarray:
    """[N, maxdeg] incidence into the flat [Nq*k] cotangent rows, -1
    padded (the builder's convention).  Filler slots (slot 3 == slot 0,
    see ``pair_connectivity``) are excluded: their cotangent is exactly
    zero, so skipping them only removes wasted gather rows."""
    nq, k = conn.shape
    nodes = conn.reshape(-1)
    rows = np.arange(nodes.size, dtype=np.int64)
    if keep is not None:                   # explicit dead-slot mask
        keep = np.asarray(keep, bool).reshape(-1)
    else:
        keep = np.ones(nodes.size, bool)
        if skip_filler and k == 4:
            keep[3::4] = conn[:, 3] != conn[:, 0]
    nodes, rows = nodes[keep], rows[keep]
    counts = np.bincount(nodes, minlength=n_nodes)
    maxdeg = max(int(counts.max()), 1)
    starts = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    order = np.argsort(nodes, kind="stable")
    fn, rr = nodes[order], rows[order]
    rank = np.arange(fn.size) - starts[fn]
    inc = np.full((n_nodes, maxdeg), -1, np.int64)
    inc[fn, rank] = rr
    return inc


def build_paired_assembly(connectivity: np.ndarray, n_nodes: int,
                          window_limit: int = WINDOW_LIMIT,
                          block_multiple: int = 1
                          ) -> Optional[BandedAssembly]:
    """Quad-paired BandedAssembly (``k=4``), or None when the mesh
    doesn't pair / band.  Same table semantics as the triangle tables;
    ``ops/banded_energy.py`` dispatches the two-triangle kernels on
    ``k``."""
    paired = pair_connectivity(connectivity)
    if paired is None:
        return None
    inc = _incidence_k(paired, n_nodes)
    return build_banded_assembly(paired, n_nodes, inc,
                                 window_limit=window_limit,
                                 block_multiple=block_multiple)


def reorder_mesh(mesh, build_banded="auto"):
    """Bandwidth-reducing reorder of a TriMesh: RCM node permutation,
    connectivity renumbering, elements sorted by smallest node — then all
    derived assembly tables rebuilt.  Use on unstructured (e.g. gmsh)
    meshes before large solves; structured meshes are already banded.

    Note: node/element order changes; parameter pytrees built against the
    old ordering do not transfer.
    """
    from .types import TriMesh

    conn = np.asarray(mesh.connectivity)
    n = mesh.n_nodes
    perm = rcm_node_order(conn, n)                 # new_pos -> old_index
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    new_conn = inv[conn]
    order = np.argsort(new_conn.min(axis=1), kind="stable")
    new_conn = new_conn[order]

    def _p(x):
        return np.asarray(x)[perm]

    ne = np.asarray(mesh.neumann_edges)
    return TriMesh.from_arrays(
        coords=_p(mesh.coords),
        connectivity=new_conn,
        geom_boundary_mask=_p(mesh.geom_boundary_mask),
        dirichlet_mask=_p(mesh.dirichlet_mask),
        neumann_mask=_p(mesh.neumann_mask),
        neumann_edges=inv[ne] if ne.size else ne,
        build_banded=build_banded,
    )


def rcm_node_order(connectivity: np.ndarray, n_nodes: int) -> np.ndarray:
    """Reverse-Cuthill-McKee node permutation (bandwidth reduction) for
    general unstructured meshes; apply before building banded tables.

    Returns ``perm`` with new_index = perm_inv[old_index]; see
    ``structured.reorder_mesh``.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    conn = np.asarray(connectivity, dtype=np.int64)
    rows = np.concatenate([conn[:, 0], conn[:, 1], conn[:, 2]])
    cols = np.concatenate([conn[:, 1], conn[:, 2], conn[:, 0]])
    data = np.ones(rows.size, dtype=np.int8)
    adj = sp.coo_matrix((data, (rows, cols)), shape=(n_nodes, n_nodes))
    adj = (adj + adj.T).tocsr()
    return np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))
