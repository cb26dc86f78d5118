"""Lattice detection: route lattice-topology TriMeshes through the
gather-free structured energy.

The TPU facts (CLAUDE.md): assembly gathers run at ~0.5-1 row/cycle and
bound the unstructured energy step (the round-2 A/B showed the 6.4K
step sits at the architectural two-gather floor).  But the meshes the
reference's own generator produces (``/root/reference/src/mesh.py:
155-276`` and our ``mesh/structured.py``) are *lattice triangulations*:
node (i, j) of an nx-by-ny grid, one diagonal per quad, holes punched
by node deletion.  For those, per-element nodal data are array SLICES
of the [nx, ny] node lattice — no gathers at all (the
``models/structured_grid.py`` insight) — or, with deleted nodes, one
N-row permutation gather instead of the 3·Ne-row connectivity gather
plus its incidence backward.

``detect_lattice`` recovers the lattice from a generic
(coords, connectivity, neumann_edges) triple — O(Ne log Ne) host-side
numpy, run once at mesh build — and returns ``None`` for genuinely
unstructured (e.g. gmsh OCC) meshes, which keep the banded/Pallas
path.  Correctness does not depend on the detection heuristics: a
detected route is validated structurally (every triangle must map to
exactly one lattice quad diagonal, every Neumann edge to a face
segment), and the routed energy is equality-tested against the
unstructured assembly in ``tests/test_lattice_route.py``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LatticeRoute", "detect_lattice"]

# The chunked fill (aligned 2k-node window pairs + offset select) was
# hypothesized to beat the flat permutation gather at scale; measured
# on v5e at 922K/3 holes it is SLOWER at every k (step 9.9/5.9/6.2 ms
# at k=8/16/32 vs 5.0 flat — tools/microbench_rowpack.py: the gather
# win is real, ~0.14 ms, but the pad/concat/select passes on
# minor-dim-32/64 intermediates pay Mosaic lane relayouts that dwarf
# it).  A static-quartile windowed variant measured 1.98 vs 2.41
# ms/direction (1.2x) — not worth the table machinery either.  The
# fill is latency-bound; the production answer for hole meshes is
# representation steering: generate_mesh(..., keep_dead_nodes=True)
# (identity route, zero gathers, ~16x) or the hybrid generator.
# Chunked stays as an equality-tested opt-in (HDNN_LATTICE_CHUNK=1).


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LatticeRoute:
    """Recovered lattice structure of a TriMesh (see module docstring).

    Attributes:
      sel: [nx-1, ny-1] f32 — 1 where the quad splits along the n00-n11
        ("up") diagonal, 0 for n10-n01 ("down").
      t1/t2: [nx-1, ny-1] f32 — presence masks for the first/second
        triangle of each quad's split (holes drop triangles).
      inv_map: [nx*ny] int32 — lattice position -> mesh node id, with
        n_nodes as the sentinel for deleted (hole) positions.
      fwd_map: [N] int32 — mesh node id -> lattice position (total: every
        surviving node occupies exactly one position, which is what
        makes the backward of the fill a gather, not a scatter).
      edge_masks: face -> f32 segment mask ('left'/'right': [ny-1],
        'up'/'down': [nx-1]) carrying the Neumann edges.
      nx/ny: lattice shape (static).
      identity: True when the node numbering IS the lattice numbering
        (no deleted nodes, lexicographic order) — the fill collapses to
        a reshape and the route does ZERO gathers (static).
      prefix_identity: True when the FIRST nx*ny nodes are the lattice
        in lexicographic order and further (non-lattice) nodes follow —
        hybrid meshes (``mesh/hybrid.py``) append hole-rim/collar nodes
        after the lattice block.  The fill is then a slice (backward: a
        zero-pad), still zero gathers (static).
      uniform_sel: "up"/"down" when EVERY quad splits along the same
        diagonal (static), else "".  Lets the energy pick the triangle
        family at trace time instead of computing both and selecting —
        halves the element FLOPs (forward AND backward) for the
        generator's "up"/"down" variants; "zigzag" keeps the where.
      all_present: True when t1 == t2 == 1 everywhere (no hole-dropped
        triangles) — the presence-mask multiplies drop out (static).
    """

    sel: jax.Array
    t1: jax.Array
    t2: jax.Array
    inv_map: jax.Array
    fwd_map: jax.Array
    edge_masks: dict
    # blocked-window form of the permutation maps, built for large
    # renumbered meshes: both fill directions are monotonic (node
    # deletion preserves lattice order), so every block of lattice rows
    # reads a CONTIGUOUS node window (and vice versa) — dynamic-slice a
    # window, gather window-relative — which keeps each gather below
    # the TPU's ~256K-row table-rate cliff (~2.5x row rate; same trick
    # as mesh/banded.py and the auxspace P^T).
    fw_rel: Optional[jax.Array] = None      # [NB, R] lattice<-node rel
    fw_starts: Optional[jax.Array] = None   # [NB] node-window starts
    bw_rel: Optional[jax.Array] = None      # [MB, S] node<-lattice rel
    bw_starts: Optional[jax.Array] = None   # [MB] position-window starts
    # chunked-monotone fill tables (see _chunk_dir / ops/lattice_energy
    # ._perm_fill_chunk): node deletion preserves lattice order, so the
    # fill map is monotone-with-runs — k consecutive lattice positions
    # almost always read k consecutive node rows.  Gathering k-node
    # ALIGNED window pairs from a [~N/k, 2k·C] packed table cuts gather
    # rows k/2x AND drops the table below the ~256K-row rate cliff; a
    # per-chunk offset select realigns in-register, and the ~#runs
    # run-boundary chunks get exact values from a tiny flat gather.
    ck_fwd_rowA: Optional[jax.Array] = None   # [Mc] aligned window row
    ck_fwd_off: Optional[jax.Array] = None    # [Mc] in-window offset
    ck_fwd_live: Optional[jax.Array] = None   # [Mc*k] bool live mask
    ck_fwd_fix_rows: Optional[jax.Array] = None  # [Ff] non-simple chunks
    ck_fwd_fix_idx: Optional[jax.Array] = None   # [Ff*k] exact node ids
    ck_bwd_rowA: Optional[jax.Array] = None   # [Nc] (compaction dir)
    ck_bwd_off: Optional[jax.Array] = None    # [Nc]
    ck_bwd_fix_rows: Optional[jax.Array] = None  # [Fb]
    ck_bwd_fix_idx: Optional[jax.Array] = None   # [Fb*k] lattice pos ids
    ck_k: int = dataclasses.field(metadata=dict(static=True), default=0)
    nx: int = dataclasses.field(metadata=dict(static=True), default=0)
    ny: int = dataclasses.field(metadata=dict(static=True), default=0)
    identity: bool = dataclasses.field(metadata=dict(static=True),
                                       default=False)
    prefix_identity: bool = dataclasses.field(metadata=dict(static=True),
                                              default=False)
    fw_width: int = dataclasses.field(metadata=dict(static=True),
                                      default=0)
    bw_width: int = dataclasses.field(metadata=dict(static=True),
                                      default=0)
    uniform_sel: str = dataclasses.field(metadata=dict(static=True),
                                         default="")
    all_present: bool = dataclasses.field(metadata=dict(static=True),
                                          default=False)


def _window_maps(inv_map: np.ndarray, pos: np.ndarray, n: int,
                 nx: int, ny: int, target: int = 65536):
    """Blocked-window tables for both fill directions (see the
    LatticeRoute field comment).  Sentinel entries index the zeros row
    appended at ``width`` inside each window."""
    npos = nx * ny
    # forward: lattice-position blocks read node windows
    gb = max(1, target // ny)                 # lattice rows per block
    nb = -(-nx // gb)
    r = gb * ny
    fw_rel = None
    fw_width = 0
    lo = np.zeros(nb, np.int64)
    hi = np.zeros(nb, np.int64)
    for b in range(nb):
        sl = inv_map[b * r:(b + 1) * r]
        valid = sl[sl < n]
        lo[b], hi[b] = ((int(valid.min()), int(valid.max()))
                        if valid.size else (0, 0))
    fw_width = min(int((hi - lo + 1).max()), n)
    fw_starts = np.minimum(lo, n - fw_width).astype(np.int32)
    fw_rel = np.full((nb, r), fw_width, np.int64)
    for b in range(nb):
        sl = inv_map[b * r:(b + 1) * r]
        row = np.where(sl < n, sl - fw_starts[b], fw_width)
        fw_rel[b, :sl.size] = row

    # backward: node blocks read lattice-position (cotangent) windows
    sb = target
    mb = -(-n // sb)
    blo = np.zeros(mb, np.int64)
    bhi = np.zeros(mb, np.int64)
    for b in range(mb):
        pp = pos[b * sb:(b + 1) * sb]
        blo[b], bhi[b] = int(pp.min()), int(pp.max())
    bw_width = min(int((bhi - blo + 1).max()), npos)
    bw_starts = np.minimum(blo, npos - bw_width).astype(np.int32)
    bw_rel = np.full((mb, sb), bw_width, np.int64)
    for b in range(mb):
        pp = pos[b * sb:(b + 1) * sb]
        bw_rel[b, :pp.size] = pp - bw_starts[b]

    return (jnp.asarray(fw_rel), jnp.asarray(fw_starts),
            jnp.asarray(bw_rel), jnp.asarray(bw_starts),
            int(fw_width), int(bw_width))


def _chunk_dir(m: np.ndarray, s: int, k: int):
    """Chunk tables for one direction of the monotone fill.

    ``m`` maps output position -> source row (monotone strictly
    increasing over live entries; entries >= ``s`` are dead).  Returns
    (rowA [Tc], off [Tc], live [Tc*k] bool or None, fix_rows [F],
    fix_idx [F*k]) where output chunk ``c`` equals source rows
    ``[k*rowA[c] + off[c], ... + k)`` for "simple" chunks (all live
    entries share one shift) and ``fix_idx`` carries the exact source
    ids for the rest.  Source table padding contract (runtime side):
    the source is zero-padded to ``(ceil(s/k) + 1) * k`` rows, so
    ``rowA + 1`` is always a valid k-row window and the sentinel ``s``
    reads zeros."""
    t = m.size
    tc = -(-t // k)
    mp = np.full(tc * k, s, np.int64)
    mp[:t] = m
    ch = mp.reshape(tc, k)
    live = ch < s
    base = np.arange(tc * k, dtype=np.int64).reshape(tc, k)
    shift = base - ch
    any_live = live.any(axis=1)
    first_slot = np.argmax(live, axis=1)
    s_c = np.where(any_live, shift[np.arange(tc), first_slot], base[:, 0])
    eq = np.where(live, shift, s_c[:, None])
    simple = (eq == s_c[:, None]).all(axis=1)
    start = np.where(any_live, base[:, 0] - s_c, 0)
    # a chunk led by dead slots can have start < 0 (its first live
    # entry maps near the source head): exact-fixup those
    simple &= start >= 0
    start = np.maximum(start, 0)
    # live starts satisfy start <= m[first live] <= s-1, so
    # rowA <= (s-1)//k <= ceil(s/k) - 1 = (padded rows) - 2: in range.
    rowa = (start // k).astype(np.int32)
    off = (start - rowa.astype(np.int64) * k).astype(np.int32)
    fix_rows = np.flatnonzero(~simple).astype(np.int32)
    fix_idx = np.where(live[~simple], ch[~simple], s).astype(np.int32)
    # pad entries (>= t) are sliced off at runtime: only REAL dead
    # entries force a mask (the backward/compaction direction is total)
    live_out = None if live.reshape(-1)[:t].all() else live.reshape(-1)
    return rowa, off, live_out, fix_rows, fix_idx.reshape(-1)


def _chunk_maps(inv_map: np.ndarray, pos: np.ndarray, n: int,
                nx: int, ny: int, k: int = 8) -> Optional[dict]:
    """Both directions of the chunked fill (see the LatticeRoute field
    comment); None when too many chunks straddle run boundaries for
    the chunking to pay (degenerate hole layouts)."""
    f_rowa, f_off, f_live, f_fr, f_fi = _chunk_dir(
        np.asarray(inv_map, np.int64), n, k)
    b_rowa, b_off, b_live, b_fr, b_fi = _chunk_dir(
        np.asarray(pos, np.int64), nx * ny, k)
    assert b_live is None          # pos is total: every node has a slot
    if (f_fr.size > f_rowa.size // 4) or (b_fr.size > b_rowa.size // 4):
        return None
    ja = jnp.asarray
    return dict(
        ck_fwd_rowA=ja(f_rowa), ck_fwd_off=ja(f_off),
        ck_fwd_live=None if f_live is None else ja(f_live),
        ck_fwd_fix_rows=ja(f_fr), ck_fwd_fix_idx=ja(f_fi),
        ck_bwd_rowA=ja(b_rowa), ck_bwd_off=ja(b_off),
        ck_bwd_fix_rows=ja(b_fr), ck_bwd_fix_idx=ja(b_fi),
        ck_k=int(k))


def detect_lattice(coords: np.ndarray, connectivity: np.ndarray,
                   neumann_edges: np.ndarray
                   ) -> Optional[LatticeRoute]:
    """Recover the lattice structure, or None if the mesh isn't one."""
    coords = np.asarray(coords)
    conn = np.asarray(connectivity, dtype=np.int64)
    edges = np.asarray(neumann_edges, dtype=np.int64)
    n = coords.shape[0]
    if n < 4 or conn.shape[0] < 2:
        return None

    # ---- node -> (i, j): exact-match against the unique coordinate
    # levels.  A true lattice has nx*ny ~ N levels-product; irregular
    # meshes explode it, which is the cheap rejection.
    xs = np.unique(coords[:, 0])
    ys = np.unique(coords[:, 1])
    nx, ny = xs.size, ys.size
    if nx < 2 or ny < 2 or nx * ny > 4 * n or nx * ny < n:
        return None
    i = np.searchsorted(xs, coords[:, 0])
    j = np.searchsorted(ys, coords[:, 1])
    # searchsorted hits exact values by construction of unique()
    pos = i * ny + j
    if np.unique(pos).size != n:     # two nodes on one lattice site
        return None

    # ---- classify every triangle into (quad, diagonal, slot)
    pi = pos[conn] // ny             # [Ne, 3] lattice i per vertex
    pj = pos[conn] % ny
    qi = pi.min(axis=1)
    qj = pj.min(axis=1)
    di = pi - qi[:, None]
    dj = pj - qj[:, None]
    if (di > 1).any() or (dj > 1).any() or (qi >= nx - 1).any() \
            or (qj >= ny - 1).any():
        return None
    # corner codes 0:n00 1:n01 2:n10 3:n11; the four 3-subsets of the
    # quad's corners are exactly the four possible triangles, keyed by
    # their code sum: 5 = up-T1 (n00,n10,n11), 4 = up-T2 (n00,n11,n01),
    # 3 = down-T1 (n00,n10,n01), 6 = down-T2 (n10,n11,n01).
    code = di * 2 + dj
    if (np.sort(code, axis=1)[:, :-1] == np.sort(code, axis=1)[:, 1:]
            ).any():                 # repeated vertex
        return None
    s = code.sum(axis=1)
    quad = qi * (ny - 1) + qj
    is_up = (s == 5) | (s == 4)
    slot1 = (s == 5) | (s == 3)

    nq = (nx - 1) * (ny - 1)
    up_cnt = np.zeros(nq, np.int64)
    dn_cnt = np.zeros(nq, np.int64)
    np.add.at(up_cnt, quad[is_up], 1)
    np.add.at(dn_cnt, quad[~is_up], 1)
    if ((up_cnt > 0) & (dn_cnt > 0)).any():   # mixed diagonals in a quad
        return None
    t1 = np.zeros(nq, np.float32)
    t2 = np.zeros(nq, np.float32)
    # duplicate triangles (same quad, same slot) are not a lattice
    slot = (~slot1).astype(np.int64)
    if np.unique(quad * 2 + slot).size != conn.shape[0]:
        return None
    t1[quad[slot1]] = 1.0
    t2[quad[~slot1]] = 1.0
    sel = (up_cnt > 0).astype(np.float32)
    sel[(up_cnt == 0) & (dn_cnt == 0)] = 1.0   # empty quads: any

    # ---- Neumann edges must be face segments
    edge_masks = {}
    if edges.size:
        ea, eb = pos[edges[:, 0]], pos[edges[:, 1]]
        ia, ja = ea // ny, ea % ny
        ib, jb = eb // ny, eb % ny
        vert = (ia == ib) & (np.abs(ja - jb) == 1)
        horz = (ja == jb) & (np.abs(ia - ib) == 1)
        left = vert & (ia == 0)
        right = vert & (ia == nx - 1)
        down = horz & (ja == 0)
        up = horz & (ja == ny - 1)
        if not (left | right | down | up).all():
            return None
        for name, m, seg, size in (
                ("left", left, np.minimum(ja, jb), ny - 1),
                ("right", right, np.minimum(ja, jb), ny - 1),
                ("down", down, np.minimum(ia, ib), nx - 1),
                ("up", up, np.minimum(ia, ib), nx - 1)):
            if m.any():
                mask = np.zeros(size, np.float32)
                mask[seg[m]] = 1.0
                edge_masks[name] = jnp.asarray(mask)

    identity = bool(n == nx * ny and (pos == np.arange(n)).all())
    inv_map = np.full(nx * ny, n, np.int32)
    inv_map[pos] = np.arange(n, dtype=np.int32)

    # NOTE: a blocked-window form of the fill exists (_window_maps +
    # ops/lattice_energy._perm_fill_win, equality-tested) but measured
    # SLOWER than the flat gather at 922K/3-hole on v5e (fwd 3.35 vs
    # 2.45 ms; fwd+bwd 5.36 vs 4.68): the ~190 Mrows/s gather rate holds
    # regardless of windowing for this near-sequential permutation, so
    # windows only add slice/concat overhead.  Flat stays the default;
    # for the full structured speed on hole meshes use
    # ``generate_mesh(..., keep_dead_nodes=True)`` (identity numbering,
    # zero gathers).
    fw_rel, fw_starts, bw_rel, bw_starts, fw_width, bw_width = \
        (None,) * 4 + (0, 0)
    chunk_extras = {}
    if not identity:
        if os.environ.get("HDNN_LATTICE_CHUNK", "") == "1":
            k = int(os.environ.get("HDNN_LATTICE_CHUNK_K", "8"))
            cm = _chunk_maps(inv_map, pos, n, nx, ny, k=k)
            if cm is not None:
                chunk_extras = cm
    return LatticeRoute(
        **chunk_extras,
        fw_rel=fw_rel, fw_starts=fw_starts,
        bw_rel=bw_rel, bw_starts=bw_starts,
        fw_width=fw_width, bw_width=bw_width,
        sel=jnp.asarray(sel.reshape(nx - 1, ny - 1)),
        t1=jnp.asarray(t1.reshape(nx - 1, ny - 1)),
        t2=jnp.asarray(t2.reshape(nx - 1, ny - 1)),
        inv_map=jnp.asarray(inv_map),
        fwd_map=jnp.asarray(pos.astype(np.int32)),
        edge_masks=edge_masks,
        nx=int(nx), ny=int(ny), identity=identity,
        uniform_sel=("up" if (sel == 1.0).all()
                     else "down" if (sel == 0.0).all() else ""),
        all_present=bool((t1 == 1.0).all() and (t2 == 1.0).all()))
