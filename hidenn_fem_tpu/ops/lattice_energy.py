"""Gather-free energy evaluation for lattice-detected TriMeshes.

The unstructured plane-stress step is bound by its two assembly gathers
(~0.5-1 row/cycle on v5e; the round-2 A/B put the 6.4K step at that
architectural floor).  When ``mesh.lattice`` is present
(``mesh/lattice.py``), the same energy is computed from SLICES of the
[nx, ny, 4] node lattice instead — the ``models/structured_grid.py``
design applied to the unstructured API:

* identity numbering (hole-free generator meshes): a reshape, zero
  gathers anywhere in forward or backward;
* renumbered meshes (holes punch nodes out): ONE N-row permutation
  gather to fill the lattice, whose backward is ALSO a gather (the map
  is injective), vs the 3*Ne-row connectivity gather + incidence
  backward of the general path.

Numerics are the exact P1 constant-strain element energy — the same
arithmetic as ``ops/losses.py``'s fused path up to reassociation —
equality-tested (value + both gradient groups) in
``tests/test_lattice_route.py``.  Matches the reference hot path
``/root/reference/src/loss.py:55-116``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import assembly

__all__ = ["lattice_total", "lattice_domain_energy",
           "extra_elements_energy"]


@jax.custom_vjp
def _perm_fill(node: jax.Array, inv_map: jax.Array, fwd_map: jax.Array
               ) -> jax.Array:
    """[N, 4] node table -> [nx*ny, 4] lattice fill via the injective
    position maps; deleted positions read an appended zeros row."""
    pad = jnp.concatenate([node, jnp.zeros((1, node.shape[1]),
                                           node.dtype)], axis=0)
    return pad[inv_map]


def _perm_fill_fwd(node, inv_map, fwd_map):
    return _perm_fill(node, inv_map, fwd_map), fwd_map


def _perm_fill_bwd(fwd_map, ct):
    # every node occupies exactly one lattice position, so the fill's
    # transpose is itself a gather (a scatter would be ~7x slower/row)
    return ct[fwd_map], None, None


_perm_fill.defvjp(_perm_fill_fwd, _perm_fill_bwd)


def _win_gather(src: jax.Array, rel: jax.Array, starts: jax.Array,
                width: int) -> jax.Array:
    """Blocked-window gather: per block, dynamic-slice a [width, C]
    window of ``src`` and gather window-relative rows (sentinel
    ``width`` hits an appended zeros row).  Keeps every gather table
    below the TPU's ~256K-row rate cliff."""
    c = src.shape[1]

    def body(_, inp):
        rel_b, s = inp
        win = jax.lax.dynamic_slice(src, (s, 0), (width, c))
        win = jnp.concatenate([win, jnp.zeros((1, c), src.dtype)])
        return None, win[rel_b]

    _, out = jax.lax.scan(body, None, (rel, starts))
    return out.reshape(-1, c)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _perm_fill_win(fw_width, bw_width, node, fw_rel, fw_starts,
                   bw_rel, bw_starts):
    """Windowed permutation fill: [N, C] node table -> [NB*R >= nx*ny, C]
    lattice rows (blocked both directions; see mesh/lattice.py)."""
    return _win_gather(node, fw_rel, fw_starts, fw_width)


def _perm_fill_win_fwd(fw_width, bw_width, node, fw_rel, fw_starts,
                       bw_rel, bw_starts):
    out = _win_gather(node, fw_rel, fw_starts, fw_width)
    return out, (bw_rel, bw_starts, node.shape[0])


def _perm_fill_win_bwd(fw_width, bw_width, res, ct):
    bw_rel, bw_starts, n = res
    node_ct = _win_gather(ct, bw_rel, bw_starts, bw_width)[:n]
    return node_ct, None, None, None, None


_perm_fill_win.defvjp(_perm_fill_win_fwd, _perm_fill_win_bwd)


def _chunked_gather(src, rowa, off, live, fix_rows, fix_idx, k, t):
    """Monotone chunked gather: out[p] = src[m[p]] for a monotone-with-
    runs map m, from the precomputed chunk tables (mesh/lattice.py:
    _chunk_dir).  One gather of [Tc] rows from a 2k-node overlapping-
    window table (k/2x fewer rows than flat AND below the ~256K-row
    table-rate cliff), a k-way offset select that XLA fuses, and an
    exact tiny gather + sorted-unique scatter for the ~#runs chunks
    straddling run boundaries."""
    s, c = src.shape
    r = -(-s // k) + 1
    flat = jnp.pad(src, ((0, r * k - s), (0, 0)))         # [r*k, c]
    tab = flat.reshape(r, k * c)
    tab2 = jnp.concatenate([tab[:-1], tab[1:]], axis=1)   # [r-1, 2kc]
    w = tab2[rowa]                                        # [Tc, 2kc]
    out = jnp.zeros((rowa.shape[0], k * c), src.dtype)
    for o in range(k):
        sl = jax.lax.slice_in_dim(w, o * c, (o + k) * c, axis=1)
        out = out + jnp.where((off == o)[:, None], sl, 0)
    if fix_rows.shape[0]:
        fv = flat[fix_idx].reshape(-1, k * c)             # exact values
        out = out.at[fix_rows].set(fv, indices_are_sorted=True,
                                   unique_indices=True)
    out = out.reshape(-1, c)
    if live is not None:
        out = jnp.where(live[:, None], out, 0)
    return out[:t]


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _perm_fill_chunk(spec, node, f_rowa, f_off, f_live, f_fr, f_fi,
                     b_rowa, b_off, b_fr, b_fi):
    """Chunked permutation fill: [N, C] node table -> [nx*ny, C]
    lattice rows; backward is the chunked compaction (the fill map is
    injective, so its transpose is the gather through ``pos``).
    ``spec = (k, n_positions, n_nodes)`` (static)."""
    k, m, n = spec
    return _chunked_gather(node, f_rowa, f_off, f_live, f_fr, f_fi,
                           k, m)


def _perm_fill_chunk_fwd(spec, node, f_rowa, f_off, f_live, f_fr, f_fi,
                         b_rowa, b_off, b_fr, b_fi):
    out = _perm_fill_chunk(spec, node, f_rowa, f_off, f_live, f_fr,
                           f_fi, b_rowa, b_off, b_fr, b_fi)
    return out, (b_rowa, b_off, b_fr, b_fi)


def _perm_fill_chunk_bwd(spec, res, ct):
    k, m, n = spec
    b_rowa, b_off, b_fr, b_fi = res
    node_ct = _chunked_gather(ct, b_rowa, b_off, None, b_fr, b_fi, k, n)
    return (node_ct,) + (None,) * 9


_perm_fill_chunk.defvjp(_perm_fill_chunk_fwd, _perm_fill_chunk_bwd)


def _tri_energy(v0, v1, v2, f, nu):
    """P1 plane-stress element energy density x |detJ| for one triangle
    family of corner slices [..., 4] = (cx, cy, ux, uy) — the identical
    scalar-wise algebra as the fused unstructured path
    (``ops/losses.py``) and ``StructuredGridP1._tri_energy``."""
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
    return jnp.abs(det) * dens


def _lat(node: jax.Array, route) -> jax.Array:
    """Node table [N, 4] -> [nx, ny, 4] lattice.

    Layout note (tested negative): splitting into four [nx, ny]
    component slabs before the stencil — hypothesized to beat the
    minor-dim-4 array on lane utilization — measured SLOWER on v5e at
    every scale once the statically-uniform diagonal pick landed
    (922K identity fwd+bwd 209 vs 173 us; 6.4K 7.0 vs 3.7 us): XLA
    fuses the [..., k] component slices into the element algebra, so
    the slab split only added materialized transposes."""
    if route.identity:
        full = node
    elif route.prefix_identity:
        # hybrid meshes: the lattice block is the node-table prefix —
        # the fill is a slice, its backward a zero-pad (both ~free)
        full = node[:route.nx * route.ny]
    elif route.ck_k:
        full = _perm_fill_chunk(
            (route.ck_k, route.nx * route.ny, node.shape[0]), node,
            route.ck_fwd_rowA, route.ck_fwd_off, route.ck_fwd_live,
            route.ck_fwd_fix_rows, route.ck_fwd_fix_idx,
            route.ck_bwd_rowA, route.ck_bwd_off,
            route.ck_bwd_fix_rows, route.ck_bwd_fix_idx)
    elif route.fw_rel is not None:
        full = _perm_fill_win(route.fw_width, route.bw_width, node,
                              route.fw_rel, route.fw_starts,
                              route.bw_rel,
                              route.bw_starts)[:route.nx * route.ny]
    else:
        full = _perm_fill(node, route.inv_map, route.fwd_map)
    return full.reshape(route.nx, route.ny, 4)


def lattice_domain_energy(node: jax.Array, route, E: float, nu: float,
                          w_sum: float) -> jax.Array:
    """Elastic strain energy from the lattice route (see module doc)."""
    return _domain_from_lat(_lat(node, route), route, E, nu, w_sum)


def _domain_from_lat(lat, route, E: float, nu: float,
                     w_sum: float) -> jax.Array:
    f = E / (1.0 - nu ** 2)
    n00 = lat[:-1, :-1]
    n10 = lat[1:, :-1]
    n11 = lat[1:, 1:]
    n01 = lat[:-1, 1:]
    # slot-1 triangle: up = (n00, n10, n11), down = (n00, n10, n01);
    # slot-2: up = (n00, n11, n01), down = (n10, n11, n01).  With a
    # statically-uniform diagonal (the generator's "up"/"down"
    # variants) the family is picked at TRACE time — half the element
    # FLOPs, forward and backward — else a where selects per quad.
    if route.uniform_sel == "up":
        e1 = _tri_energy(n00, n10, n11, f, nu)
        e2 = _tri_energy(n00, n11, n01, f, nu)
    elif route.uniform_sel == "down":
        e1 = _tri_energy(n00, n10, n01, f, nu)
        e2 = _tri_energy(n10, n11, n01, f, nu)
    else:
        sel = route.sel
        e1 = jnp.where(sel > 0,
                       _tri_energy(n00, n10, n11, f, nu),
                       _tri_energy(n00, n10, n01, f, nu))
        e2 = jnp.where(sel > 0,
                       _tri_energy(n00, n11, n01, f, nu),
                       _tri_energy(n10, n11, n01, f, nu))
    if route.all_present:       # no hole-dropped triangles: masks drop
        return w_sum * (jnp.sum(e1) + jnp.sum(e2))
    return w_sum * jnp.sum(route.t1 * e1 + route.t2 * e2)


def _tri_body_work(a, b, c, pts, w, body_force):
    """|detJ| * sum_q w_q b(x_q).u(x_q) per triangle from corner stacks
    [..., 4] (cx, cy, ux, uy) — the lattice-slice analog of
    ``losses._body_work_gathered`` (same slot order: lam = 1-xi-eta
    weights the THIRD corner; same physical-point evaluation)."""
    det = ((a[..., 0] - c[..., 0]) * (b[..., 1] - c[..., 1])
           - (b[..., 0] - c[..., 0]) * (a[..., 1] - c[..., 1]))
    xi = pts[:, 0]
    eta = pts[:, 1]
    lam = 1.0 - xi - eta
    sh = (1,) * (a.ndim - 1)
    xi = xi.reshape(sh + (-1, 1))
    eta = eta.reshape(sh + (-1, 1))
    lam = lam.reshape(sh + (-1, 1))
    xq = (xi * a[..., None, 0:2] + eta * b[..., None, 0:2]
          + lam * c[..., None, 0:2])               # [..., ng, 2]
    uq = (xi * a[..., None, 2:4] + eta * b[..., None, 2:4]
          + lam * c[..., None, 2:4])
    bf = body_force(xq.reshape(-1, 2)).reshape(uq.shape)
    return jnp.abs(det) * jnp.sum(w.reshape(sh + (-1,))
                                  * jnp.sum(bf * uq, axis=-1), axis=-1)


def lattice_body_work(node: jax.Array, route, body_force, pts, w
                      ) -> jax.Array:
    """Body-force work over the lattice route, all from node-lattice
    slices — keeps ``body_force != None`` on the fast path instead of
    silently falling back to the gather assembly (the same cliff
    VERDICT r2 flagged for the banded path)."""
    return body_work_from_lat(_lat(node, route), route, body_force,
                              pts, w)


def body_work_from_lat(lat: jax.Array, route, body_force, pts, w
                       ) -> jax.Array:
    """Body-force work from an already-built [nx, ny, 4] lattice (the
    sharded path builds/pads its own).  Hole-dropped triangles are
    masked by t1/t2 (their dead corners keep coordinates, so detJ
    alone would NOT exclude them)."""
    n00 = lat[:-1, :-1]
    n10 = lat[1:, :-1]
    n11 = lat[1:, 1:]
    n01 = lat[:-1, 1:]
    if route.uniform_sel == "up":
        w1 = _tri_body_work(n00, n10, n11, pts, w, body_force)
        w2 = _tri_body_work(n00, n11, n01, pts, w, body_force)
    elif route.uniform_sel == "down":
        w1 = _tri_body_work(n00, n10, n01, pts, w, body_force)
        w2 = _tri_body_work(n10, n11, n01, pts, w, body_force)
    else:
        sel = route.sel
        w1 = jnp.where(sel > 0,
                       _tri_body_work(n00, n10, n11, pts, w, body_force),
                       _tri_body_work(n00, n10, n01, pts, w, body_force))
        w2 = jnp.where(sel > 0,
                       _tri_body_work(n00, n11, n01, pts, w, body_force),
                       _tri_body_work(n10, n11, n01, pts, w, body_force))
    if route.all_present:
        return jnp.sum(w1) + jnp.sum(w2)
    return jnp.sum(route.t1 * w1 + route.t2 * w2)


def extra_elements_energy(node: jax.Array, conn: jax.Array, E: float,
                          nu: float, w_sum: float) -> jax.Array:
    """Elastic strain energy of a small irregular element set gathered
    from the [N, 4] node table — the generic collar term of hybrid
    meshes (``mesh/hybrid.py``).  Correct but NOT the fast path: on v5e
    a big-table (>256K-row) random access costs ~5 ns/row gathered and
    ~60 ns/row scatter-added REGARDLESS of how few rows move (latency-
    bound, measured r3), so even a 2.5K-triangle collar adds ~450 µs of
    fwd+bwd.  :func:`collar_energy` removes the big-table traffic; this
    stays as the reference implementation and the fallback when the
    route carries no compact tables."""
    f = E / (1.0 - nu ** 2)
    g = node[conn]                               # [K, 3, 4]
    e = _tri_energy(g[:, 0, :], g[:, 1, :], g[:, 2, :], f, nu)
    return w_sum * jnp.sum(e)


@jax.custom_vjp
def _take_sorted_rows(node: jax.Array, ids: jax.Array) -> jax.Array:
    """node[ids] for SORTED UNIQUE ids with a sorted-unique scatter-add
    backward — the one unavoidable big-table access of the collar fast
    path, annotated so XLA skips sort/dedup handling."""
    return jax.lax.gather(
        node, ids[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, node.shape[1]),
        indices_are_sorted=True, unique_indices=True)


def _tsr_fwd(node, ids):
    return _take_sorted_rows(node, ids), (ids, node.shape)


def _tsr_bwd(res, ct):
    ids, shape = res
    z = jnp.zeros(shape, ct.dtype)
    return (z.at[ids].add(ct, indices_are_sorted=True,
                          unique_indices=True), None)


_take_sorted_rows.defvjp(_tsr_fwd, _tsr_bwd)


def collar_energy(node: jax.Array, hy, E: float, nu: float,
                  w_sum: float, body_force=None, pts=None, w=None
                  ) -> jax.Array:
    """Collar term of hybrid meshes in compact node space (fast path).

    The collar touches two node families: hole-rim points, which the
    hybrid generator places as the node-table SUFFIX (a slice forward,
    a zero-pad backward — both dense and ~free), and the staircase
    lattice nodes (``hy.stair_ids``, ~O(rim) of them), the only rows
    that need big-table access (one sorted-unique gather forward, one
    sorted-unique scatter-add backward).  All element math then runs in
    the compact ``[stair | rim]`` table, whose backward is the
    scatter-free incidence gather (``ops/assembly.py``).  Measured at
    847K/2.5K-collar: full hybrid step 616 -> 316 µs fwd+bwd (the
    big-table scatter of ~1.4K stair rows, ~60 ns/row, is the remaining
    collar cost).  Numerics: equal to :func:`extra_elements_energy` up
    to reassociation (equality-tested in tests/test_hybrid.py)."""
    n_lat = hy.lattice.nx * hy.lattice.ny
    f = E / (1.0 - nu ** 2)
    compact = jnp.concatenate(
        [_take_sorted_rows(node, hy.stair_ids), node[n_lat:]], axis=0)
    g = assembly.gather_with_incidence(compact, hy.extra_conn_rel,
                                       hy.extra_incidence)
    e = w_sum * jnp.sum(_tri_energy(g[:, 0, :], g[:, 1, :], g[:, 2, :],
                                    f, nu))
    if body_force is not None:
        e = e - jnp.sum(_tri_body_work(g[:, 0, :], g[:, 1, :],
                                       g[:, 2, :], pts, w, body_force))
    return e


def lattice_total(node: jax.Array, route, E: float, nu: float,
                  w_sum: float, t_x: float, t_y: float = 0.0
                  ) -> jax.Array:
    """domain - traction work, all from lattice slices.  The uniform
    traction on linear edges integrates exactly:
    t . integral u ds = ds * (t_x (u0x+u1x) + t_y (u0y+u1y)) / 2."""
    lat = _lat(node, route)       # built once, shared by both terms
    dom = _domain_from_lat(lat, route, E, nu, w_sum)
    return dom - _edge_work(lat, route, t_x, t_y)


def _edge_work(lat, route, t_x: float, t_y: float = 0.0) -> jax.Array:
    """Traction work from the lattice face slices (see lattice_total)."""
    if not route.edge_masks:
        return jnp.zeros((), lat.dtype)
    sel = {
        "right": lambda k: lat[-1, :, k],
        "left": lambda k: lat[0, :, k],
        "up": lambda k: lat[:, -1, k],
        "down": lambda k: lat[:, 0, k],
    }
    work = jnp.zeros((), lat.dtype)
    for face, mask in route.edge_masks.items():
        cx = sel[face](0)
        cy = sel[face](1)
        ds = jnp.sqrt((cx[1:] - cx[:-1]) ** 2 + (cy[1:] - cy[:-1]) ** 2)
        if t_x:
            ux = sel[face](2)
            work = work + t_x * jnp.sum(
                mask * ds * 0.5 * (ux[1:] + ux[:-1]))
        if t_y:
            uy = sel[face](3)
            work = work + t_y * jnp.sum(
                mask * ds * 0.5 * (uy[1:] + uy[:-1]))
    return work
