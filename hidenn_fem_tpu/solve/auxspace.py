"""Auxiliary-space preconditioning: O(N)-style solves on UNSTRUCTURED
meshes via a structured background lattice.

Geometric multigrid (``solve/multigrid.py``) needs a lattice; general
gmsh-style meshes don't have one.  The auxiliary-space method (Xu's
two-level trick) gets around that: precondition the unstructured system
with

    M^{-1} r  =  omega * D^{-1} r  +  P · B_bg(P^T r)

where D is the exact colored-probe Jacobi diagonal
(``solve/linear.py:jacobi_diagonal``), P is the P1/bilinear
interpolation from a regular background lattice covering the mesh to
the mesh nodes, and B_bg is one multigrid V-cycle of the SAME
plane-stress operator discretized on the background lattice.  The
diagonal handles the high-frequency error; the lattice V-cycle handles
the smooth error that makes plain CG's iteration count grow like
O(1/h).  Both terms are symmetric positive (semi-)definite linear
operators, so standard PCG applies.

All the TPU-hostile parts stay off the iteration path: the lattice,
hierarchy, and transfer tables are built once at setup.  P is four
weighted rows of a flat gather; P^T is applied through a precomputed
background-node -> fine-node incidence table — a gather, NOT the ~7x
slower scatter-add (same trick as ``ops/assembly.py``).

The reference has no counterpart (it never builds or preconditions the
linear system; ``/root/reference/examples/example4.py`` runs generic
optimizers).  Measured at 922K unstructured elements the displacement
solve drops from 2,190 plain-CG iterations to a mesh-independent ~40.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.structured_grid import StructuredGrid, StructuredGridP1
from ..ops import assembly
from . import multigrid as mg
from .linear import _tree_axpy, jacobi_diagonal

__all__ = ["build_aux_preconditioner", "aux_pcg_solve",
           "radapt_aux_solve"]

_TINY = 1e-30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _AuxPrecond:
    """Setup products of the auxiliary-space preconditioner."""

    levels: tuple                 # mg hierarchy on the background grid
    grid: StructuredGrid          # background lattice
    dinv: jax.Array               # [N, 2] guarded inverse fine diagonal
    # generic bilinear transfer tables; None when a lattice-aligned
    # background is active (lat_kind != "") — the lattice path never
    # builds them, and a None fails loudly if misused (an earlier
    # shape-(0,1) placeholder misled introspection, e.g. pt_w.shape[1]
    # as gather depth)
    p_idx: Optional[jax.Array]    # [N*4] flat bg-node ids (corner gather)
    p_w: Optional[jax.Array]      # [N, 4] bilinear weights
    pt_idx: Optional[jax.Array]   # [Nb*D] fine-node ids (+N sentinel)
    pt_w: Optional[jax.Array]     # [Nb, D] weights (0 on pad)
    free: jax.Array               # [N, 1] float 1/0 non-Dirichlet fine
    # optional blocked-window P^T tables (see _windowed_pt): above ~256K
    # rows the flat fine-node table crosses the TPU gather row-rate
    # cliff (~2.5x slower); when the fine numbering is local enough,
    # each bg-row block reads a dynamic-sliced window instead.
    ptw_rel: Optional[jax.Array] = None    # [BB, R, D] window-relative
    ptw_w: Optional[jax.Array] = None      # [BB, R, D] weights
    ptw_starts: Optional[jax.Array] = None  # [BB] window starts
    ptw_width: int = dataclasses.field(metadata=dict(static=True),
                                       default=0)
    omega: float = dataclasses.field(metadata=dict(static=True),
                                     default=0.5)
    # the background model the hierarchy was BUILT with (static — frozen
    # hashable dataclass): the V-cycle must run the same operator as the
    # stored dinv/lmax, so solves take it from here instead of trusting
    # the caller to re-pass a matching one.
    bg_model: Optional["StructuredGridP1"] = dataclasses.field(
        metadata=dict(static=True), default=None)
    # Lattice-aligned background (see _lattice_bg_setup): when the mesh
    # carries a lattice/hybrid route, the background grid IS the fine
    # node lattice (appended-side-padded to a 2^L-divisible quad count
    # so the MG hierarchy can coarsen), so P/P^T on the lattice part
    # are a reshape+zero-pad (kind "reshape": identity/prefix_identity
    # routes) or a flat permutation gather (kind "perm": hole meshes
    # with deleted nodes) — never the [N,4] bilinear corner gathers,
    # which dominate per-iteration cost at scale (~5 ns/row over a
    # >256K-row table, CLAUDE.md).  Hybrid rim nodes (the node-table
    # suffix) keep tiny bilinear tables into the padded bg space.
    lat_kind: str = dataclasses.field(metadata=dict(static=True),
                                      default="")
    lat_nx: int = dataclasses.field(metadata=dict(static=True),
                                    default=0)
    lat_ny: int = dataclasses.field(metadata=dict(static=True),
                                    default=0)
    lat_inv: Optional[jax.Array] = None   # [nx*ny] perm: pos -> node (+n)
    lat_pos: Optional[jax.Array] = None   # [N] perm: node -> pos
    rim_corners: Optional[jax.Array] = None  # [R*4] flat PADDED bg ids
    rim_w: Optional[jax.Array] = None        # [R, 4]
    aff_ids: Optional[jax.Array] = None      # [A] flat padded bg ids
    aff_inc: Optional[jax.Array] = None      # [A*D] rim-relative (+R)
    aff_w: Optional[jax.Array] = None        # [A, D]


def _bg_lattice(coords: np.ndarray, dirichlet: np.ndarray,
                bg_nx: int, bg_ny: int) -> StructuredGrid:
    """Uniform background StructuredGrid covering the mesh bbox, with
    Dirichlet transferred by rasterizing the fine Dirichlet nodes to
    their nearest lattice node (preconditioner-quality only — the fine
    BCs stay exact through the fine operator)."""
    x0, y0 = coords.min(axis=0)
    x1, y1 = coords.max(axis=0)
    pad = 1e-6 * max(x1 - x0, y1 - y0, 1.0)
    x0, y0, x1, y1 = x0 - pad, y0 - pad, x1 + pad, y1 + pad
    xs = np.linspace(x0, x1, bg_nx)
    ys = np.linspace(y0, y1, bg_ny)
    xv, yv = np.meshgrid(xs, ys, indexing="ij")
    bgc = np.stack([xv, yv], axis=-1).astype(np.float32)

    bc = np.zeros((bg_nx, bg_ny), bool)
    if dirichlet.any():
        dc = coords[dirichlet]
        ix = np.clip(np.rint((dc[:, 0] - x0) / (x1 - x0) * (bg_nx - 1)),
                     0, bg_nx - 1).astype(np.int64)
        iy = np.clip(np.rint((dc[:, 1] - y0) / (y1 - y0) * (bg_ny - 1)),
                     0, bg_ny - 1).astype(np.int64)
        bc[ix, iy] = True

    return StructuredGrid(
        coords=jnp.asarray(bgc),
        geom_boundary_mask=jnp.asarray(np.zeros((bg_nx, bg_ny), bool)),
        dirichlet_mask=jnp.asarray(bc),
        quad_mask=jnp.ones((bg_nx - 1, bg_ny - 1), jnp.float32),
        neumann_edge_masks={},
        u_dirichlet=None,
        split="up",
    )


def _lattice_bg_setup(mesh, route, dirichlet: np.ndarray):
    """Fine-lattice-resolution background grid + transfer tables.

    The background StructuredGrid reuses the mesh's own node lattice
    (``mesh/lattice.py`` route): same coordinates, Dirichlet taken
    EXACTLY from the fine mask (no rasterization), and the hole quads
    masked from the route's triangle-presence masks.  The quad lattice
    is padded append-side to the next multiple of 2^L (L chosen so the
    coarsest level has ~8-16 nodes on the short axis) with dead quads,
    so ``mg.build_hierarchy`` gets a deep hierarchy on arbitrary
    (non-2^k+1) lattice shapes; dead padding is outside the operator
    support, so the V-cycle output there is already masked to zero.

    Returns ``(grid, extras)`` where ``extras`` carries the
    ``_AuxPrecond`` lattice fields (lat_kind/"reshape" or "perm",
    rim/affected tables for hybrid suffix nodes).
    """
    nx, ny = route.nx, route.ny
    n_lat = nx * ny
    coords = np.asarray(mesh.coords)
    n = coords.shape[0]

    # per-axis levels of the (monotone) lattice
    if route.identity or route.prefix_identity:
        lat = coords[:n_lat].reshape(nx, ny, 2)
        xs, ys = lat[:, 0, 0].copy(), lat[0, :, 1].copy()
        kind = "reshape"
        extras = dict(lat_kind=kind, lat_nx=nx, lat_ny=ny)
    else:
        inv = np.asarray(route.inv_map, np.int64)
        live = inv < n
        xs = np.full(nx, np.nan)
        ys = np.full(ny, np.nan)
        li, lj = (np.flatnonzero(live) // ny,
                  np.flatnonzero(live) % ny)
        xs[li] = coords[inv[live], 0]
        ys[lj] = coords[inv[live], 1]
        # hole-interior levels can be empty only if a whole lattice
        # row/column died; fill by linear interpolation of the levels
        for arr in (xs, ys):
            bad = np.isnan(arr)
            if bad.any():
                idx = np.arange(arr.size)
                arr[bad] = np.interp(idx[bad], idx[~bad], arr[~bad])
        extras = dict(lat_kind="perm", lat_nx=nx, lat_ny=ny,
                      lat_inv=jnp.asarray(inv, jnp.int32),
                      lat_pos=jnp.asarray(np.asarray(route.fwd_map,
                                                     np.int32)))

    hx = xs[-1] - xs[-2] if nx > 1 else 1.0
    hy = ys[-1] - ys[-2] if ny > 1 else 1.0
    m = max(2, min(nx, ny) - 1)
    lvl = max(1, int(np.floor(np.log2(m))) - 3)
    step = 1 << lvl
    big_nx = -(-(nx - 1) // step) * step + 1
    big_ny = -(-(ny - 1) // step) * step + 1
    xs_pad = np.concatenate(
        [xs, xs[-1] + hx * np.arange(1, big_nx - nx + 1)])
    ys_pad = np.concatenate(
        [ys, ys[-1] + hy * np.arange(1, big_ny - ny + 1)])
    xv, yv = np.meshgrid(xs_pad, ys_pad, indexing="ij")
    bgc = np.stack([xv, yv], axis=-1).astype(np.float32)

    t1 = np.asarray(route.t1)
    t2 = np.asarray(route.t2)
    core = (t1 + t2) > 0
    if n > n_lat:
        # hybrid collar band: rim/collar fine dofs live inside quads
        # the lattice route marks dead, and a dof whose background
        # neighborhood is all-dead gets only the omega*D^{-1} term —
        # measured 102 vs 26 PCG iterations (~2 per rim dof) on a
        # 1-hole plate.  Activating the cells containing rim points
        # (1-dilated, so the whole staircase-to-rim band has background
        # stiffness) restores their coarse correction; the hole
        # interior proper stays dead.
        rimc = coords[n_lat:]
        ix = np.clip(((rimc[:, 0] - xs[0]) / max(hx, 1e-30)).astype(
            np.int64), 0, nx - 2)
        iy = np.clip(((rimc[:, 1] - ys[0]) / max(hy, 1e-30)).astype(
            np.int64), 0, ny - 2)
        band = np.zeros_like(core)
        band[ix, iy] = True
        # non-wrapping 1-dilation (np.roll wraps: a rim cell on the
        # first/last lattice row would activate quads on the OPPOSITE
        # domain edge or inside another hole's dead region)
        bp = np.pad(band, 1)
        d = np.zeros_like(band)
        for si in (0, 1, 2):
            for sj in (0, 1, 2):
                d |= bp[si:si + band.shape[0], sj:sj + band.shape[1]]
        core = core | d
    qm = np.zeros((big_nx - 1, big_ny - 1), np.float32)
    qm[:nx - 1, :ny - 1] = core.astype(np.float32)

    kind_is_reshape = extras["lat_kind"] == "reshape"
    bc = np.zeros((big_nx, big_ny), bool)
    if kind_is_reshape:
        bc[:nx, :ny] = dirichlet[:n_lat].reshape(nx, ny)
    else:
        pos = np.asarray(route.fwd_map, np.int64)
        dn = np.flatnonzero(dirichlet)
        bc[pos[dn] // ny, pos[dn] % ny] = True

    grid = StructuredGrid(
        coords=jnp.asarray(bgc),
        geom_boundary_mask=jnp.asarray(
            np.zeros((big_nx, big_ny), bool)),
        dirichlet_mask=jnp.asarray(bc),
        quad_mask=jnp.asarray(qm),
        neumann_edge_masks={},
        u_dirichlet=None,
        split=route.uniform_sel or "up",
    )

    # hybrid rim suffix: tiny bilinear tables into the PADDED bg space,
    # restricted (and renormalized) to supported corners — bg nodes an
    # active quad references; the rest get no coarse correction (the
    # V-cycle masks them), so weighting them would only attenuate z.
    if kind_is_reshape and n > n_lat:
        rimc = coords[n_lat:]
        fx = np.clip((rimc[:, 0] - xs[0]) / max(hx, 1e-30), 0, nx - 1)
        fy = np.clip((rimc[:, 1] - ys[0]) / max(hy, 1e-30), 0, ny - 1)
        ix = np.clip(np.floor(fx).astype(np.int64), 0, nx - 2)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, ny - 2)
        tx = np.clip(fx - ix, 0.0, 1.0)
        ty = np.clip(fy - iy, 0.0, 1.0)
        corners = np.stack([ix * big_ny + iy,
                            (ix + 1) * big_ny + iy,
                            ix * big_ny + (iy + 1),
                            (ix + 1) * big_ny + (iy + 1)], axis=1)
        w = np.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                      (1 - tx) * ty, tx * ty], axis=1)
        act = qm[:nx - 1, :ny - 1] > 0
        sup = np.zeros((nx, ny), bool)
        sup[:-1, :-1] |= act
        sup[1:, :-1] |= act
        sup[:-1, 1:] |= act
        sup[1:, 1:] |= act
        sup_pad = np.zeros((big_nx, big_ny), bool)
        sup_pad[:nx, :ny] = sup
        w = w * sup_pad.reshape(-1)[corners]
        s = w.sum(axis=1, keepdims=True)
        w = np.where(s > 0, w / np.maximum(s, 1e-30), 0.0).astype(
            np.float32)
        # P^T side: incidence of the affected bg nodes over rim indices
        r_cnt = rimc.shape[0]
        flat_b = corners.reshape(-1)
        flat_r = np.repeat(np.arange(r_cnt, dtype=np.int64), 4)
        flat_w = w.reshape(-1)
        keep = flat_w > 0
        flat_b, flat_r, flat_w = flat_b[keep], flat_r[keep], flat_w[keep]
        aff = np.unique(flat_b)
        remap = np.zeros(big_nx * big_ny, np.int64)
        remap[aff] = np.arange(aff.size)
        rows = remap[flat_b]
        counts = np.bincount(rows, minlength=aff.size)
        d = max(int(counts.max()) if counts.size else 1, 1)
        order = np.argsort(rows, kind="stable")
        rows, flat_r, flat_w = rows[order], flat_r[order], flat_w[order]
        slot = (np.arange(rows.size)
                - np.concatenate([[0], np.cumsum(counts)[:-1]])[rows])
        aff_inc = np.full((aff.size, d), r_cnt, np.int64)
        aff_w = np.zeros((aff.size, d), np.float32)
        aff_inc[rows, slot] = flat_r
        aff_w[rows, slot] = flat_w
        extras.update(
            rim_corners=jnp.asarray(corners.reshape(-1), jnp.int32),
            rim_w=jnp.asarray(w),
            aff_ids=jnp.asarray(aff, jnp.int32),
            aff_inc=jnp.asarray(aff_inc.reshape(-1), jnp.int32),
            aff_w=jnp.asarray(aff_w))
    return grid, extras


def _transfer_tables(coords: np.ndarray, grid_np) -> Tuple[np.ndarray,
                                                           np.ndarray,
                                                           np.ndarray,
                                                           np.ndarray]:
    """Bilinear interpolation tables fine<->background.

    Returns (p_idx [N,4] flat bg ids, p_w [N,4], pt_idx [Nb, D] fine ids
    padded with N, pt_w [Nb, D]).
    """
    bgc, bg_nx, bg_ny = grid_np
    x0, y0 = bgc[0, 0]
    hx = bgc[1, 0, 0] - bgc[0, 0, 0]
    hy = bgc[0, 1, 1] - bgc[0, 0, 1]
    n = coords.shape[0]

    fx = (coords[:, 0] - x0) / hx
    fy = (coords[:, 1] - y0) / hy
    ix = np.clip(np.floor(fx).astype(np.int64), 0, bg_nx - 2)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, bg_ny - 2)
    tx = np.clip(fx - ix, 0.0, 1.0)
    ty = np.clip(fy - iy, 0.0, 1.0)

    corners = np.stack([ix * bg_ny + iy,
                        (ix + 1) * bg_ny + iy,
                        ix * bg_ny + (iy + 1),
                        (ix + 1) * bg_ny + (iy + 1)], axis=1)
    weights = np.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                        (1 - tx) * ty, tx * ty], axis=1).astype(
                            np.float32)

    nb = bg_nx * bg_ny
    flat_b = corners.reshape(-1)
    flat_f = np.repeat(np.arange(n, dtype=np.int64), 4)
    flat_w = weights.reshape(-1)
    order = np.argsort(flat_b, kind="stable")
    flat_b, flat_f, flat_w = flat_b[order], flat_f[order], flat_w[order]
    counts = np.bincount(flat_b, minlength=nb)
    d = max(int(counts.max()), 1)
    pt_idx = np.full((nb, d), n, dtype=np.int64)     # N = sentinel row
    pt_w = np.zeros((nb, d), dtype=np.float32)
    slot = (np.arange(flat_b.size)
            - np.concatenate([[0], np.cumsum(counts)[:-1]])[flat_b])
    pt_idx[flat_b, slot] = flat_f
    pt_w[flat_b, slot] = flat_w
    return corners, weights, pt_idx, pt_w


def _windowed_pt(pt_idx: np.ndarray, pt_w: np.ndarray, n: int,
                 bg_nx: int, bg_ny: int, window_limit: int = 65536):
    """Blocked-window form of the P^T tables (numpy, one-time setup).

    Groups background-lattice rows into ~64 blocks; if every block's
    referenced fine nodes fit a ``window_limit`` contiguous range (true
    for locality-preserving fine numberings like the structured
    generators'), returns (rel [BB, R, D], w [BB, R, D], starts [BB],
    width) with sentinel entries pointing at the appended zeros row.
    Returns None when the numbering is too scattered (flat fallback).
    """
    d = pt_w.shape[1]
    idx2 = pt_idx.reshape(bg_nx, bg_ny * d)
    gb = max(1, bg_nx // 64)
    bb = -(-bg_nx // gb)
    real = idx2 != n
    width = 0
    starts = np.zeros(bb, np.int32)
    for blk in range(bb):
        rows = idx2[blk * gb:(blk + 1) * gb]
        rr = rows[real[blk * gb:(blk + 1) * gb]]
        lo, hi = (int(rr.min()), int(rr.max())) if rr.size else (0, 0)
        starts[blk] = lo
        width = max(width, hi - lo + 1)
    if width > window_limit:
        return None
    width = min(width, n)
    r = gb * bg_ny
    rel = np.full((bb, r, d), width, np.int64)
    w_out = np.zeros((bb, r, d), pt_w.dtype)
    w2 = pt_w.reshape(bg_nx, bg_ny, d)
    for blk in range(bb):
        s = min(int(starts[blk]), n - width)
        starts[blk] = s
        rows = idx2[blk * gb:(blk + 1) * gb].reshape(-1, d)
        rel[blk, :rows.shape[0]] = np.where(rows != n, rows - s, width)
        w_out[blk, :rows.shape[0]] = w2[
            blk * gb:(blk + 1) * gb].reshape(-1, d)
    return (jnp.asarray(rel), jnp.asarray(w_out),
            jnp.asarray(starts), int(width))


def build_aux_preconditioner(loss_fn, params, loss_args, mesh,
                             bg_model: Optional[StructuredGridP1] = None,
                             bg_shape: Optional[Tuple[int, int]] = None,
                             node_colors=None, omega: float = 0.5,
                             u_key: str = "u",
                             lattice_bg: bool = True) -> _AuxPrecond:
    """One-time setup: background lattice + MG hierarchy + transfer
    tables + exact Jacobi diagonal.

    Args:
      loss_fn/params/loss_args: the quadratic fine problem, as for
        ``cg_solve`` (params must be ``{u_key: [N, 2]}``).
      mesh: the ``TriMesh`` (supplies coords/Dirichlet/connectivity).
      bg_model: ``StructuredGridP1`` carrying E, nu for the background
        operator (defaults to E=10e9, nu=0.3 — match your energy!).
      bg_shape: background lattice (nx, ny); default ~half the fine
        resolution per axis, floored at 2^k+1-friendly 33.
    """
    coords = np.asarray(mesh.coords)
    dirichlet = np.asarray(mesh.dirichlet_mask)
    n = coords.shape[0]
    # Only REAL constraints shape the background operator: meshes that
    # keep dead nodes (structured keep_dead_nodes=True, hybrid lattice+
    # collar) pin them as Dirichlet, and rasterizing those would stamp
    # Dirichlet blobs over the hole regions of the background lattice —
    # killing the coarse correction exactly where the rim error is
    # smooth (measured: 6K hybrid aux-PCG 100-iter stall vs 32 iters on
    # the node-free Delaunay holes).  A node no element references
    # carries no boundary condition of the PDE.
    used = np.zeros(n, dtype=bool)
    used[np.asarray(mesh.connectivity).reshape(-1)] = True
    dirichlet = dirichlet & used

    # lattice/hybrid meshes: the background grid is the fine lattice
    # itself (identity/permutation transfers, exact Dirichlet, fine-
    # resolution operator) unless the caller pinned a bg_shape
    hyb = getattr(mesh, "hybrid", None)
    route = (hyb.lattice if hyb is not None
             else getattr(mesh, "lattice", None))
    lat_grid = lat_extras = None
    if lattice_bg and route is not None and bg_shape is None \
            and route.nx >= 9 and route.ny >= 9:
        lat_grid, lat_extras = _lattice_bg_setup(mesh, route, dirichlet)

    if bg_shape is None:
        side = max(33, int(np.sqrt(n) / 2))
        k = 1 << max(5, int(np.ceil(np.log2(max(side - 1, 1)))))
        ext = coords.max(axis=0) - coords.min(axis=0)
        if ext[0] >= ext[1]:
            bg_shape = (k + 1, k // 2 + 1)
        else:
            bg_shape = (k // 2 + 1, k + 1)
    bg_nx, bg_ny = bg_shape
    if bg_model is None:
        bg_model = StructuredGridP1(E=10e9, nu=0.3)

    if lat_grid is not None:
        grid = lat_grid
    else:
        grid = _bg_lattice(coords, dirichlet, bg_nx, bg_ny)
    levels = mg.build_hierarchy(bg_model, grid,
                                jnp.asarray(grid.coords))
    if lat_grid is None:
        p_idx, p_w, pt_idx, pt_w = _transfer_tables(
            coords, (np.asarray(grid.coords), bg_nx, bg_ny))
    else:
        # lattice-aligned background: generic tables stay None (see
        # the _AuxPrecond field comment — misuse should fail loudly)
        p_idx = p_w = pt_idx = pt_w = None

    if node_colors is None:
        from ..mesh.coloring import color_nodes
        node_colors = color_nodes(np.asarray(mesh.connectivity), n)
    diag = jacobi_diagonal(loss_fn, params, loss_args, node_colors)
    d = diag[u_key]
    dinv = jnp.where(d > _TINY, 1.0 / jnp.maximum(d, _TINY), 0.0)
    # free excludes dead (element-unreferenced) nodes too: the solid
    # background otherwise interpolates junk into dead dofs — energy-
    # invisible (the operator never sees them) but it breaks solution
    # comparisons against plain CG, which leaves them untouched
    free = np.asarray(used & ~dirichlet, np.float32)[:, None]

    win = (_windowed_pt(pt_idx, pt_w, n, bg_nx, bg_ny)
           if lat_grid is None and n > 200_000 else None)
    # flat tables stay below the gather row-rate cliff at small scale;
    # windows only pay above it (and the lattice path needs neither)
    ptw_rel, ptw_w, ptw_starts, ptw_width = (
        win if win is not None else (None, None, None, 0))

    def _opt(a):
        return None if a is None else jnp.asarray(a)

    return _AuxPrecond(
        levels=levels, grid=grid, dinv=dinv,
        p_idx=_opt(None if p_idx is None else p_idx.reshape(-1)),
        p_w=_opt(p_w),
        pt_idx=_opt(None if pt_idx is None else pt_idx.reshape(-1)),
        pt_w=_opt(pt_w),
        free=jnp.asarray(free),
        ptw_rel=ptw_rel, ptw_w=ptw_w, ptw_starts=ptw_starts,
        ptw_width=ptw_width, omega=float(omega), bg_model=bg_model,
        **(lat_extras or {}))


def _apply_aux(bg_model, pre: _AuxPrecond, r, g0s=None):
    """M^{-1} r (see module docstring); [N, 2] in and out."""
    nb_nx, nb_ny = pre.grid.nx, pre.grid.ny
    rf = r * pre.free
    if pre.lat_kind == "reshape":
        # lattice-aligned background: the lattice prefix IS the bg grid
        # core, so P^T is a reshape + zero-pad and P a slice; hybrid
        # rim nodes (the suffix) ride tiny incidence/corner tables
        nx, ny = pre.lat_nx, pre.lat_ny
        n_lat = nx * ny
        r_bg = jnp.pad(rf[:n_lat].reshape(nx, ny, 2),
                       ((0, nb_nx - nx), (0, nb_ny - ny), (0, 0)))
        if pre.rim_corners is not None:
            rim = rf[n_lat:]
            rim_pad = jnp.concatenate(
                [rim, jnp.zeros((1, 2), rf.dtype)])
            g = rim_pad[pre.aff_inc].reshape(*pre.aff_w.shape, 2)
            contrib = jnp.sum(pre.aff_w[..., None] * g, axis=1)
            r_bg = r_bg.reshape(-1, 2).at[pre.aff_ids].add(
                contrib.astype(rf.dtype)).reshape(nb_nx, nb_ny, 2)
        z_bg = mg.vcycle(bg_model, pre.levels, r_bg, g0s=g0s)
        zf = z_bg[:nx, :ny].reshape(-1, 2)
        if pre.rim_corners is not None:
            zc = z_bg.reshape(-1, 2)[pre.rim_corners].reshape(-1, 4, 2)
            z_rim = jnp.sum(pre.rim_w[..., None] * zc, axis=1)
            zf = jnp.concatenate([zf, z_rim.astype(zf.dtype)], axis=0)
        return pre.free * (pre.omega * pre.dinv * r + zf)
    if pre.lat_kind == "perm":
        # deleted-node lattice: P^T/P are a single flat permutation
        # gather each (injective inv_map/fwd_map pair) — ~4x fewer
        # rows than the 4-corner bilinear tables, and the bg operator
        # is the fine-resolution lattice discretization
        nx, ny = pre.lat_nx, pre.lat_ny
        rf_pad = jnp.concatenate([rf, jnp.zeros((1, 2), rf.dtype)])
        r_bg = jnp.pad(rf_pad[pre.lat_inv].reshape(nx, ny, 2),
                       ((0, nb_nx - nx), (0, nb_ny - ny), (0, 0)))
        z_bg = mg.vcycle(bg_model, pre.levels, r_bg, g0s=g0s)
        zf = z_bg[:nx, :ny].reshape(-1, 2)[pre.lat_pos]
        return pre.free * (pre.omega * pre.dinv * r + zf)
    if pre.ptw_rel is not None:
        # blocked-window P^T: each bg-row block gathers from a
        # dynamic-sliced fine window (below the gather row-rate cliff)
        w = pre.ptw_width

        def body(_, inp):
            rel, wts, s = inp
            win = jax.lax.dynamic_slice(rf, (s, 0), (w, 2))
            win = jnp.concatenate(
                [win, jnp.zeros((1, 2), rf.dtype)], axis=0)
            # per-slot gathers keep the gather fused with the weighted
            # add tree even though the rows leave the scan as ys
            # (ops/assembly.py:incidence_gather_sum rationale)
            return None, assembly.weighted_incidence_gather_sum(
                win, rel, wts)

        _, out = jax.lax.scan(
            body, None, (pre.ptw_rel, pre.ptw_w, pre.ptw_starts))
        r_bg = out.reshape(-1, 2)[:nb_nx * nb_ny].reshape(
            nb_nx, nb_ny, 2)
    else:
        # flat P^T: fine-node incidence gather (per-slot, fused)
        r_pad = jnp.concatenate([rf, jnp.zeros((1, 2), r.dtype)])
        r_bg = assembly.weighted_incidence_gather_sum(
            r_pad, pre.pt_idx.reshape(pre.pt_w.shape),
            pre.pt_w).reshape(nb_nx, nb_ny, 2)
    # one V-cycle of the background operator
    z_bg = mg.vcycle(bg_model, pre.levels, r_bg,
                     g0s=g0s).reshape(-1, 2)
    # P z_bg: four weighted corner rows per fine node (per-slot, fused)
    z_coarse = assembly.weighted_incidence_gather_sum(
        z_bg, pre.p_idx.reshape(-1, 4), pre.p_w)
    return pre.free * (pre.omega * pre.dinv * r + z_coarse)


@functools.partial(jax.jit, static_argnames=("loss_fn", "bg_model",
                                             "max_iters", "u_key"))
def _aux_pcg(loss_fn, bg_model, max_iters, tol, u_key, params,
             loss_args, pre):
    # tol is a traced scalar (while_loop condition only): changing the
    # tolerance must not recompile the solver.
    grad_fn = jax.grad(lambda p, *a: loss_fn(p, *a))
    g0 = grad_fn(params, *loss_args)

    def matvec(v):
        gv = grad_fn(_tree_axpy(1.0, v, params), *loss_args)
        return jax.tree.map(jnp.subtract, gv, g0)

    g0s = mg.level_g0s(bg_model, pre.levels)   # loop-invariant, hoisted

    def precond(rt):
        return {u_key: _apply_aux(bg_model, pre, rt[u_key], g0s=g0s)}

    r = jax.tree.map(jnp.negative, g0)
    z = precond(r)
    p = z
    x = jax.tree.map(jnp.zeros_like, params)
    rs0 = jnp.sum(r[u_key] * r[u_key])
    rz = jnp.sum(r[u_key] * z[u_key])
    tiny = jnp.asarray(_TINY, rs0.dtype)
    hist0 = jnp.zeros((max_iters,), rs0.dtype)

    def cond(carry):
        i, _, _, _, _, rs = carry[:6]
        return (i < max_iters) & (rs > (tol * tol) * rs0)

    def body(carry):
        i, x, r, p, rz, rs, hist = carry
        Ap = matvec(p)
        pAp = jnp.sum(p[u_key] * Ap[u_key])
        alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, tiny), 0.0)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, Ap, r)
        z = precond(r)
        rz_new = jnp.sum(r[u_key] * z[u_key])
        beta = rz_new / jnp.maximum(rz, tiny)
        p = jax.tree.map(lambda zl, pl: zl + beta * pl, z, p)
        rs = jnp.sum(r[u_key] * r[u_key])
        hist = hist.at[i].set(jnp.sqrt(rs / jnp.maximum(rs0, tiny)))
        return (i + 1, x, r, p, rz_new, rs, hist)

    _, x, _, _, _, _, hist = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x, r, p, rz, rs0, hist0))
    return jax.tree.map(jnp.add, params, x), hist


def aux_pcg_solve(loss_fn, params, loss_args: tuple = (), mesh=None,
                  bg_model: Optional[StructuredGridP1] = None,
                  bg_shape: Optional[Tuple[int, int]] = None,
                  pre: Optional[_AuxPrecond] = None,
                  max_iters: int = 200, tol: float = 1e-6,
                  u_key: str = "u") -> Tuple[dict, jax.Array]:
    """Auxiliary-space-preconditioned CG for quadratic losses on
    unstructured meshes (see module docstring).  Pass a prebuilt ``pre``
    (``build_aux_preconditioner``) to amortize setup across solves.
    Returns (solution params, per-iteration relative residual norms)."""
    if pre is None:
        pre = build_aux_preconditioner(
            loss_fn, params, tuple(loss_args), mesh, bg_model=bg_model,
            bg_shape=bg_shape, u_key=u_key)
    # the V-cycle must use the model the hierarchy was built with: a
    # mismatched operator vs the stored dinv/lmax silently degrades
    # convergence (the solution stays correct — M stays SPD)
    if pre.bg_model is not None:
        if bg_model is not None and bg_model != pre.bg_model:
            raise ValueError(
                "bg_model does not match the model the preconditioner "
                "was built with; rebuild with build_aux_preconditioner"
                f" (got {bg_model!r}, built with {pre.bg_model!r})")
        bg_model = pre.bg_model
    elif bg_model is None:
        bg_model = StructuredGridP1(E=10e9, nu=0.3)
    return _aux_pcg(loss_fn, bg_model, int(max_iters), float(tol),
                    u_key, params, tuple(loss_args), pre)


def radapt_aux_solve(loss_fn, params, mesh, loss_args: tuple = (),
                     bg_model: Optional[StructuredGridP1] = None,
                     outer_epochs: int = 10, pcg_iters: int = 100,
                     pcg_tol: float = 1e-6, coord_steps: int = 20,
                     coord_lr: float = 1e-7, u_key: str = "u",
                     coord_key: str = "coords"
                     ) -> Tuple[dict, jax.Array]:
    """r-adaptivity on UNSTRUCTURED meshes with auxiliary-space inner
    solves: each epoch (1) aux-PCG-solves the displacement system at
    the current node coordinates, then (2) takes ``coord_steps`` Adam
    steps on the coordinates (the unstructured analog of
    ``multigrid.radapt_mg_solve``).

    Per-epoch setup rebuilds only the exact Jacobi DIAGONAL (the
    coordinates change the stiffness); the background hierarchy and the
    bilinear transfer tables are built once from the INITIAL geometry
    and deliberately lag the moving mesh — they only set preconditioner
    quality, not the solution, and r-adaptive node motion is a small
    perturbation of the initial layout.

    ``loss_fn(params, *loss_args)`` with ``params = {u_key, coord_key}``
    must be quadratic in ``params[u_key]`` at fixed coordinates.
    Returns (params, per-epoch energies at the equilibrated states).
    """
    from ..mesh.coloring import color_nodes
    from . import optimizers as _opt
    from .drivers import run_optimizer
    from .linear import jacobi_diagonal, _u_loss_for

    if bg_model is None:
        bg_model = StructuredGridP1(E=10e9, nu=0.3)
    opt_c = _opt.freeze_groups(_opt.adam(coord_lr), [u_key])
    colors = color_nodes(np.asarray(mesh.connectivity), mesh.n_nodes)
    # memoized: a fresh closure per call would recompile the whole
    # solver each call (jit keys on function identity)
    u_loss = _u_loss_for(loss_fn, u_key, coord_key)

    pre = None
    energies = []
    for _ in range(outer_epochs):
        coords0 = params[coord_key]
        up = {u_key: params[u_key]}
        args = (coords0,) + tuple(loss_args)
        if pre is None:
            pre = build_aux_preconditioner(
                u_loss, up, args, mesh, bg_model=bg_model,
                node_colors=colors, u_key=u_key)
        else:                       # refresh only the exact diagonal
            diag = jacobi_diagonal(u_loss, up, args, colors)[u_key]
            dinv = jnp.where(diag > _TINY,
                             1.0 / jnp.maximum(diag, _TINY), 0.0)
            pre = dataclasses.replace(pre, dinv=dinv)
        pu, _ = aux_pcg_solve(u_loss, up, args, pre=pre,
                              bg_model=bg_model, max_iters=pcg_iters,
                              tol=pcg_tol, u_key=u_key)
        params = {u_key: pu[u_key], coord_key: coords0}
        energies.append(loss_fn(params, *loss_args))
        params, _ = run_optimizer(loss_fn, params, opt_c, coord_steps,
                                  tuple(loss_args))
    return params, jnp.stack(energies)
