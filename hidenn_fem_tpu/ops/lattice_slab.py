"""Single-pass Pallas value-and-grad kernel for the lattice route.

The XLA lattice route (``ops/lattice_energy.py``) is bandwidth-bound on
materialized intermediates: the compiled 922K value step makes ~3 full
HBM passes before its stencil reduction (Dirichlet selects, the packed
[N, 4] node table, plus the reduce's own read) and the backward adds
several more — measured 74 us value / 157 us fwd+bwd against a ~10 us
read floor (tools/microbench_lattice.py).

This module evaluates the SAME P1 plane-stress domain energy from a
channel-major slab tensor [4, R, ny] (R = row-padded nx) in ONE Pallas
pass per direction:

* channels (cx, cy, ux, uy) ride the MAJOR dim, so every in-kernel
  2D slab [rows, ny] puts mesh columns on the 128-wide lanes —
  the [.., 4] channels-minor layout would use 4/128 lanes;
* each grid instance manually DMAs a [4, BI+8, ny] row window
  (Mosaic slices must be 8-row aligned; one halo row above, up to
  seven below) into VMEM scratch, computes both
  triangle-family energies of all window quads, and emits

    - the energy of its OWNED quad rows (grid-sequential accumulation
      into an SMEM scalar — owned rows partition the quad range, so
      halo quads are recomputed but never double-counted), and
    - complete gradients for its BI node rows (every quad touching
      them is in-window), via ``jax.grad`` of the masked window energy
      *inside* the kernel body — AD at trace time, the manual formula
      can never drift from the forward;

* zero pad rows are masked out by the quad-validity test (a quad with
  a pad row would otherwise contribute garbage energy: zero coords
  against real coords give det != 0).

Supported routes: any ``identity`` node numbering — hole-free "up"/
"down"/"zigzag" generator meshes AND ``keep_dead_nodes=True`` hole
meshes.  Non-uniform diagonals read a ``sel`` mask channel, hole
meshes the ``t1``/``t2`` presence channels; the needed channels ride a
second DMA'd slab (constant, zero cotangent).  Renumbered (permutation
-fill) meshes and f64 fall back to the XLA lattice route (the repo's
Pallas kernels are f32).

Matches the reference hot path ``/root/reference/src/loss.py:55-116``;
numerics equality-tested against ``lattice_energy.lattice_total`` in
``tests/test_lattice_slab.py``.

On-chip A/B (round 3, tools/microbench_slab.py, v5e): **negative** —
the XLA route wins or ties every leg despite its extra
materialization passes.  vg us/step XLA vs slab: 922K-plain
159.5/172.8, 922K-holes-dead 165.5/187.1, 58K-zigzag 8.5/12.6,
6.4K 6.3/6.2 (tie), structured-922K 74.9/78.9; value-only legs lose
by similar margins.  Both routes sit ~15x above the HBM read floor,
i.e. the step is VPU-compute-bound on the stencil math, which the
kernel re-does identically — removing the materialized passes buys
nothing, and the manual window DMA pipeline underlaps XLA's.  The
kernel therefore stays OPT-IN (HDNN_LATTICE_SLAB=1) as a tested
negative; interpret-mode equality keeps covering the numerics.  The
922K grad output is XLA-placed in scoped vmem (S(1)), so masked
variants need the halved block rows in ``_grid`` to fit the 16M
scoped-vmem limit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lattice_total_slab", "slab_supported",
           "structured_domain_slab"]

_BI = 128          # owned node rows per grid instance
_EPS_DET = 1e-12


def mc_args(mc: int) -> int:
    """Input slots used by the route-mask slab (0 or 1)."""
    return 1 if mc else 0


def slab_supported(route, dtype) -> bool:
    """True when the slab kernel covers this route (module doc)."""
    return (route is not None and route.identity
            and dtype == jnp.float32)


def _tri_e(v0, v1, v2, f, nu, w_sum):
    """Element energy of one triangle family from corner channel tuples
    (cx, cy, ux, uy) of 2D slabs — same algebra as
    ``lattice_energy._tri_energy`` / ``pallas_energy._block_energy_lanes``."""
    ax = v0[0] - v2[0]
    ay = v0[1] - v2[1]
    bx = v1[0] - v2[0]
    by = v1[1] - v2[1]
    d0x = v0[2] - v2[2]
    d0y = v0[3] - v2[3]
    d1x = v1[2] - v2[2]
    d1y = v1[3] - v2[3]
    det = ax * by - bx * ay
    safe = jnp.where(jnp.abs(det) < _EPS_DET,
                     jnp.where(det < 0, -_EPS_DET, _EPS_DET), det)
    inv = 1.0 / safe
    exx = (by * d0x - ay * d1x) * inv
    eyy = (-bx * d0y + ax * d1y) * inv
    gxy = ((by * d0y - ay * d1y) + (-bx * d0x + ax * d1x)) * inv
    dens = 0.5 * (f * (exx * exx + eyy * eyy + 2.0 * nu * exx * eyy)
                  + f * (1.0 - nu) / 2.0 * gxy * gxy)
    return w_sum * jnp.abs(det) * dens


def _window_energies(chans, route_masks, sel_up, all_present, f, nu,
                     w_sum):
    """Per-quad energies [rows, lanes] of one window given as four 2D
    channel slabs (cx, cy, ux, uy).

    Corner shifts are ``jnp.roll`` (lowered to cheap lane/sublane
    rotates), NOT slices: inside the kernel this function sits under
    ``jax.grad``, and a slice's transpose is a pad Mosaic cannot lower
    for these shapes, while a roll's transpose is just the opposite
    roll.  Wrapped rows/columns are killed by the validity masks.

    ``sel_up`` is True/False for a trace-time-uniform diagonal, None to
    select per quad from the ``sel`` mask channel; ``route_masks``
    carries the needed channels in order (sel?, t1?, t2?) — constants
    w.r.t. the differentiated chans.
    """
    n00 = chans
    n10 = tuple(jnp.roll(x, -1, axis=0) for x in chans)
    n01 = tuple(jnp.roll(x, -1, axis=1) for x in chans)
    n11 = tuple(jnp.roll(x, -1, axis=1) for x in n10)
    idx = 0
    if sel_up is None:
        sel_w = route_masks[0]
        idx = 1
        e1 = jnp.where(sel_w > 0,
                       _tri_e(n00, n10, n11, f, nu, w_sum),
                       _tri_e(n00, n10, n01, f, nu, w_sum))
        e2 = jnp.where(sel_w > 0,
                       _tri_e(n00, n11, n01, f, nu, w_sum),
                       _tri_e(n10, n11, n01, f, nu, w_sum))
    elif sel_up:
        e1 = _tri_e(n00, n10, n11, f, nu, w_sum)
        e2 = _tri_e(n00, n11, n01, f, nu, w_sum)
    else:
        e1 = _tri_e(n00, n10, n01, f, nu, w_sum)
        e2 = _tri_e(n10, n11, n01, f, nu, w_sum)
    if all_present:
        return e1 + e2
    return route_masks[idx] * e1 + route_masks[idx + 1] * e2


def _masks(i, bi, shape, nx, ny, row0):
    """(valid, owned) quad masks [nquads, nlanes] for grid instance i.

    Window local quad row q covers padded rows (q, q+1) = global node
    rows (row0 + i*bi - 1 + q, row0 + i*bi + q); valid iff both rows
    are real AND the quad column c <= ny-2 (lanes are 128-padded with
    zeros; the mask also kills the roll-wrapped last row/column).
    Owned rows q < bi give the disjoint partition
    [row0 + i*bi - 1, row0 + i*bi + bi - 1) — across instances AND
    across shard_map devices (each device's row0 continues the
    previous one's owned range).
    """
    q = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    qg = row0 + i * bi - 1 + q
    valid = (qg >= 0) & (qg <= nx - 2) & (c <= ny - 2)
    owned = valid & (q < bi)
    return valid, owned


def _read_window(refs, i, bi, mc, nb, row0):
    """Double-buffered window reads: instance i kicks off instance
    i+1's window DMAs before waiting on its own (started by i-1, or by
    itself at i == 0), so the HBM reads overlap the previous window's
    compute; returns (chans, route_masks) views of the current slot."""
    if mc:
        slab_hbm, mask_hbm = refs[0], refs[1]
        w2, mw2, sem, msem = refs[-4:]
    else:
        slab_hbm = refs[0]
        w2, sem = refs[-2:]

    def dmas(j, slot):
        d = [pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(row0 + j * bi, bi + 8), :],
            w2.at[slot], sem.at[slot])]
        if mc:
            d.append(pltpu.make_async_copy(
                mask_hbm.at[:, pl.ds(row0 + j * bi, bi + 8), :],
                mw2.at[slot], msem.at[slot]))
        return d

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        for d in dmas(i, slot):
            d.start()

    @pl.when(i + 1 < nb)
    def _():
        for d in dmas(i + 1, 1 - slot):
            d.start()

    for d in dmas(i, slot):
        d.wait()
    route_masks = tuple(mw2[slot, k] for k in range(mc)) if mc else ()
    return tuple(w2[slot, k] for k in range(4)), route_masks


def _vg_kernel(*refs, f, nu, w_sum, nx, ny, bi, sel_up, all_present,
               mc, r0):
    i = pl.program_id(0)
    k = 1 + mc_args(mc) + (1 if r0 else 0)
    e_ref, g_ref = refs[k], refs[k + 1]
    row0 = refs[1 + mc_args(mc)][0, 0] if r0 else 0

    @pl.when(i == 0)
    def _():
        e_ref[0, 0] = jnp.zeros((), e_ref.dtype)

    chans, route_masks = _read_window(refs, i, bi, mc,
                                      pl.num_programs(0), row0)
    valid, owned = _masks(i, bi, chans[0].shape, nx, ny, row0)

    def masked(chans):
        e = _window_energies(chans, route_masks, sel_up, all_present,
                             f, nu, w_sum)
        return (jnp.sum(jnp.where(valid, e, 0.0)),
                jnp.sum(jnp.where(owned, e, 0.0)))

    g, e_owned = jax.grad(masked, has_aux=True)(chans)
    e_ref[0, 0] += e_owned
    for k in range(4):
        g_ref[k] = g[k][1:bi + 1, :]


def _fwd_kernel(*refs, f, nu, w_sum, nx, ny, bi, sel_up, all_present,
                mc, r0):
    i = pl.program_id(0)
    e_ref = refs[1 + mc_args(mc) + (1 if r0 else 0)]
    row0 = refs[1 + mc_args(mc)][0, 0] if r0 else 0

    @pl.when(i == 0)
    def _():
        e_ref[0, 0] = jnp.zeros((), e_ref.dtype)

    chans, route_masks = _read_window(refs, i, bi, mc,
                                      pl.num_programs(0), row0)
    _, owned = _masks(i, bi, chans[0].shape, nx, ny, row0)
    e = _window_energies(chans, route_masks, sel_up, all_present, f,
                         nu, w_sum)
    e_ref[0, 0] += jnp.sum(jnp.where(owned, e, 0.0))


def _pack(node, nx, ny, nb, bi, rows=None):
    """[N, 4] node table -> channel-major padded slab
    [4, max(nb*bi, rows)+8, ceil128(ny)].

    One zero row above (so every window DMA is in-bounds) and enough
    below to complete the last block's 8-aligned window (rows
    [i*bi, i*bi + bi + 8); the up-to-seven extra quad rows per window
    are masked out or grad-discarded).  The [N, 4] -> [4, N]
    transpose is usually a relayout no-op: XLA already stores the packed
    table minor-dim-first ({0,1:T(4,128)}, see module doc bench notes).
    """
    slab = node.T.reshape(4, nx, ny)
    nyp = -(-ny // 128) * 128
    rows = max(nb * bi, rows or 0)
    return jnp.pad(slab, ((0, 0), (1, rows + 7 - nx),
                          (0, nyp - ny)))


def _grid(nx, mc=0):
    # Mask channels add 2*mc*(bi+8)*nyp*4B of double-buffered window
    # scratch on top of a budget the plain kernel already nearly fills
    # (XLA places the full grad output in scoped vmem, S(1)); halving
    # bi when mc > 0 keeps the 922K holes/zigzag variants under the
    # 16M scoped-vmem limit (measured: bi=128 + mc=2 OOMs by 1.36M).
    cap = _BI if mc == 0 else _BI // 2
    bi = min(cap, max(8, -(-nx // 8) * 8))
    nb = -(-nx // bi)
    return nb, bi


def _pack_masks(route, sel_up, all_present, nb, bi, nyp, dtype,
                rows=None):
    """Needed route-mask channels (sel?, t1?, t2?) as a padded
    [mc, max(nb*bi, rows)+8, nyp] slab whose row p holds global quad
    row p-1 — aligned with the node windows, zero on every pad (t = 0
    kills pad quads; pad sel rows are already row-masked)."""
    chans = []
    if sel_up is None:
        chans.append(route.sel)
    if not all_present:
        chans.extend([route.t1, route.t2])
    if not chans:
        return None
    m = jnp.stack([jnp.asarray(c, dtype) for c in chans])
    nxm, nym = m.shape[1], m.shape[2]
    rows = max(nb * bi, rows or 0)
    return jnp.pad(m, ((0, 0), (1, rows + 7 - nxm),
                       (0, nyp - nym)))


def _specs(slab, masks, nx, ny, nb, bi, vg, row0=None):
    nyp = slab.shape[2]
    mc = 0 if masks is None else masks.shape[0]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [slab]
    if mc:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(masks)
    if row0 is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(row0.reshape(1, 1).astype(jnp.int32))
    scalar = (pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM),
              jax.ShapeDtypeStruct((1, 1), slab.dtype))
    if vg:
        out_specs = [scalar[0],
                     pl.BlockSpec((4, bi, nyp), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [scalar[1],
                     jax.ShapeDtypeStruct((4, nb * bi, nyp),
                                          slab.dtype)]
    else:
        out_specs, out_shape = scalar
    scratch = [pltpu.VMEM((2, 4, bi + 8, nyp), slab.dtype)]
    if mc:
        scratch.append(pltpu.VMEM((2, mc, bi + 8, nyp), slab.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if mc:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return in_specs, operands, out_specs, out_shape, scratch, mc


def _pallas_vg(slab, masks, nx, ny, nb, bi, f, nu, w_sum, sel_up,
               all_present, interpret, row0=None):
    in_specs, operands, out_specs, out_shape, scratch, mc = _specs(
        slab, masks, nx, ny, nb, bi, vg=True, row0=row0)
    e, g = pl.pallas_call(
        functools.partial(_vg_kernel, f=f, nu=nu, w_sum=w_sum, nx=nx,
                          ny=ny, bi=bi, sel_up=sel_up,
                          all_present=all_present, mc=mc,
                          r0=row0 is not None),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return e[0, 0], g


def _pallas_fwd(slab, masks, nx, ny, nb, bi, f, nu, w_sum, sel_up,
                all_present, interpret, row0=None):
    in_specs, operands, out_specs, out_shape, scratch, mc = _specs(
        slab, masks, nx, ny, nb, bi, vg=False, row0=row0)
    e = pl.pallas_call(
        functools.partial(_fwd_kernel, f=f, nu=nu, w_sum=w_sum, nx=nx,
                          ny=ny, bi=bi, sel_up=sel_up,
                          all_present=all_present, mc=mc,
                          r0=row0 is not None),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return e[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _domain_slab(node, masks, nx, ny, E, nu, w_sum, opts):
    """Domain elastic energy from the [N, 4] node table via the slab
    kernel.  ``masks`` is the padded route-mask slab (or None);
    ``opts = (sel_up, all_present, interpret)`` static."""
    sel_up, all_present, interpret = opts
    nb, bi = _grid(nx, 0 if masks is None else masks.shape[0])
    f = E / (1.0 - nu ** 2)
    slab = _pack(node, nx, ny, nb, bi)
    return _pallas_fwd(slab, masks, nx, ny, nb, bi, f, nu, w_sum,
                       sel_up, all_present, interpret)


def _domain_slab_fwd(node, masks, nx, ny, E, nu, w_sum, opts):
    sel_up, all_present, interpret = opts
    nb, bi = _grid(nx, 0 if masks is None else masks.shape[0])
    f = E / (1.0 - nu ** 2)
    slab = _pack(node, nx, ny, nb, bi)
    val, g = _pallas_vg(slab, masks, nx, ny, nb, bi, f, nu, w_sum,
                        sel_up, all_present, interpret)
    return val, (g, masks)


def _domain_slab_bwd(nx, ny, E, nu, w_sum, opts, res, ct):
    # g rows [0, nx) ARE the node rows; [4, N] -> [N, 4] is again the
    # relayout-friendly transpose (module doc).  The mask cotangent is
    # a symbolic zero nobody requests (route masks are mesh constants);
    # XLA dead-code-eliminates it.
    g, masks = res
    node_ct = ct * g[:, :nx, :ny].reshape(4, nx * ny).T
    mct = None if masks is None else jnp.zeros_like(masks)
    return (node_ct, mct)


_domain_slab.defvjp(_domain_slab_fwd, _domain_slab_bwd)


def _edge_work_from_node(node, route, t_x, t_y=0.0):
    """Uniform-traction edge work from direct node-table slices (no
    lattice materialization; identity numbering only).  Same exact
    integral as ``lattice_energy._edge_work``."""
    nx, ny = route.nx, route.ny
    if not route.edge_masks:
        return jnp.zeros((), node.dtype)
    sel = {
        "right": lambda k: node[(nx - 1) * ny:, k],
        "left": lambda k: node[:ny, k],
        "up": lambda k: node[ny - 1::ny, k],
        "down": lambda k: node[::ny, k],
    }
    work = jnp.zeros((), node.dtype)
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


def lattice_total_slab(node, route, E, nu, w_sum, t_x, t_y=0.0,
                       interpret=False):
    """domain - traction work via the slab kernel (module doc).

    Caller must check :func:`slab_supported` first.
    """
    sel_up = {"up": True, "down": False}.get(route.uniform_sel)
    mc = ((1 if sel_up is None else 0)
          + (0 if route.all_present else 2))
    nb, bi = _grid(route.nx, mc)
    nyp = -(-route.ny // 128) * 128
    masks = _pack_masks(route, sel_up, route.all_present, nb, bi, nyp,
                        node.dtype)
    dom = _domain_slab(node, masks, route.nx, route.ny, float(E),
                       float(nu), float(w_sum),
                       (sel_up, route.all_present, interpret))
    return dom - _edge_work_from_node(node, route, t_x, t_y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _domain_slab3(node3, masks, E, nu, w_sum, opts):
    """Slab-kernel domain energy from an [nx, ny, 4] node lattice
    (StructuredGridP1 layout).  ``opts = (sel_up, interpret)``."""
    sel_up, interpret = opts
    nx, ny = node3.shape[0], node3.shape[1]
    nb, bi = _grid(nx, 0 if masks is None else masks.shape[0])
    f = E / (1.0 - nu ** 2)
    slab = _pack3(node3, nb, bi)
    return _pallas_fwd(slab, masks, nx, ny, nb, bi, f, nu, w_sum,
                       sel_up, False, interpret)


def _pack3(node3, nb, bi):
    nx, ny = node3.shape[0], node3.shape[1]
    nyp = -(-ny // 128) * 128
    return jnp.pad(node3.transpose(2, 0, 1),
                   ((0, 0), (1, nb * bi + 7 - nx), (0, nyp - ny)))


def _domain_slab3_fwd(node3, masks, E, nu, w_sum, opts):
    sel_up, interpret = opts
    nx, ny = node3.shape[0], node3.shape[1]
    nb, bi = _grid(nx, 0 if masks is None else masks.shape[0])
    f = E / (1.0 - nu ** 2)
    slab = _pack3(node3, nb, bi)
    val, g = _pallas_vg(slab, masks, nx, ny, nb, bi, f, nu, w_sum,
                        sel_up, False, interpret)
    return val, (g, masks, nx, ny)


def _domain_slab3_bwd(E, nu, w_sum, opts, res, ct):
    g, masks, nx, ny = res
    node_ct = ct * g[:, :nx, :ny].transpose(1, 2, 0)
    mct = None if masks is None else jnp.zeros_like(masks)
    return (node_ct, mct)


_domain_slab3.defvjp(_domain_slab3_fwd, _domain_slab3_bwd)


def structured_domain_slab(node3, quad_mask, split, zigzag_phase, E,
                           nu, interpret=False):
    """``StructuredGridP1._domain_from_node`` via the slab kernel.

    Same math: 0.5 * sum(quad_mask * e) with the split chosen per quad
    ("zigzag" parity rides a sel channel built here; ``quad_mask``
    rides the t1/t2 presence channels — it is a traced array, so the
    all-active case cannot be specialized at trace time).  Opt-in from
    the model via HDNN_LATTICE_SLAB (single-device TPU paths only; the
    shard_map/GSPMD structured paths keep the XLA stencil).
    """
    nx, ny = node3.shape[0], node3.shape[1]
    sel_up = {"up": True, "down": False}.get(split)
    nb, bi = _grid(nx, (1 if sel_up is None else 0) + 2)
    nyp = -(-ny // 128) * 128
    chans = []
    if sel_up is None:
        ii = jnp.arange(nx - 1)[:, None]
        jj = jnp.arange(ny - 1)[None, :]
        chans.append((((ii + jj + zigzag_phase) % 2) == 0
                      ).astype(node3.dtype))
    qm = quad_mask.astype(node3.dtype)
    chans.extend([qm, qm])
    m = jnp.stack(chans)
    masks = jnp.pad(m, ((0, 0), (1, nb * bi + 7 - (nx - 1)),
                        (0, nyp - (ny - 1))))
    return _domain_slab3(node3, masks, float(E), float(nu), 0.5,
                         (sel_up, interpret))
