"""Block-fused banded plane-stress energy (the large-mesh hot path).

Combines the two big-mesh optimizations measured on v5e:

1. **Blocked-window gathers** (``mesh/banded.py``): every assembly gather
   runs against a dynamic-sliced window below the TPU's ~256K-row gather
   cliff.
2. **In-block consumption**: a gather whose consumer lives in the same
   scan block fuses and runs ~2-3x faster than one that materializes its
   [Ne,3,4] result (measured 8.7ms vs 22.6ms for the same 2.8M rows).
   So the element energy (forward) and the element cotangents (backward)
   are computed *inside* the per-block scan, via the Pallas element
   kernels, and only O(blocks) scalars / the one unavoidable cotangent
   array ever leave a block.

Structure:

  forward:   scan over element blocks:
               window-slice nodes -> flat gather -> [12, EB] -> Pallas
               forward kernel -> scalar partial; sum partials.
  backward:  SINGLE pass — scan over node blocks with element halos:
               each node block window-slices the nodal data of its
               incident element window, recomputes that window's
               cotangents with the Pallas backward kernel (in-kernel
               jax.grad of the energy formula), and immediately
               incidence-gathers them into the block's node gradients.
               No global cotangent array is ever materialized and every
               intermediate is consumed in the scan block it was made in
               (the measured 2-3x gather-fusion win).  Elements on block
               seams are recomputed twice (halo) — recompute is VPU-cheap
               next to the gathers it saves.
             (two-pass fallback kept for meshes whose recompute tables
              exceed the window limit: emit ct blocks, then gather per
              node block.)

Used automatically by ``PlaneStressEnergy`` when ``mesh.banded`` is set
(big meshes) and the backend resolves to Pallas; the interpret flag makes
it CPU-testable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .assembly import incidence_gather_sum as _inc_gather_sum
from .pallas_energy import _block_energy_lanes, ROWS

__all__ = ["banded_element_energy"]

_BLK = 2048  # pallas lane-block within an element block


def _lanes_any(g, E, nu, w_sum):
    """Per-column element energies for any row layout: 12 rows =
    triangles; 16 rows = edge-paired triangle pairs (``mesh/banded.py:
    pair_connectivity`` — slots (0,1,2) and (0,1,3) are the two
    triangles); 24 rows = 4-triangle strips (``strip_connectivity`` —
    sliding triples, triangle i is slots (i, i+1, i+2), so each
    triangle's 12 rows are a CONTIGUOUS slice).  Degenerate filler
    slots contribute exactly zero via the eps-guarded det."""
    if g.shape[0] == ROWS:
        return _block_energy_lanes(g, E, nu, w_sum)
    if g.shape[0] == 24:
        return sum(_block_energy_lanes(g[4 * i:4 * i + 12], E, nu, w_sum)
                   for i in range(4))
    t1 = _block_energy_lanes(g[:12], E, nu, w_sum)
    g2 = jnp.concatenate([g[:8], g[12:16]], axis=0)
    return t1 + _block_energy_lanes(g2, E, nu, w_sum)


def _fwd_kernel(g_ref, out_ref, *, E, nu, w_sum):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

    out_ref[0, 0] += jnp.sum(_lanes_any(g_ref[...], E, nu, w_sum))


def _bwd_kernel(g_ref, out_ref, *, E, nu, w_sum):
    out_ref[...] = jax.grad(
        lambda g: jnp.sum(_lanes_any(g, E, nu, w_sum)))(g_ref[...])


def _vg_kernel(own_ref, g_ref, e_ref, ct_ref, *, E, nu, w_sum):
    """Energy of the OWNED columns + cotangents of ALL columns, one pass.

    ``own_ref`` holds the node block's window-relative ownership interval
    [lo, hi): owned column ranges partition the global element range, so
    summing the masked energies over all node blocks counts every element
    exactly once even though halo columns are recomputed in several
    blocks (their cotangents are needed locally; their energy is not).
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        e_ref[0, 0] = jnp.zeros((), e_ref.dtype)

    g = g_ref[...]
    cols = (pl.program_id(0) * g.shape[1]
            + jax.lax.iota(jnp.int32, g.shape[1]))
    owned = (cols >= own_ref[0, 0]) & (cols < own_ref[0, 1])
    # vjp (not grad-of-sum) so the energy pipeline is traced ONCE and its
    # residuals feed both the masked value and the cotangents
    lanes, vjp_fn = jax.vjp(
        lambda gg: _lanes_any(gg, E, nu, w_sum), g)
    e_ref[0, 0] += jnp.sum(jnp.where(owned, lanes, 0.0))
    ct_ref[...] = vjp_fn(jnp.ones_like(lanes))[0]


def _pallas_fwd(gT, E, nu, w_sum, interpret):
    nb = gT.shape[1] // _BLK
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, E=E, nu=nu, w_sum=w_sum),
        grid=(nb,),
        in_specs=[pl.BlockSpec((gT.shape[0], _BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), gT.dtype),
        interpret=interpret,
    )(gT)
    return out[0, 0]


def _pallas_vg(gT, own, E, nu, w_sum, interpret):
    """(owned-column energy, cotangents of all columns) in one kernel.
    ``own`` is the [1, 2] int32 ownership interval (SMEM scalars)."""
    nb = gT.shape[1] // _BLK
    e, ct = pl.pallas_call(
        functools.partial(_vg_kernel, E=E, nu=nu, w_sum=w_sum),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gT.shape[0], _BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gT.shape[0], _BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), gT.dtype),
            jax.ShapeDtypeStruct(gT.shape, gT.dtype),
        ],
        interpret=interpret,
    )(own, gT)
    return e[0, 0], ct


def _pallas_bwd(gT, E, nu, w_sum, interpret):
    nb = gT.shape[1] // _BLK
    return pl.pallas_call(
        functools.partial(_bwd_kernel, E=E, nu=nu, w_sum=w_sum),
        grid=(nb,),
        in_specs=[pl.BlockSpec((gT.shape[0], _BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gT.shape[0], _BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(gT.shape, gT.dtype),
        interpret=interpret,
    )(gT)


def _gather_block_T(node, rel, start, wnode):
    """Window-slice + flat gather + [k*F, EBpad] lane-major layout
    (12 rows for triangles, 16 for quad pairs)."""
    f = node.shape[-1]
    win = jax.lax.dynamic_slice(node, (start, 0), (wnode, f))
    g12 = win[rel.reshape(-1)].reshape(-1, rel.shape[-1] * f)
    pad = (-g12.shape[0]) % _BLK
    if pad:
        g12 = jnp.pad(g12, ((0, pad), (0, 0)))
    return g12.T                                       # [k*F, EBpad]


def _cot_rows(cotT, ew, f):
    """Flat [*, F] cotangent rows with a ZERO row at index 3*ew (the
    incidence tables' unused-slot sentinel).

    When the kernel block is padded (ew not a multiple of _BLK), the pad
    columns' cotangents are already exactly zero (zero-padded nodal data
    gives zero energy AND zero cotangent — see pallas_energy docstring),
    so the padded transpose reshape is the sentinel table for free.
    Appending a zeros row instead costs a full per-block copy of the
    table and serializes the backward gather behind it — measured
    20.4 -> 17.6 ms/step at 922K elements.
    """
    kk = cotT.shape[0] // f                # 3 triangles, 4 quad pairs
    if ew % _BLK:
        return cotT.T.reshape(-1, f)       # [EWp*k, F]; rows >= k*ew zero
    cot3 = cotT.T[:ew].reshape(ew * kk, f)
    return jnp.concatenate([cot3, jnp.zeros((1, f), cot3.dtype)], axis=0)


def banded_element_energy(node, ba, E, nu, w_sum, interpret):
    """Total elastic energy from the packed node table [N, 4] via the
    blocked-window tables ``ba`` (see module docstring)."""
    return _banded_energy_rows(node, ba, E, nu, w_sum, interpret,
                               jnp.zeros((), jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _banded_energy_rows(node, ba, E, nu, w_sum, interpret, row_start):
    """banded_element_energy with the backward's node rows placed at
    global row ``row_start`` (shard_map per-device offset).

    E/nu/w_sum/interpret are nondiff (static Python scalars): they feed
    the Pallas kernels via closure, and a traced f32[] there is a
    captured-constant error under shard_map-in-jit."""
    return _forward(node, ba, E, nu, w_sum, interpret)


def _forward(node, ba, E, nu, w_sum, interpret):
    wnode = ba.wnode

    def body(_, inp):
        rel, s = inp
        gT = _gather_block_T(node, rel, s, wnode)
        return None, _pallas_fwd(gT, E, nu, w_sum, interpret)

    _, partials = jax.lax.scan(body, None, (ba.conn_rel, ba.starts))
    return jnp.sum(partials)


def _recompute_bwd(node, ba, E, nu, w_sum, interpret, ct, row_start):
    """Single-pass node-block backward (module docstring): recompute the
    incident element window's cotangents in-block and gather them into
    node gradients without materializing the global cotangent array.

    ``row_start`` is the global node row of this table's first node block
    (0 single-device; under shard_map each device owns a contiguous slice
    of node blocks and shard_map's transpose psums the placed buffers).
    """
    f = node.shape[-1]
    n = node.shape[0]
    wn, ew = ba.re_wnode, ba.re_ew

    def body(_, inp):
        conn_rel, ns, rel3 = inp
        gT = _gather_block_T(node, conn_rel, ns, wn)       # [12, EWp]
        cotT = _pallas_bwd(gT, E, nu, w_sum, interpret)    # [12, EWp]
        # [EW, 12] row-major == [EW*3, F]: rows are flat (e_rel*3 + v).
        # The transpose is in-block (consumed by the incidence gather in
        # the same scan block); an in-kernel Mosaic transpose writing
        # [EWp, 16] directly was measured SLOWER (43.7 vs 32.5 ms/step at
        # 922K) than this XLA transpose.
        cot3 = _cot_rows(cotT, ew, f)
        return None, _inc_gather_sum(cot3, rel3)           # [NBr, F]

    _, out = jax.lax.scan(
        body, None, (ba.re_conn_rel, ba.re_nstarts, ba.re_inc_rel))
    rows = out.reshape(-1, f)                              # [Br*NBr, F]
    # place at row_start in a [N + R] buffer, trim to [N]: exact placement
    # whenever row_start <= N; rows past N are table padding by
    # construction, and a row_start beyond N clamps to N => trimmed.
    buf = jnp.zeros((n + rows.shape[0], f), rows.dtype)
    buf = jax.lax.dynamic_update_slice(buf, rows, (row_start, 0))
    return buf[:n] * ct


def _recompute_vg(node, ba, E, nu, w_sum, interpret, row_start):
    """Value AND gradient rows in ONE node-block scan.

    The recompute backward already regathers and rederives everything the
    forward element scan computes, so when the recompute tables carry
    ownership intervals (``re_own_lo/hi``) the whole forward scan can be
    skipped under ``jax.value_and_grad``: the kernel emits each node
    block's owned-element energy alongside the window cotangents, and the
    masked partials sum to the exact total (each element owned by exactly
    one block).  Returns (energy, unscaled grad rows placed at
    ``row_start`` in a [N, F] buffer).
    """
    f = node.shape[-1]
    n = node.shape[0]
    wn, ew = ba.re_wnode, ba.re_ew
    own = jnp.stack([ba.re_own_lo, ba.re_own_hi], axis=1)   # [Br, 2]

    def body(_, inp):
        conn_rel, ns, rel3, ow = inp
        gT = _gather_block_T(node, conn_rel, ns, wn)        # [12, EWp]
        part, cotT = _pallas_vg(gT, ow[None, :], E, nu, w_sum, interpret)
        cot3 = _cot_rows(cotT, ew, f)
        return None, (part, _inc_gather_sum(cot3, rel3))    # [NBr, F]

    _, (parts, out) = jax.lax.scan(
        body, None, (ba.re_conn_rel, ba.re_nstarts, ba.re_inc_rel, own))
    rows = out.reshape(-1, f)                               # [Br*NBr, F]
    buf = jnp.zeros((n + rows.shape[0], f), rows.dtype)
    buf = jax.lax.dynamic_update_slice(buf, rows, (row_start, 0))
    return jnp.sum(parts), buf[:n]


def _two_pass_bwd(node, ba, E, nu, w_sum, interpret, ct):
    """Fallback: emit cotangent blocks (element scan), then assemble per
    node block from windows of the flat cotangent array."""
    f = node.shape[-1]
    wnode, wct = ba.wnode, ba.wct
    eb = ba.conn_rel.shape[1]

    def body1(_, inp):
        rel, s = inp
        gT = _gather_block_T(node, rel, s, wnode)
        cotT = _pallas_bwd(gT, E, nu, w_sum, interpret)  # [12, EBpad]
        kk = cotT.shape[0] // f
        return None, cotT.T[:eb].reshape(eb * kk, f)     # [EB*k, F]

    _, ct_blocks = jax.lax.scan(body1, None,
                                (ba.conn_rel, ba.starts))
    ct_flat = ct_blocks.reshape(-1, f) * ct              # [B*EB*3, F]

    # pass 2: node blocks gather their incident cotangent rows from
    # dynamic-sliced windows (fused with the per-node sum)
    def body2(_, inp):
        rel, s = inp                                     # [NB, maxdeg]
        win = jax.lax.dynamic_slice(ct_flat, (s, 0), (wct, f))
        win = jnp.concatenate(
            [win, jnp.zeros((1, f), win.dtype)], axis=0)
        return None, _inc_gather_sum(win, rel)           # [NB, F]

    _, out = jax.lax.scan(body2, None, (ba.inc_rel, ba.ct_starts))
    return out.reshape(-1, f)[:node.shape[0]]


def _make_bwd():
    def bwd(E, nu, w_sum, interpret, res, ct):
        node, ba, row_start, grad_rows = res
        if grad_rows is not None:
            return grad_rows * ct, None, None
        if ba.re_conn_rel is not None:
            grad_node = _recompute_bwd(node, ba, E, nu, w_sum, interpret,
                                       ct, row_start)
        else:
            grad_node = _two_pass_bwd(node, ba, E, nu, w_sum, interpret,
                                      ct)
        return grad_node, None, None

    def fwd(node, ba, E, nu, w_sum, interpret, row_start):
        if ba.re_conn_rel is not None and ba.re_own_lo is not None:
            # single-pass value-and-grad: skip the forward element scan
            # entirely (the recompute backward regathers everything the
            # forward needs; see _recompute_vg)
            value, grad_rows = _recompute_vg(node, ba, E, nu, w_sum,
                                             interpret, row_start)
            return value, (None, None, None, grad_rows)
        value = _forward(node, ba, E, nu, w_sum, interpret)
        return value, (node, ba, row_start, None)

    return fwd, bwd


_banded_energy_rows.defvjp(*_make_bwd())
