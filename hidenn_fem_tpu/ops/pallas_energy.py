"""Fused Pallas TPU kernel for the P1 plane-stress element energy.

Replaces the XLA elementwise pipeline of the fused assembly
(``losses.PlaneStressEnergy.domain_energy``) with exactly two custom
kernels around the unavoidable gather/scatter:

    forward :  gather [Ne,3,4] -> transpose [12, Ne] -> ONE kernel
               (strain algebra + energy density + block partial sums)
    backward:  ONE kernel (d(energy)/d(nodal block), derived by jax.grad
               *inside* the kernel body -- AD at trace time, so the manual
               formula can never drift from the forward) -> transpose ->
               scatter-add

Why [12, Ne]: each of the 12 nodal scalars (3 vertices x (cx, cy, ux, uy))
becomes a contiguous [Ne] lane-major row, so every VPU op in the kernel
runs at full 8x128 width; the [Ne, 3, 4]-shaped layout would use 12 of 128
lanes (~9% efficiency).  The row order is vertex-major: row v*4+k.

Energy formula (same math as losses.py fused path, reference semantics at
``/root/reference/src/loss.py:55-88`` with the *correct* dN/dx = J^{-T}D_N
convention):

    a = v0 - v2, b = v1 - v2, det = ax*by - bx*ay
    exx = ( by*d0x - ay*d1x) / det         d0 = u0 - u2
    eyy = (-bx*d0y + ax*d1y) / det         d1 = u1 - u2
    gxy = (by*d0y - ay*d1y - bx*d0x + ax*d1x) / det
    dens = f/2 (exx^2 + eyy^2 + 2 nu exx eyy) + f(1-nu)/4 gxy^2
    E_elem = w_sum * |det| * dens

Zero-padded columns (for block alignment or element-shard padding)
contribute exactly 0: all diffs are 0, so the eps-guarded 1/det makes the
strains 0, not NaN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["element_energy_pallas", "ROWS"]

ROWS = 12          # 3 vertices x (cx, cy, ux, uy)
_BLOCK = 2048      # elements per kernel block (lane-major)
_EPS_DET = 1e-12


def _block_energy_lanes(g, E, nu, w_sum):
    """Per-element (per-lane) elastic energies of one [ROWS, B] block —
    the docstring formula, before the block reduction."""
    f = E / (1.0 - nu ** 2)
    ax = g[0] - g[8]
    ay = g[1] - g[9]
    bx = g[4] - g[8]
    by = g[5] - g[9]
    d0x = g[2] - g[10]
    d0y = g[3] - g[11]
    d1x = g[6] - g[10]
    d1y = g[7] - g[11]
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


def _block_energy(g, E, nu, w_sum, edge_start=None, tw=0.0, col0=0):
    """Scalar energy of one [ROWS, B] block (pure JAX; used by both the
    forward kernel and, via jax.grad, the backward kernel).

    With ``edge_start`` set, columns at global index >= edge_start are
    Neumann EDGE pseudo-elements (n0, n1, n1) appended after the real
    elements (``mesh.fused_connectivity``): they contribute
    tw * ds * (u0x + u1x)/2 — the analytic uniform-traction edge work
    (``/root/reference/src/loss.py:91-110``) with tw = -t_x so that
    total = domain - traction work.  The degenerate triangle has
    det == 0, so an edge column's elastic term vanishes exactly, and the
    iota mask keeps real elements out of the traction term — domain and
    edge energies ride ONE gather and ONE kernel with no extra rows.
    ``col0`` is the block's global column offset (program_id * BLOCK).
    """
    total = jnp.sum(_block_energy_lanes(g, E, nu, w_sum))
    if edge_start is not None:
        cols = col0 + jax.lax.iota(jnp.int32, g.shape[1])
        sx = g[0] - g[4]
        sy2 = g[1] - g[5]
        # clamped below so d(sqrt)/dz stays finite on zero-padded columns
        ds = jnp.sqrt(jnp.maximum(sx * sx + sy2 * sy2, 1e-30))
        work = jnp.where(cols >= edge_start,
                         ds * 0.5 * (g[2] + g[6]), 0.0)
        total = total + tw * jnp.sum(work)
    return total


def _fwd_kernel(g_ref, out_ref, *, E, nu, w_sum, edge_start=None,
                tw=0.0):
    # TPU grid iterations are sequential: accumulate every block's partial
    # energy into the single (1, 1) output
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

    col0 = pl.program_id(0) * g_ref.shape[1]
    out_ref[0, 0] += _block_energy(g_ref[...], E, nu, w_sum,
                                   edge_start, tw, col0)


def _bwd_kernel(ct_ref, g_ref, out_ref, *, E, nu, w_sum, edge_start=None,
                tw=0.0):
    # d(block energy)/d(g) via AD inside the kernel, scaled by the
    # upstream scalar cotangent (SMEM)
    col0 = pl.program_id(0) * g_ref.shape[1]
    grad = jax.grad(lambda g: _block_energy(g, E, nu, w_sum,
                                            edge_start, tw, col0))(
        g_ref[...])
    out_ref[...] = grad * ct_ref[0, 0]


def _pad_cols(gT, block):
    ne = gT.shape[1]
    pad = (-ne) % block
    if pad:
        gT = jnp.pad(gT, ((0, 0), (0, pad)))
    return gT


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def element_energy_pallas(gT, E, nu, w_sum, interpret=False,
                          edge_start=None, tw=0.0):
    """Total elastic energy from transposed gathered nodes gT [12, Ne].

    With ``edge_start``/``tw`` set, columns >= edge_start are Neumann
    edge pseudo-elements contributing tw * ds * (u0x+u1x)/2 (the fused
    domain+edge total; see ``_block_energy``).

    ``interpret=True`` runs the kernels in the Pallas interpreter
    (CPU-testable, bit-matching semantics).
    """
    return _forward(gT, E, nu, w_sum, interpret, edge_start, tw)


def _forward(gT, E, nu, w_sum, interpret, edge_start=None, tw=0.0):
    gT = _pad_cols(gT, _BLOCK)
    nb = gT.shape[1] // _BLOCK
    rows = gT.shape[0]
    total = pl.pallas_call(
        functools.partial(_fwd_kernel, E=E, nu=nu, w_sum=w_sum,
                          edge_start=edge_start, tw=tw),
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, _BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), gT.dtype),
        interpret=interpret,
    )(gT)
    return total[0, 0]


def _fwd_rule(gT, E, nu, w_sum, interpret, edge_start=None, tw=0.0):
    return _forward(gT, E, nu, w_sum, interpret, edge_start, tw), gT


def _bwd_rule(E, nu, w_sum, interpret, edge_start, tw, gT, ct):
    ne = gT.shape[1]
    gTp = _pad_cols(gT, _BLOCK)
    nb = gTp.shape[1] // _BLOCK
    rows = gTp.shape[0]
    ct_arr = jnp.full((1, 1), ct, dtype=gT.dtype)
    cot = pl.pallas_call(
        functools.partial(_bwd_kernel, E=E, nu=nu, w_sum=w_sum,
                          edge_start=edge_start, tw=tw),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, _BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(gTp.shape, gT.dtype),
        interpret=interpret,
    )(ct_arr, gTp)
    return (cot[:, :ne],)


element_energy_pallas.defvjp(_fwd_rule, _bwd_rule)
