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
  backward:  pass 1 — same scan shape, Pallas backward kernel (in-kernel
               jax.grad of the energy formula) -> cotangent blocks
               ct [B, EB, 3, 4] (single sequential write);
             pass 2 — scan over node blocks: window-slice ct rows ->
               flat incidence gather (fused with the per-node sum) ->
               node gradients.

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

from .pallas_energy import _block_energy, ROWS

__all__ = ["banded_element_energy"]

_BLK = 2048  # pallas lane-block within an element block


def _fwd_kernel(g_ref, out_ref, *, E, nu, w_sum):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

    out_ref[0, 0] += _block_energy(g_ref[...], E, nu, w_sum)


def _bwd_kernel(g_ref, out_ref, *, E, nu, w_sum):
    out_ref[...] = jax.grad(
        lambda g: _block_energy(g, E, nu, w_sum))(g_ref[...])


def _pallas_fwd(gT, E, nu, w_sum, interpret):
    nb = gT.shape[1] // _BLK
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, E=E, nu=nu, w_sum=w_sum),
        grid=(nb,),
        in_specs=[pl.BlockSpec((ROWS, _BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), gT.dtype),
        interpret=interpret,
    )(gT)
    return out[0, 0]


def _pallas_bwd(gT, E, nu, w_sum, interpret):
    nb = gT.shape[1] // _BLK
    return pl.pallas_call(
        functools.partial(_bwd_kernel, E=E, nu=nu, w_sum=w_sum),
        grid=(nb,),
        in_specs=[pl.BlockSpec((ROWS, _BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, _BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(gT.shape, gT.dtype),
        interpret=interpret,
    )(gT)


def _gather_block_T(node, rel, start, wnode):
    """Window-slice + flat gather + [12, EBpad] lane-major layout."""
    f = node.shape[-1]
    win = jax.lax.dynamic_slice(node, (start, 0), (wnode, f))
    g12 = win[rel.reshape(-1)].reshape(-1, ROWS)      # [EB, 12]
    pad = (-g12.shape[0]) % _BLK
    if pad:
        g12 = jnp.pad(g12, ((0, pad), (0, 0)))
    return g12.T                                       # [12, EBpad]


@jax.custom_vjp
def banded_element_energy(node, ba, E, nu, w_sum, interpret):
    """Total elastic energy from the packed node table [N, 4] via the
    blocked-window tables ``ba`` (see module docstring)."""
    return _forward(node, ba, E, nu, w_sum, interpret)


def _forward(node, ba, E, nu, w_sum, interpret):
    wnode = ba.wnode

    def body(_, inp):
        rel, s = inp
        gT = _gather_block_T(node, rel, s, wnode)
        return None, _pallas_fwd(gT, E, nu, w_sum, interpret)

    _, partials = jax.lax.scan(body, None, (ba.conn_rel, ba.starts))
    return jnp.sum(partials)


def _make_bwd():
    def bwd(res, ct):
        node, ba, E, nu, w_sum, interpret = res
        f = node.shape[-1]
        wnode, wct = ba.wnode, ba.wct
        eb = ba.conn_rel.shape[1]

        # pass 1: recompute per element block, Pallas backward kernel,
        # emit cotangent blocks (the one materialized intermediate)
        def body1(_, inp):
            rel, s = inp
            gT = _gather_block_T(node, rel, s, wnode)
            cotT = _pallas_bwd(gT, E, nu, w_sum, interpret)  # [12, EBpad]
            return None, cotT.T[:eb].reshape(eb * 3, f)      # [EB*3, F]

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
            g = win[rel.reshape(-1)].reshape(*rel.shape, f)
            return None, jnp.sum(g, axis=1)                  # [NB, F]

        _, out = jax.lax.scan(body2, None, (ba.inc_rel, ba.ct_starts))
        grad_node = out.reshape(-1, f)[:node.shape[0]]
        return grad_node, None, None, None, None, None

    def fwd(node, ba, E, nu, w_sum, interpret):
        value = _forward(node, ba, E, nu, w_sum, interpret)
        return value, (node, ba, E, nu, w_sum, interpret)

    return fwd, bwd


banded_element_energy.defvjp(*_make_bwd())
