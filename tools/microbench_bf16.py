"""Microbench: bf16-stored node table for the VPU-bound lattice stencil
(VERDICT r3 #8).

Round 3 established the 922K lattice step is VPU-compute-bound ~15x
above the HBM read floor (``ops/lattice_slab.py`` module doc), so the
candidate lever is precision, not bytes: evaluate the element stencil
from a bf16 node table (with f32 sum accumulation) and measure both the
step time and the accuracy delta against the f32 route.  The measured
MXU fact (CLAUDE.md) predicts ~1e-3 relative energy error; VPU
elementwise bf16 may or may not run at 2x f32 rate on v5e — this A/B
decides.

Variants:
  f32      — the production lattice route (baseline)
  bf16     — node table cast to bf16 before the stencil; per-quad
             energies accumulate in f32 (jnp.sum dtype)
  bf16-io  — node table STORED bf16 (halves the HBM traffic of the
             fill/read) but stencil math in f32 (upcast per slice)

Run: ``python -m tools.microbench_bf16 [nx ny]`` (real chip).

## Measured result (r4, 961x481 = 922K elements): CLEAR NEGATIVE

::

    bf16     rel |dE| = 4.94e-01   max rel |dgrad| = nan
    bf16-io  rel |dE| = 4.95e-01   max rel |dgrad| = nan
    f32      vg 120.7 us/step
    bf16     vg 106.7 us/step
    bf16-io  vg 108.5 us/step

* Speed: only **1.13x** — v5e VPU elementwise bf16 does NOT run at 2x
  f32 rate on this stencil, and the step was compute-bound, so halved
  IO bytes barely show.
* Accuracy: **catastrophic, and structural** — the stencil takes
  coordinate DIFFERENCES of O(1) absolute coordinates.  bf16's 8-bit
  mantissa gives a quantum of 0.0078 at magnitude 2.0, LARGER than
  the 0.0021 node spacing: element edge vectors quantize to garbage,
  |detJ| hits the 1e-12 guard, grads NaN.  This is not a tolerance
  issue; any absolute-coordinate mesh at >=256 elements per unit
  length is unrepresentable in bf16.  A fix would need per-element
  relative coordinates (store quad-local deltas) — a layout change
  worth at most the 1.13x above.  Recorded as a closed negative.
"""

from __future__ import annotations

import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.ops import quadrature as quad
from hidenn_fem_tpu.ops.lattice_energy import lattice_total
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def main(nx: int = 961, ny: int = 481):
    mesh = ht.proxy_plate_mesh(nx=nx, ny=ny)
    rt = mesh.lattice
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    node0 = model.packed_nodes(params, mesh)
    w_sum = quad.triangle_weight_sum(4)
    t_x = 100e3 / 1.0

    def total_f32(node):
        return lattice_total(node, rt, 10e9, 0.3, w_sum, t_x)

    def total_bf16(node):
        return lattice_total(node.astype(jnp.bfloat16), rt, 10e9, 0.3,
                             w_sum, t_x).astype(jnp.float32)

    def total_bf16_io(node):
        return lattice_total(node.astype(jnp.bfloat16)
                             .astype(jnp.float32),
                             rt, 10e9, 0.3, w_sum, t_x)

    # ---- accuracy deltas (host, once)
    v32, g32 = jax.value_and_grad(total_f32)(node0)
    for name, fn in (("bf16", total_bf16), ("bf16-io", total_bf16_io)):
        v, g = jax.value_and_grad(fn)(node0)
        dv = abs(float(v) - float(v32)) / max(abs(float(v32)), 1e-30)
        gs = float(jnp.max(jnp.abs(g32)))
        dg = float(jnp.max(jnp.abs(g.astype(jnp.float32) - g32))) / gs
        print(f"{name:8s} rel |dE| = {dv:.3e}   max rel |dgrad| = {dg:.3e}")

    # ---- step timings (value_and_grad w.r.t. the node table)
    def stepper(fn):
        def step(carry, node):
            s, j = carry
            v, g = jax.value_and_grad(fn)(
                node + 1e-30 * j.astype(node.dtype))
            t = v + 1e-30 * jnp.sum(g)
            j2 = lax.bitcast_convert_type(
                t.astype(jnp.float32), jnp.int32) & 1
            return (s + t * 1e-30, j2), s
        return step

    for name, fn in (("f32", total_f32), ("bf16", total_bf16),
                     ("bf16-io", total_bf16_io)):
        dt = slope_time_scan(
            stepper(fn), (jnp.zeros(()), jnp.zeros((), jnp.int32)),
            n1=50, n2=550, args=(node0,))
        print(f"{name:8s} vg {dt*1e6:8.1f} us/step")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
