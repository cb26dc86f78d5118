"""Microbench: row-reduction levers for the genuinely-unstructured
assembly gathers (VERDICT r3 #1a/#1b), plus the v5e gather cost model
they are judged against.

Run: ``python -m tools.microbench_rowpack`` (real chip).

## Measured cost model (r4, LICM-proof slope timing; see the gotcha
below)

Gathering X rows from an [R, C] f32 table costs per ROW, independent
of row width up to at least C=32 (128 B):

* R <= 131K rows:  ~2.5 ns/row
* R >= 262K rows:  ~5 ns/row (the r1 "~256K-row cliff" — it is a ROW
  cliff, not a byte cliff: C=2 at 2.1 MB and C=32 at 33 MB both jump
  at the same R)
* C=1 tables are anomalously SLOW (~7.2 ns/row at every R): scalar
  rows waste the transaction; never gather single-channel tables.

So the only lever against a gather-bound step is FEWER ROWS — wider
rows are free, and the windowed (banded) tables already sit below the
row cliff.

## Lever results at 922K elements (3-hole plate, RCM/banded order)

* dedup'd node-group gather (k=8 nodes/row, per-element distinct
  groups): 2.56M -> 1.81M rows, measured 5.38 ms vs the ~6.9 ms
  windowed-flat equivalent = **1.28x**, before paying the per-vertex
  lane-extraction selects.  Distinct-groups/element is ~2.1 (not the
  hoped ~1.3) because any triangle spans 2 lattice/RCM "rows" — the
  2D geometry floor (measured identically on the Delaunay ~900K mesh:
  2.14).
* quad pairing (4 shared rows per triangle pair instead of 6):
  2/3 of the rows = at best **1.5x** on the forward gather leg only.
* chunked permutation fill (aligned 2k-node window pairs + offset
  select): gathers collapse to ~0.14 ms but the pipeline LOSES to the
  flat fill (3.8 vs 2.4 ms/direction) — the pad/concat/select passes
  on minor-dim-32/64 arrays pay Mosaic lane relayouts that dwarf the
  gather win.  Kept as a tested negative (HDNN_LATTICE_CHUNK=1).
* static-quartile windowed fill (source split into q static slices,
  each below the row cliff; monotone map -> contiguous output ranges,
  so NO scan / dynamic slices / selects): 2.13 (q=4) / 1.98 (q=8) vs
  2.41 ms/direction flat = **1.2x** — the sub-cliff rate does not
  fully materialize when the gather operand is a fused window temp.
  Not worth the table machinery; flat stays the production fill and
  hole meshes steer to keep_dead_nodes=True / hybrid instead.

Conclusion recorded for VERDICT r3 #1 (r4, superseded in part): from
the per-LEG bounds here, row-reduction looked like ~1.3-1.5x — but the
END-TO-END quad-pairing experiment (``tools/microbench_quadpair.py``)
measures a full **2.0x** on the complete vg chain at 65K elements
(the incidence padding shrinks faster than the row counts), so quad
pairing graduates from "bound" to "land it".  The production answer
for hole-plate geometry remains the auto-hybridizer
(``generate_mesh_unstructured(..., prefer_hybrid=True)``, default);
pairing targets the any-mesh banded fallback.

## Benchmarking gotcha (cost us a round)

A gather with operands invariant across a ``lax.scan`` is hoisted by
XLA (LICM) and times as ~0: thread a carry-dependent perturbation
through the INDICES (e.g. ``idx + (bitcast(sum) & 1)``) — not just
the summed output.
"""

from __future__ import annotations

import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.structured import generate_mesh
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def _timeit(name, fn, *args, n1=20, n2=220):
    def step(carry, *a):
        s, j = carry
        out = fn(j, *a)
        t = jnp.sum(out)
        j2 = lax.bitcast_convert_type(t, jnp.int32) & 1
        return (s + t * 1e-30, j2), s

    dt = slope_time_scan(step, (jnp.zeros(()), jnp.zeros((), jnp.int32)),
                         n1=n1, n2=n2, args=args)
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return dt


def gather_rate_probe(x_rows: int = 428_000):
    """The cost-model table (module doc)."""
    rng = np.random.default_rng(0)
    for c in (1, 2, 4, 8, 32):
        for r in (32_768, 131_072, 262_144, 1_048_576):
            tab = jnp.asarray(
                rng.standard_normal((r, c)).astype(np.float32))
            idx = jnp.asarray(
                rng.integers(0, r - 1, size=x_rows).astype(np.int32))
            dt = _timeit(f"  R={r:8d} C={c:2d}",
                         lambda j, t, i: t[i + j], tab, idx)
            print(f"    -> {dt/x_rows*1e9:5.2f} ns/row")


def lever_probe():
    mesh = generate_mesh(
        nx=961, ny=481,
        holes=((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1)))
    n = mesh.n_nodes
    conn = np.asarray(mesh.connectivity, np.int64)
    ne = conn.shape[0]
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))

    idx_flat = jnp.asarray(conn.reshape(-1).astype(np.int32))
    _timeit("flat 3Ne-row gather (unwindowed, over-cliff)",
            lambda j, s, ix: (s + 1e-30 * j.astype(s.dtype))[ix],
            src, idx_flat)

    k = 8
    g = np.sort(conn // k, axis=1)
    r2 = g[g[:, 1] != g[:, 0], 1]
    r3 = g[g[:, 2] != g[:, 1], 2]
    rows = ne + r2.size + r3.size
    print(f"  dedup k={k}: {rows} rows vs {3*ne} flat "
          f"(distinct/elem {rows/ne:.2f})")
    rt = -(-n // k)
    a = jnp.asarray(g[:, 0].astype(np.int32))
    b = jnp.asarray(r2.astype(np.int32))
    c = jnp.asarray(r3.astype(np.int32))

    def group_gather(j, s, a, b, c):
        s = s + 1e-30 * j.astype(s.dtype)
        flat = jnp.pad(s, ((0, rt * k - n), (0, 0))).reshape(rt, k * 4)
        return jnp.concatenate([flat[a], flat[b], flat[c]], axis=0)

    _timeit("dedup node-group gather (k=8, 32-wide rows)",
            group_gather, src, a, b, c)

    idx_pair = jnp.asarray(conn[:, :2].reshape(-1).astype(np.int32))
    _timeit("paired-rows proxy (2Ne rows, quad pairing bound)",
            lambda j, s, ix: (s + 1e-30 * j.astype(s.dtype))[ix],
            src, idx_pair)


def main():
    if "--rates" in sys.argv:
        gather_rate_probe()
    lever_probe()


if __name__ == "__main__":
    main()
