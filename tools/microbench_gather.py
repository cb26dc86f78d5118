"""A/B microbenchmark: masked-window reduce vs dynamic gather (v5e).

The pure-unstructured energy path is bound by two per-row dynamic
gathers (fwd connectivity ~30 us, bwd incidence ~37 us at 6.4K —
CLAUDE.md "open leads").  The untried idea from VERDICT r2 5b is to
stop paying the VPU's dynamic-addressing rate (~0.5 rows/cycle small
tables, ~0.2 above 256K rows) and brute-force the gather as a masked
compare-select-reduce over a SMALL node sub-window:

    g[r, c] = sum_w (idx[r] == w) * win[w, c]

whose cost is ~9*W' VPU ops per gathered row.  With banded element
order a sub-block of EB' consecutive elements touches a node window of
W' ~ EB'/2 + 2*ny rows, so for small ny (the 6.4K plate: ny=41) the
masked form costs ~2K ops/row vs the gather's ~2 cycles/row (~8K
ops-equivalent).  Crucially the VJP of the masked form is ANOTHER
masked reduce (over rows instead of window) — no scatter anywhere.

This script measures, on the real chip, fwd and value+grad time of a
sum-of-squares consumer over the full connectivity gather for:

  gather+incid — production flat gather + incidence backward
  gather-ad    — plain autodiff gather (scatter-add backward)
  masked-EB'   — sub-blocked masked reduce, pure XLA
  pallas-EB'   — the same masked reduce as a Pallas kernel with
                 scalar-prefetched window blocks (the "DMA-streaming
                 gather kernel" of VERDICT r2 5b)

MEASURED RESULT (v5e, 2026-08-17, 81x41 plate = 19.2K gathered rows):

    gather+incid     fwd  28.9 us   fwd+bwd 114.0 us
    gather-ad        fwd  28.6 us   fwd+bwd 150.3 us
    masked-256 (XLA) fwd 119.8 us   (one-hot materializes in HBM)
    pallas-64/w128   fwd  53.5 us
    pallas-128/w256  fwd  45.4 us

NEGATIVE, and it closes the lead: the Pallas kernel sustains ~2 Tops
(~50% VPU peak, from 88M ops in 45 us at eb=128), so the loss is
algorithmic, not implementation: a masked reduce costs
~9*(EB'/2 + 2*ny) VPU ops per gathered row (the window can never
shrink below the sub-block's own node span plus the mesh bandwidth),
which exceeds the dynamic gather's ~1.5 cycles/row (~6K ops-equiv)
for every window the banded structure can offer.  Mosaic has no
in-VMEM dynamic gather primitive to do better (take_along_axis fails
to lower).  The two production answers stand: the dynamic-gather path
at its ~100 us architectural floor for truly unstructured meshes, and
the gather-free lattice route (6.2 us/step) for lattice-topology ones.

Run: python -m tools.microbench_gather [--scale 922k]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from hidenn_fem_tpu.mesh.structured import generate_mesh
from hidenn_fem_tpu.mesh.banded import reorder_mesh
from hidenn_fem_tpu.ops.assembly import gather_with_incidence
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def build_subblocks(conn: np.ndarray, eb: int, lane: int = 128):
    """Sub-block tables for the masked-window gather.

    Returns (rel [S, EB', 3] int32 window-relative connectivity,
    starts [S] int32, wp static window size).  Padding elements repeat
    the last real element (harmless for the measured consumer).
    """
    ne = conn.shape[0]
    s = -(-ne // eb)
    pad = s * eb - ne
    valid = np.ones((s * eb,), np.float32)
    if pad:
        conn = np.concatenate([conn, np.repeat(conn[-1:], pad, 0)], 0)
        valid[ne:] = 0.0
    conn = conn.reshape(s, eb, 3)
    starts = conn.min(axis=(1, 2)).astype(np.int32)
    width = int((conn.max(axis=(1, 2)) - starts).max()) + 1
    wp = -(-width // lane) * lane
    n = int(conn.max()) + 1
    starts = np.minimum(starts, max(n - wp, 0)).astype(np.int32)
    rel = (conn - starts[:, None, None]).astype(np.int32)
    return (jnp.asarray(rel), jnp.asarray(starts), wp,
            jnp.asarray(valid.reshape(s, eb)))


def masked_gather_sq(nodeT, rel, starts, wp, valid):
    """sum(g*g) over all sub-blocks via masked-window reduces.

    nodeT: [F, N] transposed node table (window axis on lanes).
    """
    iota = jnp.arange(wp, dtype=jnp.int32)

    def body(acc, inp):
        r, st, v = inp                           # [EB', 3], (), [EB']
        win = jax.lax.dynamic_slice(
            nodeT, (0, st), (nodeT.shape[0], wp))     # [F, W']
        oh = (r.reshape(-1, 1) == iota[None, :]).astype(nodeT.dtype)
        g = jnp.sum(oh[:, None, :] * win[None, :, :], axis=-1)  # [R, F]
        g = g.reshape(r.shape[0], -1) * v[:, None]
        return acc + jnp.sum(g * g), None

    acc, _ = jax.lax.scan(body, jnp.zeros((), nodeT.dtype),
                          (rel, starts, valid))
    return acc


def build_subblocks_pallas(conn: np.ndarray, n: int, eb: int):
    """Tables for the Pallas masked-window kernel.

    Window = two consecutive WP-row blocks of the node table selected
    by scalar-prefetched block index; rel is relative to the FIRST
    block's origin (span <= WP guarantees rel < 2*WP).
    """
    ne = conn.shape[0]
    assert ne % eb == 0
    s = ne // eb
    c = conn.reshape(s, eb, 3)
    starts = c.min(axis=(1, 2)).astype(np.int32)
    span = int((c.max(axis=(1, 2)) - starts).max()) + 1
    wp = max(128, -(-span // 128) * 128)
    wblk = (starts // wp).astype(np.int32)
    rel = (c - (wblk * wp)[:, None, None]).astype(np.int32)
    assert rel.max() < 2 * wp
    relT = np.ascontiguousarray(np.swapaxes(rel, 1, 2))  # [S, 3, EB']
    npad = (-(-n // wp) + 1) * wp
    return jnp.asarray(relT), jnp.asarray(wblk), wp, npad, s


def pallas_masked_sq(node_pad, relT, wblk, wp, eb, interpret=False):
    """sum(g*g) over the full connectivity via an in-VMEM masked-window
    Pallas kernel: the one-hot never leaves VMEM (the pure-XLA version
    above materializes it in HBM and loses)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    s = relT.shape[0]

    def kernel(wb_ref, rel_ref, w0_ref, w1_ref, out_ref):
        del wb_ref
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

        rel = rel_ref[0]                          # [3, EB']
        acc = jnp.zeros((), jnp.float32)
        gsq = None
        for v in range(3):
            g = [jnp.zeros((1, eb), jnp.float32)] * 4
            for wref, base in ((w0_ref, 0), (w1_ref, wp)):
                win = wref[...]                   # [WP, 4]
                iota = base + jax.lax.broadcasted_iota(
                    jnp.int32, (wp, 1), 0)
                oh = (iota == rel[v:v + 1, :]).astype(jnp.float32)
                for f in range(4):
                    g[f] = g[f] + jnp.sum(
                        oh * win[:, f:f + 1], axis=0, keepdims=True)
            for f in range(4):
                acc = acc + jnp.sum(g[f] * g[f])
        del gsq
        out_ref[0, 0] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, 3, eb), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((wp, 4), lambda i, wb: (wb[i], 0)),
            pl.BlockSpec((wp, 4), lambda i, wb: (wb[i] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, wb: (0, 0),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(wblk, relT, node_pad, node_pad)
    return out[0, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="6k", choices=["6k", "922k"])
    args = ap.parse_args()
    nx, ny = (81, 41) if args.scale == "6k" else (961, 481)
    mesh = reorder_mesh(generate_mesh(nx=nx, ny=ny, holes=()),
                        build_banded=False)
    conn_np = np.asarray(mesh.connectivity)
    conn_flat = jnp.asarray(conn_np.reshape(-1))
    inc = jnp.asarray(mesh.incidence)
    conn = jnp.asarray(conn_np)
    n = mesh.n_nodes
    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    nodeT = jnp.asarray(np.asarray(node).T.copy())
    print(f"scale={args.scale} ne={mesh.n_elements} nnodes={n} "
          f"rows={conn_np.size}", flush=True)

    def report(name, fn, operand, vg=True):
        def step(x):
            v = fn(x)
            return x - 1e-15 * v, v

        dt = slope_time_scan(step, operand)
        line = f"{name:16s} fwd {dt*1e6:8.2f} us"
        if vg:
            def stepg(x):
                v, g = jax.value_and_grad(fn)(x)
                return jax.tree.map(lambda a, b: a - 1e-15 * b, x, g), v

            dtg = slope_time_scan(stepg, operand)
            line += f"   fwd+bwd {dtg*1e6:8.2f} us"
        print(line, flush=True)

    def prod(x):
        g = gather_with_incidence(x, conn, inc)
        return jnp.sum(g * g)

    def plain(x):
        g = x[conn_flat]
        return jnp.sum(g * g)

    ref = float(plain(node))
    report("gather+incid", prod, node)
    report("gather-ad", plain, node)

    for eb in (128, 256, 512, 1024):
        rel, starts, wp, valid = build_subblocks(conn_np, eb)

        def m(x, _rel=rel, _st=starts, _wp=wp, _v=valid):
            return masked_gather_sq(x, _rel, _st, _wp, _v)

        got = float(m(nodeT))
        assert abs(ref - got) < 1e-3 * abs(ref), (ref, got)
        report(f"masked-{eb}/w{wp}", m, nodeT)

    for eb in (64, 128):
        if mesh.n_elements % eb:
            continue
        relT, wblk, wp, npad, s = build_subblocks_pallas(
            conn_np, n, eb)
        node_pad = jnp.zeros((npad, 4), jnp.float32).at[:n].set(node)

        def pm(x, _r=relT, _w=wblk, _wp=wp, _eb=eb):
            return pallas_masked_sq(x, _r, _w, _wp, _eb)

        got = float(pm(node_pad))
        assert abs(ref - got) < 1e-3 * abs(ref), (ref, got)
        report(f"pallas-{eb}/w{wp}", pm, node_pad, vg=False)


if __name__ == "__main__":
    main()
