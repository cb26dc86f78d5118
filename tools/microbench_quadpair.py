"""Microbench: quad pairing for the genuinely-unstructured vg step
(VERDICT r3 #1b, converting the 1.5x forward-leg BOUND of
``tools/microbench_rowpack.py`` into a measured NET number at the full
production value-and-grad shape).

Run: ``python -m tools.microbench_quadpair`` (real chip; ``--cpu``
forces the CPU platform for the equality checks only).

## The experiment

Pair edge-adjacent Delaunay triangles into quads host-side (greedy
maximal matching on the shared-edge graph — matches 99%+ of triangles
on our Delaunay meshes).  A pair gathers FOUR node rows instead of six
and emits FOUR cotangent rows instead of six, and node incidence
degree drops, so ALL THREE row legs of the banded single-pass vg
shrink:

  leg                triangles        quads (+ remainder)
  corner gather      3*Ne             ~2.01*Ne
  cot rows emitted   3*Ne             ~2.01*Ne
  incidence gather   N*maxdeg(7)      N*maxdeg_q(5)

Both arms compute IDENTICAL physics (P1 plane-stress energy, grads wrt
all 4 node channels x/y/u/v as the r-adaptive step needs) and are
equality-checked against each other before timing.  The vg closure has
the exact production shape (``ops/banded_energy.py`` single-pass
backward): corner gather -> element math -> incidence-gather backward,
no scatters; sizes are chosen so every table sits below the 262K-row
gather cliff, which is how the production windows run.

## Measured (v5e, r4) — POSITIVE, a full 2x at matched apparatus

3-hole Delaunay meshes (match rate 99.1-99.4%, fwd rows 3.00 ->
2.01/elem, incidence maxdeg 7 -> 5; every table sub-cliff; grad
equality relmax <=1.4e-5 f32):

  16K elems:  tri 0.321 ms/step   quad 0.184 ms/step  = **1.74x**
  65K elems:  tri 2.280 ms/step   quad 1.139 ms/step  = **2.00x**

The measured 2.0x EXCEEDS the 1.44x the row model predicts
(6.5 -> 4.5 gathered rows/elem): padding-row pressure on the
incidence leg (maxdeg is a max, mean degree ~6 -> ~3.5) shrinks
faster than the row counts, and the pair kernel amortizes its corner
loads over two triangles of VPU math.

Caveat before landing (why this is not yet the production path): the
flat XLA-math tri arm here runs 36.9 ns/elem, but the production
banded single-pass vg (windowed gathers + in-block Pallas kernels,
``ops/banded_energy.py``) already runs 19.7 ns/elem at 922K — the
window/fusion machinery is itself worth ~1.9x over this flat
apparatus.  The two levers attack different costs (rows vs rate), so
they should compose: landing pairing inside the banded machinery
(paired ``conn_rel`` windows, 4-slot cotangent rows, paired
``re_inc_rel``, remainder-triangle leg, ownership intervals, a 4-node
Pallas pair kernel) projects the 922K banded row at ~9-10 ms/step —
the VERDICT r3 #1 bar.  That port is the follow-up; this experiment
establishes the lever is worth it (the r4 rowpack bound said 1.5x on
one leg; end-to-end it is 2.0x).
"""

from __future__ import annotations

import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from hidenn_fem_tpu.mesh.delaunay import generate_mesh_delaunay
from hidenn_fem_tpu.utils.profiling import slope_time_scan

E_MOD, NU = 10e9, 0.3


# ---------------------------------------------------------------- host


def pair_triangles(conn: np.ndarray):
    """Greedy maximal matching of edge-adjacent triangles.

    Returns (pairs [Np, 4] node ids — slots (0,1,2) and (0,1,3) are the
    two triangles, sharing edge (0,1) — and rest [Nr, 3] node ids).
    """
    ne = conn.shape[0]
    edges = np.concatenate(
        [conn[:, [0, 1]], conn[:, [1, 2]], conn[:, [2, 0]]], axis=0)
    opp = np.concatenate([conn[:, 2], conn[:, 0], conn[:, 1]])
    tri = np.tile(np.arange(ne), 3)
    edges = np.sort(edges, axis=1)
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    es, ts, os_ = edges[order], tri[order], opp[order]
    shared = np.where((es[1:] == es[:-1]).all(axis=1))[0]
    matched = np.zeros(ne, bool)
    pairs = []
    for i in shared:
        a, b = ts[i], ts[i + 1]
        if matched[a] or matched[b]:
            continue
        matched[a] = matched[b] = True
        pairs.append((es[i, 0], es[i, 1], os_[i], os_[i + 1]))
    rest = conn[~matched]
    return np.asarray(pairs, np.int32).reshape(-1, 4), rest.astype(np.int32)


# -------------------------------------------------------------- device


def _tri_energy(c):
    """P1 plane-stress energy of one triangle; c: [3, 4] rows (x,y,u,v).

    Orientation-safe (quadratic in 1/det * |det|); grads wrt all four
    channels, matching the r-adaptive production step."""
    x, y = c[:, 0], c[:, 1]
    u, v = c[:, 2], c[:, 3]
    b = jnp.stack([y[1] - y[2], y[2] - y[0], y[0] - y[1]])
    cc = jnp.stack([x[2] - x[1], x[0] - x[2], x[1] - x[0]])
    det = x[0] * b[0] + x[1] * b[1] + x[2] * b[2]  # = 2*A_signed
    exx = jnp.dot(b, u) / det
    eyy = jnp.dot(cc, v) / det
    gxy = (jnp.dot(cc, u) + jnp.dot(b, v)) / det
    k = E_MOD / (1.0 - NU * NU)
    sxx = k * (exx + NU * eyy)
    syy = k * (eyy + NU * exx)
    sxy = k * (1.0 - NU) * 0.5 * gxy
    dens = 0.5 * (sxx * exx + syy * eyy + sxy * gxy)
    return 0.5 * jnp.abs(det) * dens


def _pair_energy(c):
    """c: [4, 4]; triangles (0,1,2) and (0,1,3) share edge (0,1)."""
    return _tri_energy(c[jnp.array([0, 1, 2])]) + \
        _tri_energy(c[jnp.array([0, 1, 3])])


_tri_vg = jax.vmap(jax.value_and_grad(_tri_energy))
_pair_vg = jax.vmap(jax.value_and_grad(_pair_energy))


def make_arm(node0, conn_list, inc, n_rows):
    """Production-shaped single-pass vg closure: corner gather ->
    element math+cot -> incidence-gather backward (no scatters)."""
    kernels = [(_pair_vg, 4), (_tri_vg, 3)] if len(conn_list) == 2 else \
        [(_tri_vg, 3)]

    def vg(j, node, *conns):
        node = node + 1e-30 * j.astype(node.dtype)  # LICM guard
        total = jnp.zeros((), node.dtype)
        cots = []
        for (kern, k), cn in zip(kernels, conns):
            corners = node[cn.reshape(-1)].reshape(-1, k, 4)
            e, cot = kern(corners)
            total = total + jnp.sum(e)
            cots.append(cot.reshape(-1, 4))
        cot = jnp.concatenate(cots, axis=0) if len(cots) > 1 else cots[0]
        cot = jnp.concatenate(
            [cot, jnp.zeros((1, 4), cot.dtype)], axis=0)  # pad row
        g = jnp.sum(cot[inc.reshape(-1)].reshape(inc.shape + (4,)), axis=1)
        return total, g

    return vg, (node0, *[jnp.asarray(c) for c in conn_list])


def _timeit(name, vg, operands, n1=30, n2=330):
    def step(carry, *a):
        s, j = carry
        total, g = vg(j, *a)
        t = total * 1e-30 + jnp.sum(g) * 1e-30
        j2 = lax.bitcast_convert_type(t.astype(jnp.float32), jnp.int32) & 1
        return (s + t, j2), s

    dt = slope_time_scan(step, (jnp.zeros(()), jnp.zeros((), jnp.int32)),
                         n1=n1, n2=n2, args=operands)
    print(f"{name:34s} {dt*1e3:8.3f} ms/step")
    return dt


def run(lc, label):
    mesh = generate_mesh_delaunay(lc=lc)
    conn = np.asarray(mesh.connectivity, np.int64)
    ne, n = conn.shape[0], int(mesh.n_nodes)
    pairs, rest = pair_triangles(conn)
    npair, nrest = pairs.shape[0], rest.shape[0]
    rng = np.random.default_rng(0)
    node = jnp.asarray(np.concatenate(
        [np.asarray(mesh.coords, np.float32),
         0.01 * rng.standard_normal((n, 2)).astype(np.float32)], axis=1))

    inc_a, deg_a = _inc_from_conn([conn], n)
    inc_b, deg_b = _inc_from_conn([pairs, rest], n)
    rows_fwd_b = 4 * npair + 3 * nrest
    print(f"\n{label}: Ne={ne} N={n}  match {2*npair/ne*100:.1f}%  "
          f"fwd rows/elem {3.0:.2f} -> {rows_fwd_b/ne:.2f}  "
          f"maxdeg {deg_a} -> {deg_b}")

    vg_a, ops_a = make_arm(node, [conn.astype(np.int32)],
                           jnp.asarray(inc_a), 3 * ne)
    vg_b, ops_b = make_arm(node, [pairs, rest],
                           jnp.asarray(inc_b), rows_fwd_b)

    ea, ga = jax.jit(vg_a)(jnp.zeros((), jnp.int32), *ops_a)
    eb, gb = jax.jit(vg_b)(jnp.zeros((), jnp.int32), *ops_b)
    de = abs(float(ea) - float(eb)) / max(abs(float(ea)), 1e-30)
    dg = float(jnp.max(jnp.abs(ga - gb)) / (jnp.max(jnp.abs(ga)) + 1e-30))
    print(f"  equality: energy rel {de:.2e}  grad relmax {dg:.2e}")
    assert de < 5e-5 and dg < 5e-4, "arms disagree — experiment invalid"

    dta = _timeit("  tri arm (3 rows/elem)", vg_a, ops_a)
    dtb = _timeit("  quad arm (paired)", vg_b, ops_b)
    print(f"  net quad-pairing speedup: {dta/dtb:.2f}x")
    return dta, dtb


def _inc_from_conn(conn_list, n_nodes):
    """node -> flat cotangent-row incidence across concatenated blocks."""
    flats, off = [], 0
    for cn in conn_list:
        k = cn.shape[1]
        rows = off + np.arange(cn.size, dtype=np.int64)
        flats.append(np.stack([cn.reshape(-1), rows], axis=1))
        off += cn.size
    both = np.concatenate(flats, axis=0)
    nodes, rows = both[:, 0], both[:, 1]
    counts = np.bincount(nodes, minlength=n_nodes)
    maxdeg = int(counts.max())
    starts = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    order = np.argsort(nodes, kind="stable")
    fn, rr = nodes[order], rows[order]
    rank = np.arange(fn.size) - starts[fn]
    inc = np.full((n_nodes, maxdeg), off, np.int64)
    inc[fn, rank] = rr
    return inc.astype(np.int32), maxdeg


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    run(lc=0.0165, label="16K-element mesh")
    run(lc=0.0083, label="65K-element mesh")


if __name__ == "__main__":
    main()
