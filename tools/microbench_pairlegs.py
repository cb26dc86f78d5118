"""Leg decomposition of the quad-paired banded vg step at 922K.

VERDICT r4 #8 context: the paired step measures 11.69 ms at 922K while
its gather-row census (1.88M corner + 1.85M incidence rows) prices at
~9.3 ms at the sub-cliff ~2.5 ns/row rate — this harness locates the
~2.4 ms of non-gather cost and bounds what any further row-reduction
lever (dedup'd corner rows, triangle strips) could actually buy before
we build one.

Legs (each slope-timed as its own scan over the SAME recompute node
blocks; every leg's input rides a carry perturbation so XLA cannot
hoist it — the LICM gotcha in ``tools/microbench_rowpack.py``):

  A  corner gather only            (window slice + 4-row flat gather)
  B  A + Pallas vg kernel          (energy + cotangents, no transpose)
  C  B + _cot_rows transpose       (the in-scan-block XLA transpose)
  D  C + incidence gather          (the full per-block chain)
  F  the production vg step        (custom_vjp route, for reference)
  A2 two-level corner gather       (distinct window rows once, then an
                                    in-block regather from the compact
                                    distinct table — the "dedup" lever
                                    without new kernel layouts)

Run (real chip): ``python -m tools.microbench_pairlegs [nx ny]``.
CPU smoke: ``HDNN_INTERPRET=1 python -m tools.microbench_pairlegs 33 17``.

## Measured (r5, 922K, v5e)

  A corner gather   4.583 ms   (1.88M rows = 2.44 ns/row — AT rate)
  A2 two-level      5.272 ms   (+0.689 vs A: NEGATIVE — the window
                                gather is already in-block/fused, there
                                is no faster second tier to regather
                                from, even though windows carry 3.9x row
                                redundancy)
  B +vg kernel      5.157 ms   (+0.574: VPU)
  C +transpose      5.157 ms   (+0.000: fused for free)
  D +incidence     10.105 ms   (+4.948: 1.85M rows = 2.68 ns/row — AT
                                rate; pairs' incidence has ~zero padding,
                                avg live degree 3.99 of maxdeg 4)
  F production     11.696 ms   (D + custom_vjp/packed-nodes/update
                                plumbing)

The ~1.6 ms of plumbing above leg D splits as (same run, chip):

  D2 rows leave scan  12.141 ms  (+2.04 vs D: emitting the [NBr, F]
                                  grad rows as scan ys costs the
                                  incidence gather its in-block fusion
                                  — the measured "gather fused with its
                                  consumer is 2-3x faster" effect; the
                                  7.4 MB of ys bytes alone price at
                                  ~10 us)
  E custom_vjp vg     12.442 ms  (+0.30 vs D2: custom_vjp wrapper +
                                  grad-buffer placement)
  F production        11.697 ms  (model packing + optimizer update are
                                  FREE — F <= E within run jitter)
  D3 split gathers     9.289 ms  (D2 with the incidence gather SPLIT
                                  into one gather per degree slot,
                                  summed elementwise: XLA fuses the
                                  adds into the gathers, the [NBr, F]
                                  ys materialize at row rate — and the
                                  chain lands AT the 9.31 ms row-floor
                                  estimate, 2.85 ms under D2)

OUTCOME: leg D3 became production (``ops/assembly.py:
incidence_gather_sum``, used by every banded backward / vg and the
unstructured ``gather_with_incidence``): paired 922K step 11.69 ->
**8.295 ms** on chip (``tools/microbench_pairab.py``; triangle route
14.89, strips 8.87 — all layouts share the backward).  The production
step now runs ~1.0 ms BELOW the conservative 2.5 ns/row floor pricing:
the per-slot gathers stream [NBr]-row index vectors instead of the
flat [NBr*4] interleave, which both restores fusion and beats the flat
gather's effective row rate.  Remaining above-gather cost: the vg
kernel (+0.57) and the ~0.3 ms custom_vjp/buf plumbing.  The denser 1.5-rows/triangle
strip layout (``mesh/banded.py:strip_connectivity``) measured NEGATIVE
(14.20 vs 11.68 ms, ``tools/microbench_pairab.py``): its sliding 12-row
kernel slices are sublane-misaligned (Mosaic relayouts) and the
incidence table is maxdeg-PADDED — strips cut live entries 25% but
maxdeg stays 4, so the incidence gather does not shrink at all.
"""
import dataclasses
import os
import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.ops.banded_energy import (_cot_rows, _gather_block_T,
                                              _pallas_vg)
from hidenn_fem_tpu.ops import quadrature as quad
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def _timed(tag, fn, node, args, n1=10, n2=110):
    def step(nd, *a):
        val = fn(nd, *a)
        # thread the result back into the operand: LICM-proof
        return nd + 1e-30 * val, val

    dt = slope_time_scan(step, node, n1=n1, n2=n2, args=args)
    print(f"{tag:>34}: {dt * 1e3:7.3f} ms/step", flush=True)
    return dt


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 961
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 481
    interp = bool(os.environ.get("HDNN_INTERPRET"))
    if interp:
        jax.config.update("jax_platforms", "cpu")
    mesh = ht.proxy_plate_mesh(nx=nx, ny=ny)
    mesh = dataclasses.replace(mesh, lattice=None)
    ba = mesh.banded_paired
    if ba is None:                       # small meshes: force the build
        from hidenn_fem_tpu.mesh.banded import build_paired_assembly
        ba = build_paired_assembly(np.asarray(mesh.connectivity),
                                   mesh.n_nodes, window_limit=700)
        mesh = dataclasses.replace(mesh, banded_paired=ba)
    assert ba is not None and ba.k == 4 and ba.re_own_lo is not None
    E, nu = 10e9, 0.3
    w_sum = quad.triangle_weight_sum(4)

    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    node = model.packed_nodes(params, mesh)
    f = node.shape[-1]
    wn, ew = ba.re_wnode, ba.re_ew
    own = jnp.stack([ba.re_own_lo, ba.re_own_hi], axis=1)

    # ---- census
    conn = np.asarray(ba.re_conn_rel)             # [Br, EW, 4]
    br = conn.shape[0]
    corner_rows = conn.size
    inc_rows = np.asarray(ba.re_inc_rel).size
    print(f"mesh {nx}x{ny}: Br={br} EW={ew} wnode={wn} "
          f"corner_rows={corner_rows} inc_rows={inc_rows} "
          f"row-floor ~{(corner_rows + inc_rows) * 2.5e-9 * 1e3:.2f} ms "
          f"@2.5ns/row", flush=True)

    # two-level tables: distinct window rows per block + second-level
    # indices into the compact distinct table
    dist_list, sec_list = [], []
    for b in range(br):
        u, inv = np.unique(conn[b].reshape(-1), return_inverse=True)
        dist_list.append(u)
        sec_list.append(inv.reshape(conn.shape[1], conn.shape[2]))
    dmax = max(len(u) for u in dist_list)
    dmax += (-dmax) % 8                            # sublane-align
    dist = np.zeros((br, dmax), np.int32)
    for b, u in enumerate(dist_list):
        dist[b, :len(u)] = u
    sec = np.stack(sec_list).astype(np.int32)
    print(f"two-level: distinct rows/block max {dmax} "
          f"({sum(map(len, dist_list))} total vs {corner_rows} flat = "
          f"{corner_rows / sum(map(len, dist_list)):.3f}x fewer 1st-level "
          f"rows)", flush=True)
    dist_j, sec_j = jnp.asarray(dist), jnp.asarray(sec)

    # ---- legs
    def leg_a(nd):
        def body(_, inp):
            rel, ns = inp
            gT = _gather_block_T(nd, rel, ns, wn)
            return None, jnp.sum(gT)
        _, p = lax.scan(body, None, (ba.re_conn_rel, ba.re_nstarts))
        return jnp.sum(p)

    def leg_a2(nd):
        def body(_, inp):
            dst, s2, ns = inp
            win = lax.dynamic_slice(nd, (ns, 0), (wn, f))
            d = win[dst]                           # [Dmax, F] distinct
            g = d[s2.reshape(-1)].reshape(-1, s2.shape[-1] * f)
            pad = (-g.shape[0]) % 2048
            if pad:
                g = jnp.pad(g, ((0, pad), (0, 0)))
            return None, jnp.sum(g.T)
        _, p = lax.scan(body, None, (dist_j, sec_j, ba.re_nstarts))
        return jnp.sum(p)

    def leg_b(nd):
        def body(_, inp):
            rel, ns, ow = inp
            gT = _gather_block_T(nd, rel, ns, wn)
            part, cotT = _pallas_vg(gT, ow[None, :], E, nu, w_sum, interp)
            return None, part + jnp.sum(cotT)
        _, p = lax.scan(body, None,
                        (ba.re_conn_rel, ba.re_nstarts, own))
        return jnp.sum(p)

    def leg_c(nd):
        def body(_, inp):
            rel, ns, ow = inp
            gT = _gather_block_T(nd, rel, ns, wn)
            part, cotT = _pallas_vg(gT, ow[None, :], E, nu, w_sum, interp)
            cot3 = _cot_rows(cotT, ew, f)
            return None, part + jnp.sum(cot3)
        _, p = lax.scan(body, None,
                        (ba.re_conn_rel, ba.re_nstarts, own))
        return jnp.sum(p)

    def leg_d(nd):
        def body(_, inp):
            rel, ns, rel3, ow = inp
            gT = _gather_block_T(nd, rel, ns, wn)
            part, cotT = _pallas_vg(gT, ow[None, :], E, nu, w_sum, interp)
            cot3 = _cot_rows(cotT, ew, f)
            g = cot3[rel3.reshape(-1)].reshape(*rel3.shape, f)
            return None, part + jnp.sum(jnp.sum(g, axis=1))
        _, p = lax.scan(body, None, (ba.re_conn_rel, ba.re_nstarts,
                                     ba.re_inc_rel, own))
        return jnp.sum(p)

    def leg_d2(nd):
        # D + the grad rows LEAVE the scan as ys (production shape),
        # but no custom_vjp wrapper / buf placement: isolates the
        # materialization cost of emitting [NBr, F] per block vs leg D's
        # in-block scalar reduce.
        def body(_, inp):
            rel, ns, rel3, ow = inp
            gT = _gather_block_T(nd, rel, ns, wn)
            part, cotT = _pallas_vg(gT, ow[None, :], E, nu, w_sum, interp)
            cot3 = _cot_rows(cotT, ew, f)
            g = cot3[rel3.reshape(-1)].reshape(*rel3.shape, f)
            return None, (part, jnp.sum(g, axis=1))
        _, (parts, out) = lax.scan(
            body, None, (ba.re_conn_rel, ba.re_nstarts,
                         ba.re_inc_rel, own))
        return jnp.sum(parts) + jnp.sum(out)

    def leg_d3(nd):
        # D2 with the incidence gather SPLIT per degree slot: 4 gathers
        # of [NBr] rows each, summed elementwise — XLA can fuse the adds
        # into the gathers, producing the [NBr, F] ys directly instead
        # of materializing the unfused [NBr*4, F] gather result.
        def body(_, inp):
            rel, ns, rel3, ow = inp
            gT = _gather_block_T(nd, rel, ns, wn)
            part, cotT = _pallas_vg(gT, ow[None, :], E, nu, w_sum, interp)
            cot3 = _cot_rows(cotT, ew, f)
            g = cot3[rel3[:, 0]]
            for k in range(1, rel3.shape[1]):
                g = g + cot3[rel3[:, k]]
            return None, (part, g)
        _, (parts, out) = lax.scan(
            body, None, (ba.re_conn_rel, ba.re_nstarts,
                         ba.re_inc_rel, own))
        return jnp.sum(parts) + jnp.sum(out)

    energy = ht.PlaneStressEnergy(model=model, E=E, nu=nu)

    # equality spot-check: two-level gather reproduces the flat gather
    ga = jax.jit(leg_a)(node)
    ga2 = jax.jit(leg_a2)(node)
    np.testing.assert_allclose(float(ga), float(ga2), rtol=1e-6)
    print("equality: two-level == flat corner gather", flush=True)

    # HDNN_LEGS=D,D2,E,F reruns a subset (comma-separated leg ids)
    sel = os.environ.get("HDNN_LEGS")
    want = set(sel.split(",")) if sel else None

    def _run(leg_id, tag, fn, args=()):
        if want is not None and leg_id not in want:
            return None
        results[tag] = _timed(tag, fn, node, args)
        return results[tag]

    results = {}
    _run("A", "A corner gather", leg_a)
    _run("A2", "A2 two-level gather", leg_a2)
    _run("B", "B +vg kernel", leg_b)
    _run("C", "C +transpose", leg_c)
    _run("D", "D +incidence (full chain)", leg_d)

    # E: value_and_grad through the custom_vjp route on the node table
    # directly — isolates custom_vjp + gradient placement (E - D) from
    # model packing / unpacking / optimizer update (F - E)
    from hidenn_fem_tpu.ops.banded_energy import banded_element_energy

    def leg_e(nd):
        val, g = jax.value_and_grad(
            lambda q: banded_element_energy(q, ba, E, nu, w_sum,
                                            interp))(nd)
        return val + jnp.sum(g)

    _run("D2", "D2 +rows leave scan", leg_d2)
    _run("D3", "D3 split-gather rows out", leg_d3)
    _run("E", "E custom_vjp vg", leg_e)

    def prod_step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    if want is None or "F" in want:
        dt = slope_time_scan(prod_step, params, n1=10, n2=110,
                             args=(mesh,))
        print(f"{'F production vg step':>34}: {dt * 1e3:7.3f} ms/step",
              flush=True)
    if want is None:
        a = results["A corner gather"]
        b = results["B +vg kernel"]
        c = results["C +transpose"]
        d = results["D +incidence (full chain)"]
        print(f"marginals: kernel {1e3 * (b - a):.3f} ms, transpose "
              f"{1e3 * (c - b):.3f} ms, incidence {1e3 * (d - c):.3f} ms; "
              f"two-level vs flat corner: "
              f"{1e3 * (results['A2 two-level gather'] - a):+.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
