"""On-chip with/without-pairing A/B on the PRODUCTION banded route.

VERDICT r4 #1c: the quad-paired tables (``mesh/banded.py:
build_paired_assembly``) are default-on for every big unstructured mesh,
but the landed win (18.2 -> 11.69 ms/step at 922K, BENCH_r04) was never
isolated from other round-4 changes.  This harness measures the SAME
mesh / params / energy through both table layouts, equality-checks the
values and gradients first, then slope-times the full value_and_grad
chain — so the delta is the pairing and nothing else.

Also reports the row model's accounting (gather + cotangent + incidence
rows per layout) next to the measured ratio, to explain realized-vs-
projected (the 65K matched-apparatus measurement was 2.0x;
``tools/microbench_quadpair.py``).

Run (real chip): ``python -m tools.microbench_pairab [nx ny]``.

## Measured (r5, 922K, v5e)

Pre split-gather backward: paired 11.69 / triangle 18.21 ms/step
(1.558x, vs the 1.500x row model at this scale).  AFTER the split
per-slot incidence gather landed in the recompute backward
(``ops/assembly.py:incidence_gather_sum``; probe legs D2 vs D3 in
``tools/microbench_pairlegs.py``): paired **8.295** / strips 8.865 /
triangle 14.894 ms/step — pairing now 1.796x, and every banded layout
moved because they share the backward.

At 3.7M elements (``1921 961``): paired **35.03** / strips 36.08 /
triangle 63.61 ms/step (1.816x, row model 1.500x) — 4.22x the 922K
step for exactly 4.0x the elements, so the paired+split route scales
essentially O(N) through the >256K gather-rate regime.
"""
import dataclasses
import sys

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def row_census(ba, n_nodes):
    """Rows the vg chain touches per step for one table layout: the
    recompute path's element-window gather rows (k rows per window
    element, halos included) + incidence gather rows."""
    ew_rows = ba.re_conn_rel.size            # window corner gathers
    inc_rows = ba.re_inc_rel.size            # cotangent incidence gathers
    return ew_rows, inc_rows


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 961
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 481
    mesh = ht.proxy_plate_mesh(nx=nx, ny=ny)
    mesh = dataclasses.replace(mesh, lattice=None)   # banded route only
    assert mesh.banded is not None and mesh.banded_paired is not None
    ne = mesh.n_elements
    print(f"mesh {nx}x{ny}: {ne} elements, {mesh.n_nodes} nodes",
          flush=True)

    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    paired = mesh
    nopair = dataclasses.replace(mesh, banded_paired=None)
    variants = [("paired(k=4)", paired), ("triangle(k=3)", nopair)]

    from hidenn_fem_tpu.mesh.banded import build_striped_assembly
    import time
    t0 = time.time()
    ba6 = build_striped_assembly(np.asarray(mesh.connectivity),
                                 mesh.n_nodes)
    if ba6 is not None:
        print(f"strip tables built in {time.time() - t0:.1f}s "
              f"(k=6, {ba6.re_conn_rel.size} corner + "
              f"{ba6.re_inc_rel.size} incidence entries)", flush=True)
        variants.insert(0, ("strips(k=6)",
                            dataclasses.replace(mesh, banded_paired=ba6)))

    # equality first (never time an unchecked variant)
    vg = jax.jit(jax.value_and_grad(
        lambda p, m: energy.domain_energy(p, m)))
    v2, g2 = vg(params, nopair)
    for tag, m in variants:
        if m is nopair:
            continue
        v1, g1 = vg(params, m)
        assert np.isclose(float(v1), float(v2), rtol=1e-5), (tag, v1, v2)
        for k in g1:
            a, b = np.asarray(g1[k]), np.asarray(g2[k])
            np.testing.assert_allclose(a, b, rtol=5e-4,
                                       atol=1e-5 * np.abs(b).max())
        print(f"equality: {tag} == triangle (value + grads)", flush=True)

    def step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    results = {}
    for tag, m in variants:
        dt = slope_time_scan(step, params, n1=10, n2=110, args=(m,))
        results[tag] = dt
        print(f"{tag:>14}: {dt * 1e3:7.3f} ms/step fwd+bwd", flush=True)

    r = results["triangle(k=3)"] / results["paired(k=4)"]
    ew_p, inc_p = row_census(mesh.banded_paired, mesh.n_nodes)
    ew_t, inc_t = row_census(mesh.banded, mesh.n_nodes)
    rows_p, rows_t = ew_p + inc_p, ew_t + inc_t
    print(f"speedup: {r:.3f}x  (row model: {rows_t}/{rows_p} = "
          f"{rows_t / rows_p:.3f}x; corner rows {ew_t}->{ew_p}, "
          f"incidence rows {inc_t}->{inc_p})", flush=True)
    if "strips(k=6)" in results:
        rs = results["triangle(k=3)"] / results["strips(k=6)"]
        ew_s, inc_s = row_census(ba6, mesh.n_nodes)
        print(f"strips: {rs:.3f}x vs triangle, "
              f"{results['paired(k=4)'] / results['strips(k=6)']:.3f}x "
              f"vs paired (row model {rows_t / (ew_s + inc_s):.3f}x / "
              f"{rows_p / (ew_s + inc_s):.3f}x; corner {ew_s}, "
              f"incidence {inc_s})", flush=True)


if __name__ == "__main__":
    main()
