"""Headline benchmark: quadrature-point evals/sec (forward+backward).

Measures the production energy hot path — value_and_grad of the 2D plate
total-potential energy — on the exact BASELINE.md workload: the 81x41
proxy plate (6,400 P1 elements, order-4 triangle quadrature = 25,600
quadrature points per energy evaluation).  The reference baseline is
8.36e5 qp/s fwd+bwd (PyTorch, 1x CPU, BASELINE.md row 3; hot path
``/root/reference/src/loss.py:55-88`` + ``src/models.py:316-357``).

The default (fused) assembly computes energies/gradients numerically
equal to evaluating the model at every quadrature point (P1 strain is
constant per element, so the quadrature loop collapses to the weight sum
— verified against the general per-qp path in
tests/test_triangle_p1.py::test_fused_vs_quadrature_assembly).

Timing is per-step *slope timing* inside scan-compiled optimize loops
(two scan lengths; the difference cancels dispatch/transfer fixed costs,
which are large on tunneled devices) — the same shape as the production
drivers in ``hidenn_fem_tpu/solve/drivers.py``, which run whole solves as
one on-device program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with an
"extra" dict carrying the large-scale rows (922K-element banded fwd+bwd
ms/step and the gather-free structured path µs/step) so regressions at
scale are visible round-over-round, not just the 6.4K headline.
"""

import json

import jax

BASELINE_QP_PER_S = 8.36e5  # measured reference, BASELINE.md row 3

# TPU v5e single-chip peaks for the roofline rows (public spec)
HBM_PEAK_GBPS = 819.0
MXU_PEAK_BF16_TFLOPS = 197.0

# Analytic FLOPs per P1 element, fwd+bwd: ~45 forward (corner diffs,
# det, inverse, 3 strains, energy density, weighting) and ~2x that for
# the backward — a counting-model constant, not a measurement.
FLOPS_PER_ELEMENT_FWD_BWD = 135.0


def _roofline(dt_s: float, bytes_lb: float, flops: float) -> dict:
    """Roofline honesty row: achieved bandwidth/compute vs v5e peaks.

    ``bytes_lb`` is a LOWER-BOUND traffic model (params + index tables
    read once, gradients written once — real traffic adds halo/recompute
    overlap and XLA intermediates), so pct_hbm_peak is a lower bound on
    how bandwidth-bound the step is.  The element math runs on the VPU
    (scalar-wise, no matmuls), so the MXU bf16 peak is reported only to
    show the workload is nowhere near compute-bound: HBM is the binding
    roof."""
    return {
        "model_bytes_per_step": int(bytes_lb),
        "achieved_GB_per_s_lb": float(f"{bytes_lb / dt_s / 1e9:.4g}"),
        "pct_hbm_peak_lb": float(
            f"{bytes_lb / dt_s / 1e9 / HBM_PEAK_GBPS * 100:.3g}"),
        "model_flops_per_step": int(flops),
        "achieved_TFLOPs": float(f"{flops / dt_s / 1e12:.4g}"),
        "pct_mxu_bf16_peak": float(
            f"{flops / dt_s / 1e12 / MXU_PEAK_BF16_TFLOPS * 100:.3g}"),
    }


def bench_6k(ht, slope_time_scan, lattice=True):
    """Headline workload.  With ``lattice=True`` (the production
    default) the energy routes through the gather-free lattice path
    (mesh/lattice.py: the 81x41 proxy plate IS a lattice
    triangulation); ``lattice=False`` forces the unstructured
    gather-based assembly for the record."""
    import dataclasses
    mesh = ht.proxy_plate_mesh(nx=81, ny=41)       # 6,400 elements
    if not lattice:
        mesh = dataclasses.replace(mesh, lattice=None)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  gauss_order=4)
    n_qp = mesh.n_elements * 4                     # 25,600

    def step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    # At ~4-6 us/step the old (50, 550) pair left only ~2-3 ms of device
    # signal against the axon tunnel's multi-ms RTT jitter and the slope
    # occasionally came out NEGATIVE (seen r4: -9e9 qp/s headline).  Use
    # scan lengths that put >=40 ms of signal in the difference, and
    # retry on a non-positive slope.
    for n2 in (10_500, 21_000, 42_000):
        dt = slope_time_scan(step, params, n1=500, n2=n2, args=(mesh,))
        if dt > 0:
            return n_qp / dt
    raise RuntimeError(f"non-positive slope {dt} for the headline row")


def bench_delaunay_6k(ht, slope_time_scan):
    """Genuinely irregular mesh row: a native-Delaunay plate with the
    example-4 three holes at ~6.1K elements (mesh/delaunay.py; lattice
    detection rejects it, so this is the exact path a real gmsh user
    hits — gather-based assembly end to end).  Measured r3: 107.9
    µs/step fwd+bwd, confirming the lattice-disabled proxy row above on
    real geometry."""
    mesh = ht.generate_mesh_delaunay(
        holes=((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1)),
        lc=0.0262)
    assert mesh.lattice is None
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    return slope_time_scan(step, params, n1=50, n2=550, args=(mesh,))


def bench_922k_banded(ht, slope_time_scan):
    import dataclasses
    mesh = ht.proxy_plate_mesh(nx=961, ny=481)     # 921,600 elements
    # this row measures the BANDED unstructured path; the lattice route
    # would silently bypass it (its own row is bench_922k_lattice_holes)
    mesh = dataclasses.replace(mesh, lattice=None)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    dt = slope_time_scan(step, params, n1=10, n2=110, args=(mesh,))
    # traffic lower bound: packed nodes read once, banded index tables
    # read once, both gradient arrays written once (f32/int32 = 4 B)
    ba = mesh.banded
    n_nodes = mesh.n_nodes
    idx_bytes = 4 * sum(
        t.size for t in (ba.re_conn_rel, ba.re_inc_rel)
        if t is not None) if ba.re_conn_rel is not None else \
        4 * (ba.conn_rel.size + ba.inc_rel.size)
    bytes_lb = 4 * (n_nodes * 4            # packed (cx, cy, ux, uy) read
                    + 2 * n_nodes * 4)     # coords+u grads written
    bytes_lb += idx_bytes
    flops = FLOPS_PER_ELEMENT_FWD_BWD * mesh.n_elements
    return dt, _roofline(dt, bytes_lb, flops)


def bench_922k_structured(ht, slope_time_scan):
    from hidenn_fem_tpu.models.structured_grid import (
        StructuredGridP1, generate_structured_grid)
    grid = generate_structured_grid(length=2.0, height=1.0, holes=(),
                                    nx=961, ny=481)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)

    def step(p, g):
        val, grads = jax.value_and_grad(lambda q: model(q, g))(p)
        p = jax.tree.map(lambda x, gr: x - 1e-15 * gr, p, grads)
        return p, val

    dt = slope_time_scan(step, params, n1=50, n2=550, args=(grid,))
    # traffic lower bound: coords+u read, both grads written, quad mask
    # read (gather-free path: no index tables at all)
    nn = grid.nx * grid.ny
    bytes_lb = 4 * (2 * nn * 2 + 2 * nn * 2
                    + (grid.nx - 1) * (grid.ny - 1))
    flops = FLOPS_PER_ELEMENT_FWD_BWD * 2 * (grid.nx - 1) * (grid.ny - 1)
    return dt, _roofline(dt, bytes_lb, flops)


def bench_922k_lattice_holes(ht, slope_time_scan,
                             keep_dead_nodes=False):
    """The reference's real workload shape at scale: 961x481 lattice
    with the example-4 three holes.  Default (renumbered nodes, the
    reference contract): the route runs the one-N-row permutation fill
    — measured r3: 4.94 ms/step vs 17.9 banded.  With
    ``keep_dead_nodes=True`` the numbering stays the identity lattice
    and the route does zero gathers (~0.1 ms class)."""
    from hidenn_fem_tpu.mesh.structured import generate_mesh
    mesh = generate_mesh(nx=961, ny=481,
                         holes=((0.5, 0.7, 0.12), (1.0, 0.3, 0.15),
                                (1.4, 0.6, 0.1)),
                         keep_dead_nodes=keep_dead_nodes)
    assert mesh.lattice is not None
    assert mesh.lattice.identity == keep_dead_nodes
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    if keep_dead_nodes:
        return slope_time_scan(step, params, n1=50, n2=550, args=(mesh,))
    return slope_time_scan(step, params, n1=10, n2=110, args=(mesh,))


def bench_hybrid_922k(ht, slope_time_scan):
    """Production hole geometry (exact circular rims, the reference's
    example-4 domain class, `/root/reference/examples/example4.py:14-26`)
    at lattice speed: generate_mesh_hybrid lays a lattice everywhere the
    plate is rectangular and ties each rim in with a small Delaunay
    collar (mesh/hybrid.py), so the energy evaluates from node-table
    prefix SLICES plus a compact-space collar term
    (ops/lattice_energy.collar_energy).  Measured r3: ~0.39 ms/step at
    847K elements vs 51.6 ms for the identical mesh forced down the
    generic banded path (tools/microbench_hybrid.py)."""
    mesh = ht.generate_mesh_hybrid(
        holes=((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1)),
        lc=0.00209)                                # ~847K elements
    assert mesh.hybrid is not None
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    dt = slope_time_scan(step, params, n1=20, n2=220, args=(mesh,))
    return dt, (mesh, model, params, energy)


def bench_hybrid_aux_solve(ht, built):
    """Warm wall-clock of the production displacement solve on the 847K
    exact-rim hybrid mesh: auxiliary-space PCG whose every matvec rides
    the hybrid slice+collar route.  Measured r3: 20 iterations, ~0.5 s
    warm (vs 0.93 s on the same-size Delaunay mesh whose matvecs are
    gather-bound).  tol sits ABOVE the f32 residual floor (~1e-6 rel,
    CLAUDE.md): below it the iteration count measures floor wandering,
    not convergence (A/B'd r3: two grad orderings identical to 3e-6,
    then 22 vs 30 'iterations' chasing 1e-6)."""
    import time
    mesh, model, params, energy = built
    coords0 = params["coords"]
    tol = 3e-6

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    up = {"u": params["u"]}
    pre = ht.build_aux_preconditioner(loss, up, (coords0, mesh), mesh)
    sol, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                 max_iters=100, tol=tol)
    import numpy as np
    np.asarray(hist)                               # warm-up + sync
    t0 = time.time()
    sol, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                 max_iters=100, tol=tol)
    h = np.asarray(hist)
    dt = time.time() - t0
    nz = h[h > 0]
    assert nz[-1] < tol, f"aux-PCG stalled at {nz[-1]:.2e}"
    return dt, len(nz)


def bench_plate_solve(ht):
    """Warm wall-clock of the reference's flagship workload: 600 L-BFGS
    iterations on the 6,400-element plate (30 epochs x max_iter=20,
    ``/root/reference/examples/example4.py:68-80``; measured reference:
    13.8 s on CPU, BASELINE.md row 4).  Whole solve is one on-device
    program; the host timing includes only the scalar fetch."""
    import time

    mesh = ht.proxy_plate_mesh(nx=81, ny=41)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def run():
        _, losses = ht.run_lbfgs(energy.total, params, num_steps=600,
                                 loss_args=(mesh,))
        return float(losses[-1])

    run()                                   # compile + first run
    # Jitter protocol (VERDICT r4 #7): the whole solve is one on-device
    # program, but the host-side wall clock rides the axon tunnel whose
    # RTT wanders by +-10% run to run (the unexplained r4 0.0697->0.0767
    # "regression" was exactly this).  Report best-of-3 as the number —
    # the repeatable device cost — and the spread so a real regression
    # is distinguishable from tunnel noise.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times), max(times) - min(times)


def bench_mg_solve(ht):
    """Warm multigrid-PCG displacement solve at 231K elements (481x241
    structured lattice) — the round-2 solver flagship's regression
    canary (the 922K/3.7M numbers live in PARITY.md; this size keeps
    the bench's compile bill bounded)."""
    import time

    from hidenn_fem_tpu.models.structured_grid import (
        StructuredGridP1, generate_structured_grid)

    grid = generate_structured_grid(length=2.0, height=1.0, holes=(),
                                    nx=481, ny=241)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    levels = ht.build_hierarchy(model, grid, model.coords(params, grid))

    def run():
        _, hist = ht.mg_pcg_solve(model, grid, params, max_iters=40,
                                  tol=1e-6, levels=levels)
        import numpy as np
        h = np.asarray(hist)
        assert h[h > 0][-1] <= 1e-6
    run()
    times = []
    for _ in range(3):                     # same protocol as plate solve
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times), max(times) - min(times)


def _guard_device_init(timeout_s: int = 900):
    """Fail loudly instead of hanging forever when the tunneled TPU
    pool is unavailable (observed: ``jax.devices()`` blocks
    indefinitely during a pool outage).  A daemon watchdog THREAD
    bounds the first touch (SIGALRM cannot: the blocking PJRT call
    releases the GIL but no Python bytecode runs on the main thread
    to deliver the signal); on timeout it emits a valid one-line JSON
    with the error marker so the driver records the outage instead of
    stalling, then hard-exits."""
    import os
    import threading
    import time

    done = threading.Event()

    def _watchdog():
        if done.wait(timeout_s):
            return
        print(json.dumps({
            "metric": "quadrature_point_evals_per_sec_fwd_bwd",
            "value": 0.0, "unit": "qp/s", "vs_baseline": 0.0,
            "extra": {"error": f"device init exceeded {timeout_s}s "
                               "(TPU tunnel/pool unavailable)"},
        }), flush=True)
        os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    jax.devices()
    done.set()


def main():
    import hidenn_fem_tpu as ht
    from hidenn_fem_tpu.utils.profiling import slope_time_scan

    _guard_device_init()
    qp_per_s = bench_6k(ht, slope_time_scan)
    extra = {}
    try:
        qp_unstr = bench_6k(ht, slope_time_scan, lattice=False)
        extra["unstructured_6k_qp_per_s"] = float(f"{qp_unstr:.4g}")
        extra["unstructured_6k_vs_baseline"] = float(
            f"{qp_unstr / BASELINE_QP_PER_S:.4g}")
    except Exception as e:
        extra["unstructured_6k_error"] = repr(e)[:200]
    try:
        dt_del = bench_delaunay_6k(ht, slope_time_scan)
        extra["delaunay_6k_us_per_step_fwd_bwd"] = float(
            f"{dt_del * 1e6:.4g}")
    except Exception as e:
        extra["delaunay_6k_error"] = repr(e)[:200]
    try:
        # Production flavor: internal consumers (example 4, aux setup,
        # README guidance) generate hole meshes with keep_dead_nodes=True
        # (identity lattice numbering, zero-gather route) — this row is
        # what a user of the framework actually pays per step.
        # (key renamed from lattice_922k_holes_ms_per_step_fwd_bwd in r5:
        # that key measured the perm flavor through r3 and this flavor in
        # r4 — two different routes must not share a historical key)
        dt_lh = bench_922k_lattice_holes(ht, slope_time_scan,
                                         keep_dead_nodes=True)
        extra["lattice_922k_holes_dead_ms_per_step_fwd_bwd"] = float(
            f"{dt_lh * 1e3:.4g}")
    except Exception as e:
        extra["lattice_922k_holes_error"] = repr(e)[:200]
    try:
        # Reference-contract flavor (nodes renumbered after hole
        # deletion, src/mesh.py:192-216): pays the one-N-row permutation
        # fill each direction — kept measured so the gap stays visible.
        dt_perm = bench_922k_lattice_holes(ht, slope_time_scan)
        extra["lattice_922k_holes_perm_ms_per_step_fwd_bwd"] = float(
            f"{dt_perm * 1e3:.4g}")
    except Exception as e:
        extra["lattice_922k_holes_perm_error"] = repr(e)[:200]
    try:
        dt_hy, built = bench_hybrid_922k(ht, slope_time_scan)
        extra["hybrid_922k_us_per_step_fwd_bwd"] = float(
            f"{dt_hy * 1e6:.4g}")
        try:
            dt_ax, iters = bench_hybrid_aux_solve(ht, built)
            extra["hybrid_847k_aux_pcg_warm_s"] = float(f"{dt_ax:.4g}")
            extra["hybrid_847k_aux_pcg_iters"] = int(iters)
        except Exception as e:
            extra["hybrid_847k_aux_pcg_error"] = repr(e)[:200]
        del built
    except Exception as e:
        extra["hybrid_922k_error"] = repr(e)[:200]
    try:
        best, spread = bench_plate_solve(ht)
        extra["plate_lbfgs600_warm_s"] = float(f"{best:.4g}")
        extra["plate_lbfgs600_warm_s_spread"] = float(f"{spread:.4g}")
    except Exception as e:
        extra["plate_lbfgs600_error"] = repr(e)[:200]
    try:
        dt_banded, roof_b = bench_922k_banded(ht, slope_time_scan)
        extra["banded_922k_ms_per_step_fwd_bwd"] = float(
            f"{dt_banded * 1e3:.4g}")
        extra["roofline_banded_922k"] = roof_b
    except Exception as e:        # keep the headline alive regardless
        extra["banded_922k_error"] = repr(e)[:200]
    try:
        dt_sg, roof_s = bench_922k_structured(ht, slope_time_scan)
        extra["structured_922k_us_per_step_fwd_bwd"] = float(
            f"{dt_sg * 1e6:.4g}")
        extra["roofline_structured_922k"] = roof_s
    except Exception as e:
        extra["structured_922k_error"] = repr(e)[:200]
    try:
        best, spread = bench_mg_solve(ht)
        extra["mg_481x241_solve_warm_s"] = float(f"{best:.4g}")
        extra["mg_481x241_solve_warm_s_spread"] = float(f"{spread:.4g}")
    except Exception as e:
        extra["mg_481x241_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": "quadrature_point_evals_per_sec_fwd_bwd",
        "value": float(f"{qp_per_s:.4g}"),
        "unit": "qp/s",
        "vs_baseline": float(f"{qp_per_s / BASELINE_QP_PER_S:.4g}"),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
