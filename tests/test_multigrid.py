"""Geometric multigrid PCG (solve/multigrid.py): agreement with plain
CG, mesh-size-independent iteration counts, Dirichlet/hole handling,
and split-variant coverage.  The reference has no linear-solver
counterpart (it only runs generic optimizers,
``/root/reference/examples/example4.py:68-80``); these tests anchor the
MG solve against our own exact CG instead."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.models.structured_grid import (
    StructuredGridP1, generate_structured_grid)
from hidenn_fem_tpu.solve.multigrid import (
    build_hierarchy, coarsen_grid, mg_pcg_solve, prolong, radapt_mg_solve,
    _restrict)

# multi-minute solver suite (compiles big MG programs) -> excluded from the quick lane
pytestmark = pytest.mark.slow


def _setup(nx=33, ny=17, **kw):
    grid = generate_structured_grid(length=2.0, height=1.0, nx=nx, ny=ny,
                                    **kw)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    return grid, model, params


def _cg_reference(model, grid, params, iters=3000, tol=1e-7):
    def loss(p, coords, g):
        return model({"coords": coords, "u": p["u"]}, g)
    sol, hist = ht.cg_solve(loss, {"u": params["u"]},
                            loss_args=(params["coords"], grid),
                            max_iters=iters, tol=tol)
    return sol["u"], hist


def test_transfer_pair_adjoint():
    """restrict == prolong^T exactly (they share one linear op)."""
    rng = np.random.RandomState(0)
    cu = jnp.asarray(rng.randn(7, 5, 2).astype(np.float32))
    fr = jnp.asarray(rng.randn(13, 9, 2).astype(np.float32))
    lhs = float(jnp.vdot(prolong(cu), fr))
    rhs = float(jnp.vdot(cu, _restrict(fr)))
    assert abs(lhs - rhs) <= 1e-4 * max(1.0, abs(lhs))


def test_coarsen_grid_masks():
    grid, _, _ = _setup(nx=17, ny=9, holes=((1.0, 0.5, 0.12),))
    gc = coarsen_grid(grid)
    assert (gc.nx, gc.ny) == (9, 5)
    # volume-fraction coarsening: coarse quad weight = mean of its four
    # fine quads (rim quads fractionally stiff, hole interiors dead)
    qm = np.asarray(grid.quad_mask).reshape(8, 2, 4, 2)
    np.testing.assert_allclose(np.asarray(gc.quad_mask),
                               qm.mean(axis=(1, 3)))
    # Dirichlet/geom masks are subsampled
    np.testing.assert_array_equal(np.asarray(gc.dirichlet_mask),
                                  np.asarray(grid.dirichlet_mask)[::2, ::2])
    # stops when the lattice bottoms out: 9x5 -> 5x3 -> 3x2 -> None
    assert coarsen_grid(coarsen_grid(coarsen_grid(gc))) is None


@pytest.mark.parametrize("split", ["up", "zigzag"])
def test_mg_matches_cg(split):
    grid, model, params = _setup(split=split)
    u_cg, _ = _cg_reference(model, grid, params)
    sol, hist = mg_pcg_solve(model, grid, params, max_iters=40, tol=1e-7)
    scale = float(jnp.max(jnp.abs(u_cg)))
    assert float(jnp.max(jnp.abs(sol["u"] - u_cg))) <= 1e-4 * scale
    h = np.asarray(hist)
    assert h[h > 0][-1] <= 1e-6


def test_mg_iteration_count_mesh_independent():
    """The whole point: iterations must NOT grow with resolution (plain
    CG grows like O(nx): 740 iters at 97x49 in this same setup)."""
    counts = []
    for nx, ny in ((17, 9), (33, 17)):
        grid, model, params = _setup(nx=nx, ny=ny)
        _, hist = mg_pcg_solve(model, grid, params, max_iters=40,
                               tol=1e-6)
        h = np.asarray(hist)
        counts.append(int((h > 0).sum()))
    assert counts[1] <= counts[0] + 3, counts
    assert max(counts) <= 25, counts


def test_mg_respects_dirichlet_and_holes():
    grid, model, params = _setup(nx=33, ny=17,
                                 holes=((1.0, 0.5, 0.15),))
    sol, hist = mg_pcg_solve(model, grid, params, max_iters=40, tol=1e-6)
    moved = np.asarray(sol["u"] - params["u"])
    fixed = np.asarray(grid.dirichlet_mask)
    assert np.all(moved[fixed] == 0.0)
    assert np.all(np.isfinite(np.asarray(sol["u"])))
    u_cg, _ = _cg_reference(model, grid, params)
    scale = float(jnp.max(jnp.abs(u_cg)))
    assert float(jnp.max(jnp.abs(sol["u"] - u_cg))) <= 1e-4 * scale


def test_mg_radapted_coords():
    """The hierarchy samples the ACTUAL (r-adapted) coordinates, so a
    perturbed interior mesh still converges and matches CG."""
    grid, model, params = _setup(nx=33, ny=17)
    interior = ~np.asarray(grid.geom_boundary_mask)
    rng = np.random.RandomState(3)
    bump = 0.2 * (2.0 / 32) * rng.randn(33, 17, 2).astype(np.float32)
    coords = np.asarray(params["coords"]).copy()
    coords[interior] += bump[interior]
    params = {"coords": jnp.asarray(coords), "u": params["u"]}
    sol, hist = mg_pcg_solve(model, grid, params, max_iters=40, tol=1e-6)
    h = np.asarray(hist)
    assert h[h > 0][-1] <= 1e-5
    u_cg, _ = _cg_reference(model, grid, params)
    scale = float(jnp.max(jnp.abs(u_cg)))
    assert float(jnp.max(jnp.abs(sol["u"] - u_cg))) <= 2e-4 * scale


def test_hierarchy_reuse():
    """A prebuilt hierarchy amortizes over repeated solves (the
    r-adaptive outer-loop pattern)."""
    grid, model, params = _setup(nx=33, ny=17)
    levels = build_hierarchy(model, grid, model.coords(params, grid))
    sol1, h1 = mg_pcg_solve(model, grid, params, levels=levels,
                            max_iters=40, tol=1e-6)
    # restarting from the solution must stay at the solution (the stop
    # is relative to the restart residual, so it may still iterate on
    # noise — but the iterates cannot leave the converged point)
    sol2, h2 = mg_pcg_solve(model, grid, sol1, levels=levels,
                            max_iters=40, tol=1e-6)
    scale = float(jnp.max(jnp.abs(sol1["u"])))
    # float32 noise polishing only: measured ~4e-5 relative
    assert float(jnp.max(jnp.abs(sol2["u"] - sol1["u"]))) <= 3e-4 * scale


def test_mg_float64_deep_convergence():
    """The solver stack is dtype-generic: under x64 the MG-PCG solve
    converges far below the float32 residual floor (~1e-6 rel)."""
    jax.config.update("jax_enable_x64", True)
    try:
        grid = generate_structured_grid(length=2.0, height=1.0, nx=17,
                                        ny=9)
        model = StructuredGridP1(E=10e9, nu=0.3, dtype=jnp.float64)
        params = model.init(jax.random.PRNGKey(0), grid)
        sol, hist = mg_pcg_solve(model, grid, params, max_iters=60,
                                 tol=1e-10)
        h = np.asarray(hist)
        assert sol["u"].dtype == jnp.float64
        assert h[h > 0][-1] <= 1e-10
    finally:
        jax.config.update("jax_enable_x64", False)


def test_example9_small():
    from examples import example9_multigrid
    sol, hist = example9_multigrid.main(nx=33, ny=17)
    h = np.asarray(hist)
    assert h[h > 0][-1] <= 1e-6


def test_radapt_mg_improves_energy():
    """Alternating exact MG solves with coordinate steps must lower the
    equilibrated energy monotonically and actually move the mesh."""
    grid, model, params = _setup(nx=17, ny=9)
    pf, energies = radapt_mg_solve(model, grid, params, outer_epochs=3,
                                   mg_iters=30, coord_steps=10,
                                   coord_lr=1e-4)
    e = np.asarray(energies)
    assert np.all(np.isfinite(e))
    assert np.all(e[1:] <= e[:-1] + 1e-6 * np.abs(e[:-1]))
    assert float(jnp.max(jnp.abs(pf["coords"] - params["coords"]))) > 0
