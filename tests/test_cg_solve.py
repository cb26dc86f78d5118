"""Matrix-free CG solve (solve/linear.py): exactness on a random SPD
quadratic, and the fixed-mesh plate displacement solve (the classic FEM
linear system) against the L-BFGS plateau."""

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht

# multi-minute solver suite (600-iteration plate solves) -> excluded from the quick lane
import pytest  # noqa: E402
pytestmark = pytest.mark.slow


def test_cg_exact_on_spd_quadratic():
    rng = np.random.RandomState(0)
    n = 24
    A = rng.randn(n, n).astype(np.float32)
    K = A @ A.T + n * np.eye(n, dtype=np.float32)    # SPD
    f = rng.randn(n).astype(np.float32)
    x_exact = np.linalg.solve(K, f)

    Kj, fj = jnp.asarray(K), jnp.asarray(f)
    loss = lambda p, Kj, fj: (0.5 * p["x"] @ Kj @ p["x"] - fj @ p["x"])
    x0 = {"x": jnp.zeros(n)}
    sol, hist = ht.cg_solve(loss, x0, loss_args=(Kj, fj),
                            max_iters=2 * n, tol=1e-7)
    np.testing.assert_allclose(np.asarray(sol["x"]), x_exact,
                               rtol=2e-4, atol=1e-5)
    # residual history is monotone-ish and frozen after convergence
    h = np.asarray(hist)
    assert h[-1] <= 1e-6


def test_cg_solves_plate_displacement():
    """With node coordinates frozen the plate energy is quadratic in u;
    CG must reach the same energy as a converged L-BFGS solve."""
    mesh = ht.proxy_plate_mesh(nx=41, ny=21)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    sol, hist = ht.cg_solve(loss, {"u": params["u"]},
                            loss_args=(coords0, mesh),
                            max_iters=400, tol=1e-6)
    e_cg = float(loss(sol, coords0, mesh))

    pf, losses = ht.run_lbfgs(loss, {"u": params["u"]}, num_steps=500,
                              loss_args=(coords0, mesh))
    e_lbfgs = float(np.asarray(losses)[-1])
    assert e_cg <= e_lbfgs + 1e-3 * abs(e_lbfgs), (e_cg, e_lbfgs)

    # the solution is a stationary point: gradient norm tiny vs traction
    g = jax.grad(loss)(sol, coords0, mesh)
    gn = float(jnp.linalg.norm(g["u"]))
    r0 = float(np.asarray(hist)[0])
    assert gn <= 1e-4 * max(1.0, r0 * 1e5) or float(
        np.asarray(hist)[-1]) < 1e-5


def test_cg_respects_dirichlet():
    """Fixed DOFs have zero gradient, so CG never moves them."""
    mesh = ht.proxy_plate_mesh(nx=21, ny=11)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(1), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    sol, _ = ht.cg_solve(loss, {"u": params["u"]},
                         loss_args=(coords0, mesh), max_iters=200)
    moved = np.asarray(sol["u"] - params["u"])
    fixed = np.asarray(mesh.dirichlet_mask)
    assert np.all(moved[fixed] == 0.0)


def test_radapt_cg_improves_on_fixed_mesh():
    """Alternating exact-CG / coordinate-Adam epochs must lower the
    energy below the fixed-mesh displacement solve (r-adaptivity gain),
    with monotone non-increasing equilibrated energies."""
    mesh = ht.proxy_plate_mesh(nx=21, ny=11)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def loss(p, m):
        return energy(p, m)

    pf, energies = ht.radapt_cg_solve(loss, params, loss_args=(mesh,),
                                      outer_epochs=4, cg_iters=300,
                                      coord_steps=10, coord_lr=1e-4)
    e = np.asarray(energies)
    assert np.all(np.isfinite(e))
    # each epoch's equilibrated energy is no worse than the previous
    assert np.all(e[1:] <= e[:-1] + 1e-6 * np.abs(e[:-1]))
    # and the mesh actually moved
    assert float(jnp.max(jnp.abs(pf["coords"] - params["coords"]))) > 0


def test_minimize_cg_facade():
    """minimize(..., method='cg') routes to cg_solve."""
    mesh = ht.proxy_plate_mesh(nx=21, ny=11)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    sol, hist = ht.minimize(loss, {"u": params["u"]}, method="cg",
                            num_steps=200, loss_args=(coords0, mesh))
    h = np.asarray(hist)
    assert h[h > 0][-1] < 1e-3


def test_example8_small():
    from examples import example8_linear_solve
    pf, energies = example8_linear_solve.main(nx=21, ny=11, max_iters=200,
                                              radapt_epochs=2)
    assert np.all(np.isfinite(energies))
