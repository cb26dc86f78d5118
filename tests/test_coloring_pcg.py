"""Graph-colored Jacobi preconditioning (mesh/coloring.py +
solve/linear.py:jacobi_*): proper colorings, exact diagonal extraction,
and the PCG convergence contract (big win on scaled/graded systems,
neutral on uniform ones).  No reference counterpart — the reference
never builds or preconditions the linear system."""

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh import coloring, native
from hidenn_fem_tpu.solve.linear import _cg


def test_coloring_proper_and_small():
    mesh = ht.proxy_plate_mesh(nx=21, ny=11)
    conn = np.asarray(mesh.connectivity)
    colors = coloring._greedy_color_numpy(conn, mesh.n_nodes)
    assert coloring.check_coloring(conn, colors)
    assert colors.max() + 1 <= 8  # greedy on a triangulation stays small
    if native.available():
        # numpy uses vectorized Jones-Plassmann (random priorities), the
        # native lib sequential greedy: different proper colorings of the
        # same graph, both small
        nat = native.greedy_color(conn, mesh.n_nodes)
        assert coloring.check_coloring(conn, nat)
        assert nat.max() + 1 <= 8


def test_jacobi_diagonal_exact():
    mesh = ht.proxy_plate_mesh(nx=13, ny=7)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    up = {"u": params["u"]}
    colors = coloring.color_nodes(np.asarray(mesh.connectivity),
                                  mesh.n_nodes)
    diag = ht.jacobi_diagonal(loss, up, (coords0, mesh), colors)

    g = jax.grad(lambda p: loss(p, coords0, mesh))
    g0 = g(up)
    d = np.asarray(diag["u"])
    n = mesh.n_nodes
    for i in range(0, n, 5):
        for k in range(2):
            z = jnp.zeros((n, 2)).at[i, k].set(1.0)
            ref = float((g({"u": up["u"] + z})["u"] - g0["u"])[i, k])
            assert abs(d[i, k] - ref) <= 5e-6 * max(abs(ref), 1e3), (
                i, k, d[i, k], ref)


def test_pcg_beats_cg_on_scaled_system():
    """Exact-diagonal PCG on a badly row/col-scaled SPD system converges
    several times faster than plain CG (measured 60 vs 265)."""
    rng = np.random.RandomState(0)
    n = 64
    A = rng.randn(n, n).astype(np.float32)
    K = A @ A.T + n * np.eye(n, dtype=np.float32)
    s = np.exp(rng.uniform(-2, 2, n)).astype(np.float32)
    K = (K * s[:, None]) * s[None, :]
    f = rng.randn(n).astype(np.float32)
    Kj, fj = jnp.asarray(K), jnp.asarray(f)
    loss = lambda p, Kj, fj: 0.5 * p["x"] @ Kj @ p["x"] - fj @ p["x"]
    x0 = {"x": jnp.zeros(n)}
    _, hc = _cg(loss, 500, 1e-6, x0, (Kj, fj))
    solp, hp = _cg(loss, 500, 1e-6, x0, (Kj, fj),
                   dinv={"x": 1.0 / jnp.diag(Kj)})
    it_cg = int((np.asarray(hc) > 0).sum())
    it_pcg = int((np.asarray(hp) > 0).sum())
    assert it_pcg * 2 < it_cg, (it_pcg, it_cg)
    xe = np.linalg.solve(K, f)
    np.testing.assert_allclose(np.asarray(solp["x"]), xe, rtol=2e-3,
                               atol=1e-5)


def test_pcg_on_graded_plate():
    """On a strongly graded mesh (element sizes varying ~10x — the
    r-adaptivity regime) Jacobi-PCG's residual trajectory beats plain
    CG by well over an order of magnitude at matched iteration counts
    (measured 2.4e-5 vs 2.8e-3 at 100 iters)."""
    mesh = ht.proxy_plate_mesh(nx=41, ny=21)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    c = np.asarray(params["coords"]).copy()
    L, H = 2.0, 1.0
    c[:, 0] = L * (c[:, 0] / L) ** 3 * 0.999 + c[:, 0] * 0.001
    c[:, 1] = H * (c[:, 1] / H) ** 2 * 0.999 + c[:, 1] * 0.001
    graded = jnp.asarray(c)

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    up = {"u": params["u"]}
    _, hc = ht.cg_solve(loss, up, (graded, mesh), max_iters=300,
                        tol=1e-12)
    solp, hp = ht.jacobi_pcg_solve(loss, up, (graded, mesh), mesh=mesh,
                                   max_iters=300, tol=1e-12)
    hc, hp = np.asarray(hc), np.asarray(hp)
    assert hp[99] * 5 < hc[99], (hp[99], hc[99])
    assert hp[299] * 5 < hc[299], (hp[299], hc[299])
    # converged solution is a stationary point of the energy
    g = jax.grad(lambda p: loss(p, graded, mesh))(solp)
    gn = float(jnp.max(jnp.abs(g["u"])))
    g0 = jax.grad(lambda p: loss(p, graded, mesh))(up)
    assert gn <= 1e-3 * float(jnp.max(jnp.abs(g0["u"])))


def test_pcg_respects_dirichlet():
    mesh = ht.proxy_plate_mesh(nx=21, ny=11)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(1), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    sol, _ = ht.jacobi_pcg_solve(loss, {"u": params["u"]},
                                 (coords0, mesh), mesh=mesh,
                                 max_iters=200)
    moved = np.asarray(sol["u"] - params["u"])
    assert np.all(moved[np.asarray(mesh.dirichlet_mask)] == 0.0)
