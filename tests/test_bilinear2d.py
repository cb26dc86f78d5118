"""Bilinear2D structured model tests: bilinear exactness, boundary
pinning, r-adaptivity monotonicity, derivative correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from hidenn_fem_tpu.models.bilinear2d import Bilinear2D


def _grids(nx=9, ny=7):
    return np.linspace(0, 1, nx), np.linspace(0, 2, ny)


def test_grid_init_exact():
    gx, gy = _grids()
    model, params = Bilinear2D.create(gx, gy, r_adapt=True)
    ggx, ggy = model.grid(params)
    np.testing.assert_allclose(np.asarray(ggx), gx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ggy), gy, atol=1e-6)


def test_bilinear_exactness():
    """The bilinear space reproduces a + bx + cy + dxy exactly."""
    gx, gy = _grids()
    model, params = Bilinear2D.create(gx, gy)
    f = lambda x, y: 1.0 + 2.0 * x - 0.5 * y + 3.0 * x * y
    XX, YY = np.meshgrid(gx, gy, indexing="ij")
    params["u"] = jnp.asarray(f(XX, YY), jnp.float32)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(0, 1, 300), rng.uniform(0, 2, 300)], axis=1)
    got = np.asarray(model.apply(params, jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(got, f(pts[:, 0], pts[:, 1]), rtol=1e-5,
                               atol=1e-5)


def test_u_fixed_on_boundary():
    gx, gy = _grids()
    model, params = Bilinear2D.create(gx, gy, u_fixed=0.0)
    u = np.asarray(model.u_full(params))
    assert np.all(u[0, :] == 0) and np.all(u[-1, :] == 0)
    assert np.all(u[:, 0] == 0) and np.all(u[:, -1] == 0)
    # interior stays the randn parameter
    assert np.any(u[1:-1, 1:-1] != 0)


def test_boundary_coords_pinned_under_adaptation(rng):
    gx, gy = _grids()
    model, params = Bilinear2D.create(gx, gy, r_adapt=True)
    params["increments_x"] = jnp.asarray(
        rng.normal(size=params["increments_x"].shape) * 3, jnp.float32)
    params["increments_y"] = jnp.asarray(
        rng.normal(size=params["increments_y"].shape) * 3, jnp.float32)
    ggx, ggy = model.grid(params)
    ggx, ggy = np.asarray(ggx), np.asarray(ggy)
    assert np.isclose(ggx[0], gx[0]) and np.isclose(ggx[-1], gx[-1])
    assert np.isclose(ggy[0], gy[0]) and np.isclose(ggy[-1], gy[-1])
    assert np.all(np.diff(ggx) > 0) and np.all(np.diff(ggy) > 0)


def test_grad_u_matches_fd():
    gx, gy = _grids()
    model, params = Bilinear2D.create(gx, gy, seed=3)
    pts = jnp.asarray([[0.33, 0.41], [0.72, 1.37]], jnp.float32)
    g = np.asarray(model.grad_u(params, pts))
    eps = 1e-3
    for k, d in enumerate(np.eye(2, dtype=np.float32)):
        up = np.asarray(model.apply(params, pts + eps * d))
        dn = np.asarray(model.apply(params, pts - eps * d))
        np.testing.assert_allclose(g[:, k], (up - dn) / (2 * eps),
                                   rtol=2e-2)


def test_l2_training_reduces_loss():
    import hidenn_fem_tpu as ht
    gx = gy = np.linspace(0, 1, 12)
    model, params = Bilinear2D.create(gx, gy, r_adapt=True)
    g = jnp.linspace(0, 1, 40)
    XX, YY = jnp.meshgrid(g, g, indexing="ij")
    x = jnp.stack([XX.ravel(), YY.ravel()], axis=1)
    target = jnp.sin(2 * jnp.pi * x[:, 0]) * jnp.cos(2 * jnp.pi * x[:, 1])
    loss_fn = lambda p: ht.l2_loss(model, p, x, target)
    l0 = float(loss_fn(params))
    params, losses = ht.minimize(loss_fn, params, method="adam",
                                 num_steps=300, learning_rate=5e-3)
    assert float(losses[-1]) < 0.1 * l0
