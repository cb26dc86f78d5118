"""Linear1D model: partition of unity, interpolation exactness, derivative
correctness, r-adaptivity reparameterization, Dirichlet handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidenn_fem_tpu.models.linear1d import Linear1D


def test_grid_init_matches_coords():
    coords = np.linspace(0, 1, 50)
    model, params = Linear1D.from_node_coords(coords, r_adapt=True)
    np.testing.assert_allclose(np.asarray(model.grid(params)), coords,
                               atol=1e-6)


def test_grid_nonuniform_non_adaptive():
    coords = np.array([0.0, 0.1, 0.5, 0.6, 1.0])
    model, params = Linear1D.from_node_coords(coords, r_adapt=False)
    np.testing.assert_allclose(np.asarray(model.grid(params)), coords,
                               atol=1e-6)


def test_grid_monotone_under_any_increments(rng):
    model, params = Linear1D.from_node_coords(np.linspace(0, 2, 20),
                                              r_adapt=True)
    params["x_increments"] = jnp.asarray(
        rng.normal(size=params["x_increments"].shape) * 5, jnp.float32)
    g = np.asarray(model.grid(params))
    assert np.all(np.diff(g) > 0), "reparameterized grid must stay monotone"
    assert np.isclose(g[0], 0.0) and np.isclose(g[-1], 2.0)


def test_linear_interpolation_exact():
    """A piecewise-linear space reproduces linear functions exactly."""
    model, params = Linear1D.from_node_coords(np.linspace(0, 1, 17))
    nodes = np.asarray(model.grid(params))
    params["u"] = jnp.asarray(3.0 * nodes - 1.0, jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, 200), jnp.float32)
    np.testing.assert_allclose(np.asarray(model.apply(params, x)),
                               3.0 * np.asarray(x) - 1.0, atol=1e-5)


def test_nodal_interpolation_property():
    """u_h(x_i) == u_i at every node."""
    model, params = Linear1D.from_node_coords(np.linspace(0, 1, 9))
    params["u"] = jnp.arange(9, dtype=jnp.float32)
    got = model.apply(params, model.grid(params))
    np.testing.assert_allclose(np.asarray(got), np.arange(9), atol=1e-5)


def test_dirichlet_values_baked_in():
    model, params = Linear1D.from_node_coords(np.linspace(0, 1, 10),
                                              u0=2.0, uN=-1.0)
    assert params["u"].shape == (8,)
    uf = np.asarray(model.u_full(params))
    assert uf[0] == 2.0 and uf[-1] == -1.0
    # endpoint evaluation returns the fixed values
    assert np.isclose(float(model.apply(params, jnp.asarray([0.0]))[0]), 2.0)
    # gradient never flows into fixed ends
    g = jax.grad(lambda p: jnp.sum(model.apply(
        p, jnp.linspace(0, 1, 30)) ** 2))(params)
    assert g["u"].shape == (8,)


def test_du_dx_matches_finite_difference():
    model, params = Linear1D.from_node_coords(np.linspace(0, 1, 11))
    params["u"] = jnp.asarray(np.sin(np.linspace(0, 1, 11)), jnp.float32)
    x = jnp.asarray([0.05, 0.13, 0.77], jnp.float32)
    d = np.asarray(model.du_dx(params, x))
    eps = 1e-3
    fd = (np.asarray(model.apply(params, x + eps))
          - np.asarray(model.apply(params, x - eps))) / (2 * eps)
    np.testing.assert_allclose(d, fd, rtol=1e-3)


def test_grad_wrt_increments_nonzero_when_u_nonzero():
    model, params = Linear1D.from_node_coords(np.linspace(0, 1, 30),
                                              r_adapt=True)
    params["u"] = jnp.asarray(np.random.default_rng(3).normal(size=30),
                              jnp.float32)
    x = jnp.linspace(0.01, 0.99, 100)
    tgt = jnp.sin(2 * jnp.pi * x)
    g = jax.grad(lambda p: jnp.mean((model.apply(p, x) - tgt) ** 2))(params)
    assert float(jnp.linalg.norm(g["x_increments"])) > 0
    assert np.all(np.isfinite(np.asarray(g["x_increments"])))


def test_jit_and_double_grad():
    """grad-of-grad through searchsorted gathers (SURVEY §7 hard part)."""
    model, params = Linear1D.from_node_coords(np.linspace(0, 1, 12),
                                              u0=0.0, uN=0.0)
    params["u"] = jnp.asarray(np.random.default_rng(0).normal(size=10),
                              jnp.float32)
    x = jnp.linspace(0.03, 0.97, 40)

    def loss(p):
        _, du = jax.jvp(lambda xx: model.apply(p, xx), (x,),
                        (jnp.ones_like(x),))
        return jnp.sum(du ** 2)

    g = jax.jit(jax.grad(loss))(params)
    assert np.all(np.isfinite(np.asarray(g["u"])))
    assert float(jnp.linalg.norm(g["u"])) > 0
