"""1D bar energy tests: convergence to the manufactured solution,
double-differentiation path, and the E5 compat flag."""

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from examples.example3 import b_force, u_true


def _setup(n_nodes=89, r_adapt=True):
    return ht.Linear1D.from_node_coords(np.linspace(0, 10, n_nodes),
                                        r_adapt=r_adapt, u0=0.0, uN=0.0)


def test_bar_energy_zero_at_zero_u():
    model, params = _setup()
    e = float(ht.bar_energy_1d(model, params, 2, b_force, E=175.0))
    assert e == 0.0


def test_bar_solve_matches_exact():
    model, params = _setup()
    loss_fn = lambda p: ht.bar_energy_1d(model, p, 2, b_force, E=175.0)
    params, losses = ht.minimize(loss_fn, params, method="adam",
                                 num_steps=2500, learning_rate=1e-4)
    xs = np.linspace(0, 10, 1500)
    u_h = np.asarray(model.apply(params, jnp.asarray(xs, jnp.float32)))
    err = np.sqrt(np.mean((u_h - u_true(xs, 175.0)) ** 2))
    assert err < 5e-4, err


def test_gradients_flow_through_quadrature_geometry():
    """Default: differentiable integration map (E5 fixed); compat flag
    reproduces the reference's detached geometry."""
    model, params = _setup(n_nodes=21)
    params["u"] = jnp.asarray(
        np.random.default_rng(0).normal(size=19) * 1e-3, jnp.float32)

    g_diff = jax.grad(lambda p: ht.bar_energy_1d(
        model, p, 2, b_force, E=175.0, differentiable_geometry=True))(params)
    g_ref = jax.grad(lambda p: ht.bar_energy_1d(
        model, p, 2, b_force, E=175.0, differentiable_geometry=False))(params)
    # both finite; increments gradients must differ (extra path in default)
    for g in (g_diff, g_ref):
        for k, v in g.items():
            assert np.all(np.isfinite(np.asarray(v))), k
    assert not np.allclose(np.asarray(g_diff["x_increments"]),
                           np.asarray(g_ref["x_increments"]))


def test_second_order_path_jittable():
    model, params = _setup(n_nodes=15)
    f = jax.jit(jax.grad(lambda p: ht.bar_energy_1d(model, p, 3, b_force,
                                                    E=175.0)))
    g = f(params)
    assert np.all(np.isfinite(np.asarray(g["u"])))
