"""Solve strategies: alternating freeze, two-phase, per-group LRs,
loss_args operand passing, tol-based LBFGS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht


@pytest.fixture(scope="module")
def problem():
    mesh = ht.proxy_plate_mesh(nx=13, ny=7)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model)
    return mesh, model, params, energy


def test_loss_args_matches_closure(problem):
    mesh, model, params, energy = problem
    p1, l1 = ht.minimize(lambda p: energy(p, mesh), params, method="adam",
                         num_steps=30, learning_rate=1e-6)
    p2, l2 = ht.minimize(energy.total, params, method="adam",
                         num_steps=30, learning_rate=1e-6,
                         loss_args=(mesh,))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_group_lrs_freeze_semantics(problem):
    mesh, model, params, energy = problem
    # coords lr zero => coordinates must not move
    p2, _ = ht.minimize(energy.total, params, method="adam", num_steps=20,
                        group_lrs={"u": 1e-6, "coords": 0.0},
                        loss_args=(mesh,))
    np.testing.assert_array_equal(np.asarray(p2["coords"]),
                                  np.asarray(params["coords"]))
    assert not np.array_equal(np.asarray(p2["u"]), np.asarray(params["u"]))


def test_alternating_solve_runs(problem):
    mesh, model, params, energy = problem
    p2, losses = ht.alternating_solve(
        lambda p: energy(p, mesh), params, outer_epochs=3, u_steps=3,
        coord_steps=2, u_lr=1e-7, coord_lr=1e-8)
    assert np.all(np.isfinite(np.asarray(losses)))


def test_two_phase_solve_improves(problem):
    mesh, model, params, energy = problem
    p2, losses = ht.two_phase_solve(lambda p: energy(p, mesh), params,
                                    adam_steps=20, lbfgs_steps=100)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0]
    # LBFGS phase should reach near the quadratic optimum
    assert losses[-1] < 0


def test_lbfgs_tol_early_stop(problem):
    mesh, model, params, energy = problem
    p2, losses = ht.run_lbfgs(energy.total, params, num_steps=300,
                              tol=1e-3, loss_args=(mesh,))
    losses = np.asarray(losses)
    # after convergence the history is padded with the final value
    tail = losses[-20:]
    assert np.allclose(tail, tail[-1])
    assert np.isfinite(tail[-1])


@pytest.mark.slow
def test_dryrun_multichip_counts(eight_devices):
    import __graft_entry__ as ge
    for n in (2, 4, 8):
        ge.dryrun_multichip(n)


def test_compact_lbfgs_matches_two_loop():
    """The compact-representation L-BFGS (scale_by_compact_lbfgs) computes
    the same direction as optax's two-loop recursion — trajectories agree
    to float tolerance across memory sizes, including buffer wraparound."""
    import optax
    from hidenn_fem_tpu.solve.optimizers import scale_by_compact_lbfgs

    def loss(p):
        x = p["x"]
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2) + jnp.sum(p["y"] ** 2)

    for m in (2, 5, 16):
        p1 = {"x": jnp.linspace(-1.0, 2.0, 13), "y": jnp.ones((3, 2))}
        p2 = jax.tree.map(jnp.copy, p1)
        o1 = optax.chain(optax.scale_by_lbfgs(memory_size=m),
                         optax.scale_by_learning_rate(1e-3))
        o2 = optax.chain(scale_by_compact_lbfgs(memory_size=m),
                         optax.scale_by_learning_rate(1e-3))
        s1, s2 = o1.init(p1), o2.init(p2)

        for _ in range(3 * m + 5):   # exercise wraparound
            g1, g2 = jax.grad(loss)(p1), jax.grad(loss)(p2)
            u1, s1 = o1.update(g1, s1, p1)
            u2, s2 = o2.update(g2, s2, p2)
            p1 = optax.apply_updates(p1, u1)
            p2 = optax.apply_updates(p2, u2)
        # the two formulations are algebraically identical; f32 rounding
        # noise gets amplified along the trajectory, hence the tolerance
        for k in p1:
            np.testing.assert_allclose(np.asarray(p1[k]),
                                       np.asarray(p2[k]),
                                       rtol=2e-3, atol=1e-5)


def test_scan_count_predicate():
    """Regression guard for an axon-TPU compiler bug found in round 2: in
    a scan body that increments an int32 counter carry, a select whose
    predicate is ``c > 0`` read the POST-increment value (so iteration 0
    took the wrong branch), while ``c == 0`` compiled correctly.  The
    compact L-BFGS gamma selection is written with ``c == 0`` for this
    reason.  On CPU both forms agree; on the TPU backend this asserts the
    formulation we rely on stays correct."""
    import jax.numpy as jnp

    @jax.jit
    def f():
        def body(carry, _):
            c = carry
            good = jnp.where(c == 0, -1.0, jnp.asarray(c, jnp.float32))
            return c + 1, good
        _, gs = jax.lax.scan(body, jnp.zeros((), jnp.int32), length=3)
        return gs

    np.testing.assert_allclose(np.asarray(f()), [-1.0, 1.0, 2.0])
