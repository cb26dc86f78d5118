"""r-adaptivity earns its keep (VERDICT r3 #4): at MATCHED DOF the
r-adapted solve reaches a measurably better solution than the fixed
uniform mesh — quantifying the core HiDeNN claim the reference only
asserts (``/root/reference/README.md:258-260``, no numbers in either
repo before this).

Two rigorous metrics:

* 1D bar (the example-3 problem, closed-form solution): L2 error vs
  ``u_true``.  Measured at 41 nodes: fixed 3.27e-4, r-adapted 2.49e-4
  — a 0.76x error ratio from node motion alone.
* 2D plate with a hole (traction load, NO body force, so the element
  quadrature is exact and energy comparisons are rigorous Ritz
  comparisons on the SAME polygonal domain — boundary/hole nodes are
  pinned): equilibrated total potential.  E[u_h] >= E[u*] with
  E[u_h] - E[u*] = 0.5 |u_h - u*|_E^2, so a lower equilibrated energy
  IS a smaller energy-norm error.  Measured at 33x17/1 hole via
  ``radapt_aux_solve`` (coord_lr 3e-4, 10 epochs): -1.67152 ->
  -1.68009, dE = 8.6e-3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.models.linear1d import Linear1D
from hidenn_fem_tpu.ops.losses import bar_energy_1d

pytestmark = pytest.mark.slow

E_BAR = 175.0


def _solve_bar(n_nodes, r_adapt, num_steps=2000):
    from examples.example3 import b_force, u_true

    model, params = Linear1D.from_node_coords(
        np.linspace(0, 10, n_nodes), r_adapt=r_adapt, u0=0.0, uN=0.0)
    params, hist = ht.run_lbfgs(
        lambda p: bar_energy_1d(model, p, 4, b_force, E_BAR),
        params, num_steps=num_steps)
    xs = np.linspace(0, 10, 4001)
    u = np.asarray(model.apply(params, jnp.asarray(xs, jnp.float32)))
    err = float(np.sqrt(np.trapezoid((u - u_true(xs, E_BAR)) ** 2, xs)))
    return float(hist[-1]), err, model, params


def test_radapt_1d_beats_uniform_at_matched_dof():
    e_fix, err_fix, *_ = _solve_bar(41, r_adapt=False)
    e_ad, err_ad, model, params = _solve_bar(41, r_adapt=True)
    # strictly better in BOTH the energy and the L2-vs-exact metric,
    # with margin (measured ratio 0.76; alpha = 0.85)
    assert e_ad < e_fix, (e_ad, e_fix)
    assert err_ad < 0.85 * err_fix, (err_ad, err_fix)
    # and the improvement really came from node motion
    grid = np.asarray(model.grid(params))
    assert np.abs(grid - np.linspace(0, 10, 41)).max() > 0.05


def test_radapt_2d_lowers_equilibrated_energy():
    from hidenn_fem_tpu.models.structured_grid import StructuredGridP1
    from hidenn_fem_tpu.solve.auxspace import radapt_aux_solve

    mesh = ht.generate_mesh(length=2.0, height=1.0,
                            holes=((1.0, 0.5, 0.25),), nx=33, ny=17)
    model = ht.TriangleP1()
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    p0 = model.init(jax.random.PRNGKey(0), mesh)

    pf, en = radapt_aux_solve(
        lambda p, m: energy(p, m), dict(p0), mesh, loss_args=(mesh,),
        bg_model=StructuredGridP1(E=10e9, nu=0.3), outer_epochs=10,
        pcg_iters=200, pcg_tol=1e-7, coord_steps=20, coord_lr=3e-4)
    e = np.asarray(en)
    # energies[0] is the equilibrated UNIFORM mesh (epoch-0 exact inner
    # solve before any coordinate motion): the matched-DOF baseline
    d_e = float(e[0] - e[-1])
    assert d_e > 4e-3, (e[0], e[-1], d_e)   # measured 8.6e-3
    # monotone within solver noise, and the mesh actually moved
    assert np.all(e[1:] <= e[:-1] + 1e-6 * np.abs(e[:-1]))
    moved = float(jnp.abs(model.coords(pf, mesh)
                          - jnp.asarray(mesh.coords)).max())
    assert moved > 0.01, moved
    # pins hold: Dirichlet + geometric-boundary (incl. hole staircase)
    # coordinates must not move
    pin = np.asarray(mesh.geom_boundary_mask | mesh.dirichlet_mask)
    dc = np.abs(np.asarray(model.coords(pf, mesh))
                - np.asarray(mesh.coords))
    assert dc[pin].max() == 0.0
