"""Interrupted-run resume semantics for solve_with_checkpointing."""

import os

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.solve.drivers import solve_with_checkpointing


def test_resume_continues_from_latest(tmp_path):
    mesh = ht.proxy_plate_mesh(nx=9, ny=5)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model)
    loss = lambda p: energy(p, mesh)
    opt = ht.adam(1e-6)
    d = str(tmp_path)

    # "crash" after 40 of 100 steps
    p_mid, _ = solve_with_checkpointing(loss, params, opt, 40, d,
                                        checkpoint_every=20)
    assert sorted(os.listdir(d)) == ["ckpt_20.msgpack", "ckpt_40.msgpack"]

    # resume to 100: starts from step 40, not from scratch
    p_res, hist = solve_with_checkpointing(loss, params, opt, 100, d,
                                           checkpoint_every=20)
    assert os.path.exists(os.path.join(d, "ckpt_100.msgpack"))
    total_resumed = sum(len(np.asarray(h)) for h in hist)
    assert total_resumed == 60  # only the remaining steps ran

    # uninterrupted run matches the resumed one (deterministic resume)
    p_full, _ = solve_with_checkpointing(loss, params, opt, 100,
                                         str(tmp_path / "b"),
                                         checkpoint_every=20)
    for k in p_full:
        np.testing.assert_allclose(np.asarray(p_res[k]),
                                   np.asarray(p_full[k]), rtol=1e-6,
                                   atol=1e-9)


def test_radapt_concentrates_nodes_example3():
    """Qualitative parity with the reference README's r-adaptivity claim
    (README.md:258-260: nodes concentrate near the force application):
    after the example-3 bar solve, node spacing near the body-force bumps
    (x = 2.5, 7.5) is finer than in the quiet middle (x ~ 5)."""
    from examples.example3 import b_force
    model, params = ht.Linear1D.from_node_coords(np.linspace(0, 10, 89),
                                                 r_adapt=True, u0=0.0,
                                                 uN=0.0)
    loss = lambda p: ht.bar_energy_1d(model, p, 2, b_force, E=175.0)
    params, _ = ht.minimize(loss, params, method="adam", num_steps=4000,
                            learning_rate=1e-4)
    grid = np.asarray(model.grid(params))
    spacing = np.diff(grid)
    mids = 0.5 * (grid[:-1] + grid[1:])
    near_bumps = spacing[(np.abs(mids - 2.5) < 0.7)
                         | (np.abs(mids - 7.5) < 0.7)]
    quiet = spacing[np.abs(mids - 5.0) < 1.0]
    assert near_bumps.mean() < quiet.mean(), (near_bumps.mean(),
                                              quiet.mean())
