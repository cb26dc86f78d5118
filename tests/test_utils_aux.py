"""Auxiliary subsystems: checkpoint round-trip, metrics, debug helpers,
postproc recovery, reference-style wrappers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import postproc
from hidenn_fem_tpu.models.wrappers import (
    PiecewiseLinearShapeNN, PiecewiseLinearShapeNN2D,
    PiecewiseLinearShapeNN2DStructured)
from hidenn_fem_tpu.utils import (assert_all_finite, check_gradients,
                                  grad_norms, latest_checkpoint,
                                  restore_checkpoint, save_checkpoint,
                                  solve_metrics, MetricsWriter)


def test_checkpoint_roundtrip(tmp_path):
    mesh = ht.proxy_plate_mesh(nx=5, ny=3)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    opt = ht.adam(1e-3)
    opt_state = opt.init(params)

    path = str(tmp_path / "ckpt_40.msgpack")
    save_checkpoint(path, params, opt_state, step=40,
                    metadata={"note": "test"})
    p2, s2, step, meta = restore_checkpoint(path, params, opt_state)
    assert step == 40 and meta["note"] == "test"
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(p2[k]))
    # optimizer state round-trips into the template structure
    flat1 = jax.tree.leaves(opt_state)
    flat2 = jax.tree.leaves(s2)
    assert len(flat1) == len(flat2)
    # resume actually continues the solve
    energy = ht.PlaneStressEnergy(model=model)
    loss, grads = jax.value_and_grad(lambda p: energy(p, mesh))(p2)
    updates, s3 = opt.update(grads, s2, p2)
    optax.apply_updates(p2, updates)


def test_latest_checkpoint(tmp_path):
    d = str(tmp_path)
    for s in (1, 30, 7):
        save_checkpoint(os.path.join(d, f"ckpt_{s}.msgpack"), {"x": 1.0},
                        step=s)
    assert latest_checkpoint(d).endswith("ckpt_30.msgpack")


def test_metrics_and_writer(tmp_path):
    mesh = ht.proxy_plate_mesh(nx=5, ny=3)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model)
    loss, grads = jax.value_and_grad(lambda p: energy(p, mesh))(params)
    m = solve_metrics(3, loss, grads, model, params, mesh,
                      wall_per_step=0.01, n_quad_points=256)
    assert m["step"] == 3 and "grad_norm/u" in m
    assert m["min_abs_detJ"] > 0
    assert m["qp_evals_per_sec"] == 256 / 0.01
    path = str(tmp_path / "metrics.jsonl")
    with MetricsWriter(path) as w:
        w.write(m)
    import json
    with open(path) as f:
        assert json.loads(f.readline())["step"] == 3


def test_check_gradients_helper():
    mesh = ht.proxy_plate_mesh(nx=5, ny=3)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model)
    norms = check_gradients(lambda p: energy(p, mesh), params,
                            verbose=False)
    assert set(norms) == {"u", "coords"}
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.asarray([1.0, jnp.nan])})


def test_postproc_von_mises_uniform_strain():
    """Pure uniaxial strain field -> uniform, analytic von Mises."""
    from hidenn_fem_tpu.mesh.types import TriMesh
    m0 = ht.proxy_plate_mesh(nx=7, ny=5)
    mesh = TriMesh.from_arrays(np.asarray(m0.coords),
                               np.asarray(m0.connectivity))
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    exx = 1e-4
    params["u"] = jnp.stack(
        [exx * mesh.coords[:, 0], jnp.zeros(mesh.n_nodes)], axis=1)
    E, nu = 10e9, 0.3
    vm = np.asarray(postproc.von_mises_per_element(model, params, mesh,
                                                   E, nu))
    f = E / (1 - nu ** 2)
    sxx, syy = f * exx, f * nu * exx
    expect = np.sqrt(sxx ** 2 - sxx * syy + syy ** 2)
    np.testing.assert_allclose(vm, expect, rtol=1e-4)


def test_reference_wrapper_surfaces():
    w1 = PiecewiseLinearShapeNN(np.linspace(0, 1, 10), r_adapt=True)
    assert w1.grid.shape == (10,)
    assert w1(jnp.asarray([0.5])).shape == (1,)

    w2 = PiecewiseLinearShapeNN2DStructured(np.linspace(0, 1, 5),
                                            np.linspace(0, 1, 6),
                                            r_adapt=True)
    assert w2(jnp.asarray([[0.5, 0.5]])).shape == (1,)

    m = ht.proxy_plate_mesh(nx=5, ny=3)
    w3 = PiecewiseLinearShapeNN2D(
        np.asarray(m.coords), np.asarray(m.connectivity),
        boundary_mask=np.asarray(m.geom_boundary_mask),
        dirichlet_mask=np.asarray(m.dirichlet_mask), u_fixed=0.0,
        neumann_edges=np.asarray(m.neumann_edges))
    assert w3.Nnodes == m.n_nodes and w3.Nelems == m.n_elements
    x_ref = jnp.full((3, 2), 1.0 / 3.0)
    u_h, det, grad_u = w3(x_ref, jnp.arange(3))
    assert u_h.shape == (3, 2) and grad_u.shape == (3, 2, 2)
    u_e, ds = w3(jnp.asarray([0.5]), jnp.arange(1), edge=True)
    assert u_e.shape == (1, 2)
    # reference-quirk E4 fixed: models without u_fixed/neumann_edges work
    w4 = PiecewiseLinearShapeNN2D(np.asarray(m.coords),
                                  np.asarray(m.connectivity))
    assert w4.u_full.shape == (m.n_nodes, 2)
