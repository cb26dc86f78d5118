"""Block-fused banded energy (custom VJP): value + gradient equality with
the global XLA pipeline, in Pallas interpreter mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.banded import build_banded_assembly


@pytest.fixture(scope="module")
def setup():
    m = ht.proxy_plate_mesh(nx=33, ny=17)
    ba = build_banded_assembly(np.asarray(m.connectivity), m.n_nodes,
                               np.asarray(m.incidence), window_limit=300)
    assert ba is not None
    mesh = dataclasses.replace(m, banded=ba)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    params["coords"] = params["coords"] + 1e-3 * jax.random.normal(
        jax.random.PRNGKey(2), params["coords"].shape)
    return mesh, model, params


def test_banded_energy_value(setup):
    mesh, model, params = setup
    e_ref = ht.PlaneStressEnergy(model=model, backend="xla")
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v1 = float(e_ref.domain_energy(
        params, dataclasses.replace(mesh, banded=None)))
    v2 = float(e_bf.domain_energy(params, mesh))
    assert np.isclose(v1, v2, rtol=1e-5), (v1, v2)


def test_banded_energy_grads(setup):
    mesh, model, params = setup
    e_ref = ht.PlaneStressEnergy(model=model, backend="xla")
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    g1 = jax.grad(lambda p: e_ref(
        p, dataclasses.replace(mesh, banded=None)))(params)
    g2 = jax.grad(lambda p: e_bf(p, mesh))(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=5e-4, atol=1e-9)


def test_banded_energy_in_solver(setup):
    mesh, model, params = setup
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    p2, losses = ht.minimize(e_bf.total, params, method="adam",
                             num_steps=15, learning_rate=1e-7,
                             loss_args=(mesh,))
    assert np.all(np.isfinite(np.asarray(losses)))


def test_banded_energy_body_force_falls_back(setup):
    """With a body force the block-fused path is skipped; result matches
    the global path."""
    mesh, model, params = setup
    bf = lambda x: jnp.stack([jnp.zeros(x.shape[0]),
                              -9.81 * jnp.ones(x.shape[0])], axis=1)
    e1 = ht.PlaneStressEnergy(model=model, backend="pallas_interpret",
                              body_force=bf)
    e2 = ht.PlaneStressEnergy(model=model, backend="xla", body_force=bf)
    v1 = float(e1.domain_energy(params, mesh))
    v2 = float(e2.domain_energy(
        params, dataclasses.replace(mesh, banded=None)))
    assert np.isclose(v1, v2, rtol=1e-5)
