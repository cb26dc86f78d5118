"""Pallas fused element-energy kernel: value and gradient equality with
the XLA pipeline (interpreter mode on CPU; the compiled path runs on TPU
in bench/production)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht


@pytest.fixture(scope="module")
def setup():
    mesh = ht.proxy_plate_mesh(nx=17, ny=9)   # 256 elements
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    # perturb interior coords so the Jacobians are non-trivial
    params["coords"] = params["coords"] + 1e-3 * jax.random.normal(
        jax.random.PRNGKey(2), params["coords"].shape)
    return mesh, model, params


def test_pallas_matches_xla_value(setup):
    mesh, model, params = setup
    e_xla = ht.PlaneStressEnergy(model=model, backend="xla")
    e_pal = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v1 = float(e_xla.domain_energy(params, mesh))
    v2 = float(e_pal.domain_energy(params, mesh))
    assert np.isclose(v1, v2, rtol=1e-5), (v1, v2)


def test_pallas_matches_xla_grads(setup):
    mesh, model, params = setup
    e_xla = ht.PlaneStressEnergy(model=model, backend="xla")
    e_pal = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    g1 = jax.grad(lambda p: e_xla(p, mesh))(params)
    g2 = jax.grad(lambda p: e_pal(p, mesh))(params)
    for k in g1:
        # f32 reassociation between the two pipelines (different op order
        # in the kernel's in-body AD vs XLA's) -> ~2e-4 worst-case relative
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=5e-4, atol=1e-9)


def test_pallas_block_padding_zero_contribution(setup):
    """Element counts not divisible by the kernel block must pad with
    exactly-zero contributions (also covers shard padding)."""
    mesh, model, params = setup
    from hidenn_fem_tpu.parallel import sharding as sh
    padded = sh.pad_mesh(mesh, 7)
    e_pal = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v1 = float(e_pal.domain_energy(params, mesh))
    v2 = float(e_pal.domain_energy(params, padded))
    assert np.isclose(v1, v2, rtol=1e-6)


def test_pallas_jit_and_solver_path(setup):
    mesh, model, params = setup
    e_pal = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    p2, losses = ht.minimize(lambda p: e_pal(p, mesh), params,
                             method="adam", num_steps=20,
                             learning_rate=1e-6)
    assert np.all(np.isfinite(np.asarray(losses)))
