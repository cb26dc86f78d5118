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


def test_body_force_fast_path_vs_quadrature(setup):
    """The fused body-force term (computed from the already-gathered
    corner array, no per-quad-point gathers) must match the general
    quadrature assembly — value AND both gradients — for a spatially
    varying body force, on both the banded and the plain fused path."""
    mesh, model, params = setup
    bf = lambda x: jnp.stack([jnp.sin(x[:, 0]),
                              -9.81 * jnp.cos(x[:, 1])], axis=1)
    mesh_nb = dataclasses.replace(mesh, banded=None)
    e_quad = ht.PlaneStressEnergy(model=model, assembly="quadrature",
                                  body_force=bf, backend="xla")
    g_ref = jax.grad(lambda p: e_quad.domain_energy(p, mesh_nb))(params)
    v_ref = float(e_quad.domain_energy(params, mesh_nb))
    for e_fast, m in (
            (ht.PlaneStressEnergy(model=model, backend="pallas_interpret",
                                  body_force=bf), mesh),
            (ht.PlaneStressEnergy(model=model, backend="xla",
                                  body_force=bf), mesh_nb)):
        v = float(e_fast.domain_energy(params, m))
        assert np.isclose(v, v_ref, rtol=1e-5), (v, v_ref)
        g = jax.grad(lambda p: e_fast.domain_energy(p, m))(params)
        for k in g_ref:
            ref = np.asarray(g_ref[k])
            # coords grads are cancellation-prone in f32: absolute floor
            # scaled to the gradient magnitude
            np.testing.assert_allclose(np.asarray(g[k]), ref,
                                       rtol=5e-4,
                                       atol=1e-5 * np.abs(ref).max())


def test_banded_value_and_grad_single_pass(setup):
    """Under value_and_grad the banded path runs the single-pass
    recompute kernel (ownership-masked energy + cotangents in one scan);
    both outputs must match the value-only call / the XLA gradient."""
    mesh, model, params = setup
    assert mesh.banded.re_own_lo is not None  # ownership tables built
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v_only = float(e_bf.domain_energy(params, mesh))
    v_vg, g = jax.value_and_grad(
        lambda p: e_bf.domain_energy(p, mesh))(params)
    assert np.isclose(v_only, float(v_vg), rtol=1e-6), (v_only, v_vg)
    g_ref = jax.grad(lambda p: ht.PlaneStressEnergy(
        model=model, backend="xla").domain_energy(
            p, dataclasses.replace(mesh, banded=None)))(params)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]),
                                   rtol=5e-4, atol=1e-9)


def test_banded_no_ownership_falls_back(setup):
    """Stripping the ownership intervals must route gradients through the
    two-scan recompute backward with identical results."""
    mesh, model, params = setup
    ba = dataclasses.replace(mesh.banded, re_own_lo=None, re_own_hi=None)
    mesh2 = dataclasses.replace(mesh, banded=ba)
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v1, g1 = jax.value_and_grad(
        lambda p: e_bf.domain_energy(p, mesh))(params)
    v2, g2 = jax.value_and_grad(
        lambda p: e_bf.domain_energy(p, mesh2))(params)
    assert np.isclose(float(v1), float(v2), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-6, atol=1e-12)


def test_ownership_intervals_partition():
    """The ownership intervals partition [0, Ne): every element owned by
    exactly one recompute node block."""
    m = ht.proxy_plate_mesh(nx=41, ny=21)
    ba = build_banded_assembly(np.asarray(m.connectivity), m.n_nodes,
                               np.asarray(m.incidence), window_limit=400)
    assert ba is not None and ba.re_own_lo is not None
    est = np.asarray(ba.re_estarts, np.int64)
    lo = est + np.asarray(ba.re_own_lo, np.int64)
    hi = est + np.asarray(ba.re_own_hi, np.int64)
    counts = np.zeros(m.n_elements, np.int64)
    for a, b in zip(lo, hi):
        counts[a:b] += 1
    assert np.all(counts == 1)
    # owned columns lie inside each block's element window
    assert np.all(np.asarray(ba.re_own_lo) >= 0)
    assert np.all(np.asarray(ba.re_own_hi) <= ba.re_ew)
