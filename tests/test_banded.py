"""Blocked-window (banded) assembly: exact agreement with global-gather
assembly for values and gradients; RCM reorder utility."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.banded import (build_banded_assembly,
                                        reorder_mesh)
from hidenn_fem_tpu.ops.assembly import gather_banded


def _mesh_forced_banded(nx=33, ny=17):
    m = ht.proxy_plate_mesh(nx=nx, ny=ny)
    ba = build_banded_assembly(np.asarray(m.connectivity), m.n_nodes,
                               np.asarray(m.incidence), window_limit=300)
    assert ba is not None, "test mesh should band under a 300-row window"
    return dataclasses.replace(m, banded=ba)


def test_banded_gather_matches_plain():
    mesh = _mesh_forced_banded()
    node = jax.random.normal(jax.random.PRNGKey(0), (mesh.n_nodes, 4))

    g_banded = gather_banded(node, mesh.banded)
    g_plain = node[mesh.connectivity]
    ne = mesh.n_elements
    np.testing.assert_allclose(np.asarray(g_banded[:ne]),
                               np.asarray(g_plain), atol=0)
    # padding rows are degenerate node triples -> identical rows
    extra = np.asarray(g_banded[ne:])
    if extra.size:
        assert np.all(extra[:, 0] == extra[:, 1])

    def f_b(node):
        g = gather_banded(node, mesh.banded)
        return jnp.sum(jnp.sin(g[:ne]) * g[:ne])

    def f_p(node):
        g = node[mesh.connectivity]
        return jnp.sum(jnp.sin(g) * g)

    g1 = jax.grad(f_b)(node)
    g2 = jax.grad(f_p)(node)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6,
                               atol=1e-7)


def test_banded_energy_matches_global():
    mesh_b = _mesh_forced_banded()
    mesh_g = dataclasses.replace(mesh_b, banded=None)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh_b)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=model)
    v1 = float(energy(params, mesh_b))
    v2 = float(energy(params, mesh_g))
    assert np.isclose(v1, v2, rtol=1e-5)
    g1 = jax.grad(lambda p: energy(p, mesh_b))(params)
    g2 = jax.grad(lambda p: energy(p, mesh_g))(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-5, atol=1e-9)


def test_auto_banded_threshold():
    small = ht.proxy_plate_mesh(nx=9, ny=5)
    assert small.banded is None  # tiny mesh: global gather is faster


def test_rcm_reorder_preserves_physics():
    mesh = ht.generate_mesh(nx=30, ny=15)  # holes, unstructured-ish
    re = reorder_mesh(mesh, build_banded=False)
    assert re.n_nodes == mesh.n_nodes
    assert re.n_elements == mesh.n_elements
    # same element-size distribution and BC counts
    model = ht.TriangleP1()
    p1 = model.init(jax.random.PRNGKey(0), mesh)
    p2 = model.init(jax.random.PRNGKey(0), re)
    d1, _ = model.element_fields(p1, mesh)
    d2, _ = model.element_fields(p2, re)
    np.testing.assert_allclose(sorted(np.asarray(jnp.abs(d1))),
                               sorted(np.asarray(jnp.abs(d2))), rtol=1e-5)
    for attr in ("dirichlet_mask", "neumann_mask", "geom_boundary_mask"):
        assert (np.asarray(getattr(mesh, attr)).sum()
                == np.asarray(getattr(re, attr)).sum())
    # energies at the exact solution scale match (quadratic solve)
    e = ht.PlaneStressEnergy(model=model)
    _, l1 = ht.run_lbfgs(lambda p: e(p, mesh), p1, num_steps=150)
    _, l2 = ht.run_lbfgs(lambda p: e(p, re), p2, num_steps=150)
    assert np.isclose(float(np.asarray(l1)[-1]), float(np.asarray(l2)[-1]),
                      rtol=1e-3)
