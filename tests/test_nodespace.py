"""Node-space L-BFGS (solve/nodespace.py): plateau equality with the
params-space solve, grad-mask correctness, and the guard rails."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.structured import generate_mesh
from hidenn_fem_tpu.solve.nodespace import (grad_gate, lbfgs_node_space,
                                            node_free_mask)


def test_grad_gate_masks_gradient():
    x = jnp.arange(8.0)
    m = jnp.array([1.0, 0, 1, 0, 1, 0, 1, 0])
    g = jax.grad(lambda x: jnp.sum(grad_gate(x, m) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x * m))


def test_node_gradient_equals_params_gradient():
    """masked node-space grad == params-space grad (chain rule through
    the Dirichlet selects IS the mask multiply)."""
    mesh = generate_mesh(nx=17, ny=9, holes=(), variant="up")
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    node = model.packed_nodes(params, mesh)
    mask = node_free_mask(model, mesh)

    g_node = jax.grad(lambda n: energy.total_from_nodes(
        grad_gate(n, mask), mesh))(node)
    g_par = jax.grad(lambda p: energy(p, mesh))(params)
    np.testing.assert_allclose(np.asarray(g_node[:, 2:]),
                               np.asarray(g_par["u"]), rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_node[:, :2]),
                               np.asarray(g_par["coords"]), rtol=1e-6,
                               atol=1e-8)


@pytest.mark.slow
def test_node_space_lbfgs_plateau_matches_params_space():
    mesh = generate_mesh(nx=17, ny=9, holes=(), variant="up")
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    sol_p, l_p = ht.minimize(lambda p, m: energy(p, m), params,
                             method="lbfgs", num_steps=150,
                             loss_args=(mesh,))
    sol_n, l_n = lbfgs_node_space(energy, params, mesh, num_steps=150)
    scale = max(abs(float(l_p[-1])), 1e-30)
    assert abs(float(l_n[-1]) - float(l_p[-1])) / scale < 1e-3
    # solutions agree through the model's selects
    e_p = float(energy(sol_p, mesh))
    e_n = float(energy(sol_n, mesh))
    assert abs(e_n - e_p) / scale < 1e-3


def test_total_from_nodes_guards():
    mesh = generate_mesh(nx=17, ny=9, holes=((1.0, 0.5, 0.25),),
                         variant="up")   # renumbered -> still lattice
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  assembly="quadrature")
    node = model.packed_nodes(params, mesh)
    with pytest.raises(ValueError, match="lattice-routable"):
        energy.total_from_nodes(node, mesh)
