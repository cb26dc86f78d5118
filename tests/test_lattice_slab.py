"""Slab-kernel lattice energy (ops/lattice_slab.py): interpret-mode
value/gradient equality against the XLA lattice route, support
detection, and the losses-level routing guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.structured import generate_mesh
from hidenn_fem_tpu.ops import quadrature as quad
from hidenn_fem_tpu.ops.lattice_energy import lattice_total
from hidenn_fem_tpu.ops.lattice_slab import (lattice_total_slab,
                                             slab_supported)


def _perturbed_params(model, mesh):
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    params["coords"] = params["coords"] + 1e-3 * jax.random.normal(
        jax.random.PRNGKey(2), params["coords"].shape)
    return params


@pytest.mark.parametrize("variant", ["up", "down", "zigzag"])
@pytest.mark.parametrize("nx,ny", [(17, 9), (81, 41), (33, 65),
                                   (300, 20)])  # 300 rows: 3 grid
# instances — exercises the window halos, quad-row ownership seams and
# the double-buffer slot alternation (everything below is one block)
def test_slab_matches_xla_route(variant, nx, ny):
    mesh = generate_mesh(nx=nx, ny=ny, holes=(), variant=variant)
    route = mesh.lattice
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    node = model.packed_nodes(params, mesh)
    assert slab_supported(route, node.dtype)
    w_sum = quad.triangle_weight_sum(4)
    t_x = 100e3 / 1.0

    def ref(n):
        return lattice_total(n, route, 10e9, 0.3, w_sum, t_x)

    def new(n):
        return lattice_total_slab(n, route, 10e9, 0.3, w_sum, t_x,
                                  interpret=True)

    v_ref, g_ref = jax.value_and_grad(ref)(node)
    v_new, g_new = jax.value_and_grad(new)(node)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=2e-6)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(g_new) / scale,
                               np.asarray(g_ref) / scale, atol=2e-6)


@pytest.mark.parametrize("variant", ["up", "zigzag"])
def test_slab_matches_xla_route_keep_dead_holes(variant):
    """keep_dead_nodes hole meshes stay identity-numbered with t1/t2
    presence masks — the zero-gather hole path must ride the kernel."""
    mesh = generate_mesh(nx=33, ny=17,
                         holes=((0.6, 0.4, 0.15), (1.4, 0.6, 0.2)),
                         variant=variant, keep_dead_nodes=True)
    route = mesh.lattice
    assert route.identity and not route.all_present
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    node = model.packed_nodes(params, mesh)
    assert slab_supported(route, node.dtype)
    w_sum = quad.triangle_weight_sum(4)
    t_x = 100e3 / 1.0

    def ref(n):
        return lattice_total(n, route, 10e9, 0.3, w_sum, t_x)

    def new(n):
        return lattice_total_slab(n, route, 10e9, 0.3, w_sum, t_x,
                                  interpret=True)

    v_ref, g_ref = jax.value_and_grad(ref)(node)
    v_new, g_new = jax.value_and_grad(new)(node)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=2e-6)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(g_new) / scale,
                               np.asarray(g_ref) / scale, atol=2e-6)


def test_slab_support_detection():
    # renumbered hole meshes (permutation fill) -> unsupported
    hole = generate_mesh(nx=33, ny=17, holes=((1.0, 0.5, 0.25),),
                         variant="up")
    assert not hole.lattice.identity
    assert not slab_supported(hole.lattice, jnp.float32)
    # f64 falls back
    up = generate_mesh(nx=17, ny=9, holes=(), variant="up")
    assert not slab_supported(up.lattice, jnp.float64)
    assert slab_supported(up.lattice, jnp.float32)
    assert not slab_supported(None, jnp.float32)


def test_losses_routes_through_slab_kernel():
    """The pallas_interpret backend must route supported lattice meshes
    through the slab kernel and match the default (xla-route) energy
    and gradients at the losses level."""
    mesh = generate_mesh(nx=33, ny=17, holes=(), variant="up")
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    e_slab = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  backend="pallas_interpret")
    e_xla = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                 backend="xla")

    v1, g1 = jax.value_and_grad(lambda p: e_slab(p, mesh))(params)
    v2, g2 = jax.value_and_grad(lambda p: e_xla(p, mesh))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-6)
    for k in ("u", "coords"):
        scale = float(jnp.max(jnp.abs(g2[k]))) + 1e-30
        np.testing.assert_allclose(np.asarray(g1[k]) / scale,
                                   np.asarray(g2[k]) / scale, atol=2e-6)


def test_slab_env_opt_out(monkeypatch):
    """HDNN_NO_SLAB forces the XLA lattice route even under pallas."""
    from hidenn_fem_tpu.ops import losses as losses_mod
    mesh = generate_mesh(nx=17, ny=9, holes=(), variant="up")
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  backend="pallas_interpret")
    monkeypatch.setenv("HDNN_NO_SLAB", "1")
    v_off = float(energy(params, mesh))
    monkeypatch.delenv("HDNN_NO_SLAB")
    v_on = float(energy(params, mesh))
    np.testing.assert_allclose(v_on, v_off, rtol=2e-6)


@pytest.mark.parametrize("split,phase", [("up", 0), ("down", 0),
                                         ("zigzag", 0), ("zigzag", 1)])
def test_structured_domain_slab_matches(split, phase):
    """structured_domain_slab == StructuredGridP1's XLA stencil, holes
    and zigzag parity included (interpret mode)."""
    import dataclasses
    from hidenn_fem_tpu.models.structured_grid import (
        StructuredGridP1, generate_structured_grid)
    from hidenn_fem_tpu.ops.lattice_slab import structured_domain_slab

    grid = generate_structured_grid(nx=33, ny=17,
                                    holes=((1.0, 0.5, 0.25),),
                                    split=split)
    grid = dataclasses.replace(grid, zigzag_phase=phase)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    node = model._node(params, grid)

    def ref(n):
        return model._domain_from_node(n, grid)

    def new(n):
        return structured_domain_slab(n, grid.quad_mask, grid.split,
                                      grid.zigzag_phase, model.E,
                                      model.nu, interpret=True)

    v_ref, g_ref = jax.value_and_grad(ref)(node)
    v_new, g_new = jax.value_and_grad(new)(node)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=2e-6)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(g_new) / scale,
                               np.asarray(g_ref) / scale, atol=2e-6)


@pytest.mark.slow
def test_slab_route_lbfgs_solve_matches():
    """A plate L-BFGS solve through the slab kernel (interpret) reaches
    the XLA lattice route's plateau.  (Step-by-step trajectories are
    NOT comparable in f32: the kernel reassociates sums, and L-BFGS
    amplifies 1e-7-level differences chaotically — same reason the
    baseline-parity tests compare plateaus, not iterates.)"""
    mesh = generate_mesh(nx=17, ny=9, holes=(), variant="up")
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)

    def run(backend):
        energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                      backend=backend)
        sol, losses = ht.minimize(
            lambda p, m: energy(p, m), params, method="lbfgs",
            num_steps=150, loss_args=(mesh,))
        return np.asarray(losses)

    l_xla = run("xla")
    l_slab = run("pallas_interpret")
    scale = max(abs(float(l_xla[-1])), 1e-30)
    assert abs(float(l_slab[-1]) - float(l_xla[-1])) / scale < 1e-3
