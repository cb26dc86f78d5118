"""TriangleP1 model + mesh + plane-stress energy tests.

Includes the FEM classics: partition of unity, linear-field patch test
(P1 reproduces linear displacement exactly -> constant strain; energy
gradient vanishes at the exact solution of a pure-Dirichlet problem), and
agreement between the fused (constant-strain) and general quadrature
assemblies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidenn_fem_tpu.mesh.structured import generate_mesh, proxy_plate_mesh
from hidenn_fem_tpu.models.triangle_p1 import TriangleP1
from hidenn_fem_tpu.ops.losses import PlaneStressEnergy


@pytest.fixture(scope="module")
def small_plate():
    return proxy_plate_mesh(nx=9, ny=5)


@pytest.fixture(scope="module")
def model():
    return TriangleP1()


def test_mesh_shapes_and_orientation(small_plate):
    m = small_plate
    assert m.n_nodes == 9 * 5
    assert m.n_elements == 8 * 4 * 2
    # all elements counter-clockwise: detJ > 0 everywhere
    p = TriangleP1().init(jax.random.PRNGKey(0), m)
    det, _ = TriangleP1().element_fields(p, m)
    assert np.all(np.asarray(det) > 0)
    # mesh area == sum of |detJ|/2 == plate area
    assert np.isclose(np.asarray(jnp.abs(det)).sum() * 0.5, 2.0 * 1.0,
                      atol=1e-4)


def test_mesh_with_holes_drops_nodes():
    m = generate_mesh(nx=40, ny=20)
    full = generate_mesh(nx=40, ny=20, holes=())
    assert m.n_nodes < full.n_nodes
    assert m.n_elements < full.n_elements
    assert int(np.asarray(m.geom_boundary_mask).sum()) > 0
    # dirichlet nodes on the left face only
    coords = np.asarray(m.coords)
    assert np.all(coords[np.asarray(m.dirichlet_mask), 0] < 1e-5)
    # neumann edges on the right face
    ne = np.asarray(m.neumann_edges)
    assert ne.shape[0] > 0
    assert np.all(np.abs(coords[ne.ravel(), 0] - 2.0) < 1e-5)


def test_partition_of_unity(small_plate, model):
    """Constant displacement field is reproduced exactly at any ref point."""
    params = model.init(jax.random.PRNGKey(0), small_plate)
    mesh_free = small_plate  # Dirichlet mask would pin u; bypass u_full
    params["u"] = jnp.full_like(params["u"], 0.0)
    c = jnp.asarray([1.7, -0.4], jnp.float32)
    params["u"] = jnp.tile(c, (small_plate.n_nodes, 1))
    # build a mesh with no dirichlet nodes so u_full == params["u"]
    from hidenn_fem_tpu.mesh.types import TriMesh
    m2 = TriMesh.from_arrays(np.asarray(mesh_free.coords),
                             np.asarray(mesh_free.connectivity))
    rng = np.random.default_rng(0)
    n = 50
    x_ref = rng.uniform(0, 0.5, size=(n, 2)).astype(np.float32)
    elem_id = rng.integers(0, m2.n_elements, size=n)
    u_h, det, grad_u = model.apply_domain(params, m2, x_ref, elem_id)
    np.testing.assert_allclose(np.asarray(u_h),
                               np.tile(np.asarray(c), (n, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_u), 0.0, atol=1e-5)


def test_linear_patch_test(model):
    """P1 reproduces a linear displacement field exactly: u = A x + b
    => grad_u == A everywhere, u_h exact at interior points."""
    from hidenn_fem_tpu.mesh.types import TriMesh
    m = proxy_plate_mesh(nx=7, ny=5)
    m2 = TriMesh.from_arrays(np.asarray(m.coords),
                             np.asarray(m.connectivity))
    A = np.array([[1e-3, 2e-4], [-3e-4, 5e-4]], np.float32)
    b = np.array([1e-5, -2e-5], np.float32)
    params = model.init(jax.random.PRNGKey(0), m2)
    params["u"] = jnp.asarray(np.asarray(m.coords) @ A.T + b)
    rng = np.random.default_rng(1)
    n = 64
    r = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
    r = np.where(r.sum(1, keepdims=True) > 1, 1 - r, r)  # inside ref tri
    elem_id = rng.integers(0, m2.n_elements, size=n)
    u_h, det, grad_u = model.apply_domain(params, m2, r, elem_id)
    np.testing.assert_allclose(np.asarray(grad_u),
                               np.tile(A, (n, 1, 1)), rtol=1e-3, atol=1e-7)


def test_dirichlet_and_boundary_pinning(small_plate, model):
    params = model.init(jax.random.PRNGKey(0), small_plate)
    u = model.u_full(params, small_plate)
    d = np.asarray(small_plate.dirichlet_mask)
    np.testing.assert_allclose(np.asarray(u)[d], 0.0, atol=0)
    # coords gradient is zero on geometric boundary nodes
    energy = PlaneStressEnergy(model=model)
    g = jax.grad(lambda p: energy(p, small_plate))(params)
    gb = np.asarray(small_plate.geom_boundary_mask)
    np.testing.assert_allclose(np.asarray(g["coords"])[gb], 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(g["u"])[d], 0.0, atol=0)
    # free nodes do receive gradient
    assert np.linalg.norm(np.asarray(g["u"])[~d]) > 0


def test_fused_vs_quadrature_assembly(small_plate, model):
    params = model.init(jax.random.PRNGKey(2), small_plate)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(3),
                                           params["u"].shape)
    for order in (1, 3, 4, 6, 7):
        e_f = PlaneStressEnergy(model=model, gauss_order=order)
        e_q = PlaneStressEnergy(model=model, gauss_order=order,
                                assembly="quadrature")
        vf = float(e_f(params, small_plate))
        vq = float(e_q(params, small_plate))
        assert np.isclose(vf, vq, rtol=1e-5), (order, vf, vq)


def test_energy_gradients_finite_and_nonzero(small_plate, model):
    """The reference's only 'test' (utils.py:83-96 test_gradients) as a
    real assertion: both parameter groups get finite gradients."""
    params = model.init(jax.random.PRNGKey(0), small_plate)
    energy = PlaneStressEnergy(model=model)
    val, g = jax.value_and_grad(lambda p: energy(p, small_plate))(params)
    assert np.isfinite(float(val))
    for k in ("u", "coords"):
        arr = np.asarray(g[k])
        assert np.all(np.isfinite(arr)), k
    assert np.linalg.norm(np.asarray(g["u"])) > 0


def test_edge_energy_zero_without_neumann(model):
    from hidenn_fem_tpu.mesh.types import TriMesh
    m = proxy_plate_mesh(nx=5, ny=3)
    m2 = TriMesh.from_arrays(np.asarray(m.coords), np.asarray(m.connectivity))
    params = model.init(jax.random.PRNGKey(0), m2)
    energy = PlaneStressEnergy(model=model)
    assert float(energy.edge_energy(params, m2)) == 0.0


def test_edge_traction_work_linear_exact(small_plate, model):
    """Uniform traction on the right edge: work = t_x * integral of u_x.
    With u_x == const c on the edge, work == c * F_total."""
    params = model.init(jax.random.PRNGKey(0), small_plate)
    c = 1e-4
    params["u"] = jnp.tile(jnp.asarray([c, 0.0], jnp.float32),
                           (small_plate.n_nodes, 1))
    energy = PlaneStressEnergy(model=model, F_total=100e3,
                               traction_length=1.0)
    w = float(energy.edge_energy(params, small_plate))
    # right edge length = height = 1.0; t_x = F/L = 1e5
    assert np.isclose(w, 1e5 * c * 1.0, rtol=1e-5)


def test_element_reference_forward_contract(small_plate, model):
    """(u_h, detJ, grad_u) shapes match the reference contract
    (src/models.py:316-357)."""
    params = model.init(jax.random.PRNGKey(0), small_plate)
    M = 10
    x_ref = jnp.full((M, 2), 1.0 / 3.0)
    elem_id = jnp.arange(M)
    u_h, det, grad_u = model.apply_domain(params, small_plate, x_ref, elem_id)
    assert u_h.shape == (M, 2)
    assert det.shape == (M,)
    assert grad_u.shape == (M, 2, 2)
    u_e, ds = model.apply_edge(params, small_plate,
                               jnp.asarray([0.5] * 4), jnp.arange(4))
    assert u_e.shape == (4, 2) and ds.shape == (4,)
    assert np.all(np.asarray(ds) > 0)
