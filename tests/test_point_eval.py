"""Physical-point location + evaluation for the unstructured model."""

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.postproc import evaluate_at_points, locate_points


def test_locate_points_roundtrip():
    mesh = ht.proxy_plate_mesh(nx=9, ny=5)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(0.05, 1.95, 40),
                    rng.uniform(0.05, 0.95, 40)], axis=1)
    elem_id, ref = locate_points(np.asarray(mesh.coords),
                                 np.asarray(mesh.connectivity), pts)
    assert np.all(elem_id >= 0)
    # barycentric coords are valid
    assert np.all(ref >= -1e-9) and np.all(ref.sum(1) <= 1 + 1e-6)
    # reconstruct physical points from (elem, ref)
    v = np.asarray(mesh.coords)[np.asarray(mesh.connectivity)[elem_id]]
    rec = (ref[:, :1] * v[:, 0] + ref[:, 1:2] * v[:, 1]
           + (1 - ref.sum(1, keepdims=True)) * v[:, 2])
    np.testing.assert_allclose(rec, pts, atol=1e-6)


def test_evaluate_linear_field_at_points():
    from hidenn_fem_tpu.mesh.types import TriMesh
    m0 = ht.proxy_plate_mesh(nx=9, ny=5)
    mesh = TriMesh.from_arrays(np.asarray(m0.coords),
                               np.asarray(m0.connectivity))
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    A = np.asarray([[1e-3, 2e-4], [-3e-4, 5e-4]], np.float32)
    params["u"] = jnp.asarray(np.asarray(mesh.coords) @ A.T)
    pts = np.asarray([[0.3, 0.4], [1.7, 0.9], [0.99, 0.51]])
    u = np.asarray(evaluate_at_points(model, params, mesh, pts))
    np.testing.assert_allclose(u, pts @ A.T, rtol=1e-4, atol=1e-8)


def test_outside_points_are_nan():
    mesh = ht.generate_mesh(nx=20, ny=10)   # with holes
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    pts = np.asarray([[1.0, 0.3],     # inside a hole
                      [-0.5, 0.5],    # outside the plate
                      [0.1, 0.1]])    # valid
    u = np.asarray(evaluate_at_points(model, params, mesh, pts))
    assert np.all(np.isnan(u[0])) and np.all(np.isnan(u[1]))
    assert np.all(np.isfinite(u[2]))
