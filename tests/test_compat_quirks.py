"""Each reference quirk reproduced by compat mode, isolated and
quantified (they are validated collectively by the LBFGS-plateau parity
test; these pin the individual mechanisms)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.ops import quadrature as quad


def _plate(nx=9, ny=5):
    mesh = ht.proxy_plate_mesh(nx=nx, ny=ny)
    model_e = ht.TriangleP1()
    params = model_e.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    return mesh, params


def test_e3_legacy_edge_rule_doubles_traction_work():
    """Reference edge rule ([-1,1] points as xi, weights summing to 2)
    doubles the work of a *constant* u_x field exactly."""
    mesh, params = _plate()
    c = 1e-4
    params["u"] = jnp.tile(jnp.asarray([c, 0.0], jnp.float32),
                           (mesh.n_nodes, 1))
    model = ht.TriangleP1()
    w_exact = float(ht.PlaneStressEnergy(model=model)
                    .edge_energy(params, mesh))
    model_r = ht.TriangleP1(compat="reference")
    w_ref = float(ht.PlaneStressEnergy(model=model_r, compat="reference")
                  .edge_energy(params, mesh))
    assert w_ref == pytest.approx(2.0 * w_exact, rel=1e-5)


def test_e7_reference_order4_weights_halved():
    """Compat order-4 domain energy is exactly half the correct one (the
    reference's double-scaled rule); the Jacobian-transpose quirk is
    excluded by keeping the model exact."""
    mesh, params = _plate()
    model = ht.TriangleP1()
    e_exact = ht.PlaneStressEnergy(model=model, gauss_order=4,
                                   assembly="quadrature")
    e_ref = ht.PlaneStressEnergy(model=model, gauss_order=4,
                                 assembly="quadrature", compat="reference")
    d1 = float(e_exact.domain_energy(params, mesh))
    d2 = float(e_ref.domain_energy(params, mesh))
    assert d2 == pytest.approx(0.5 * d1, rel=1e-5)


def test_e8_body_force_coordinates():
    """Exact mode feeds physical points to the body force; compat feeds
    reference-triangle coordinates (x in [0,1]^2 regardless of geometry)."""
    mesh, params = _plate()
    seen = {}

    def bf(x):
        seen["max_x"] = float(jnp.max(x[:, 0]))
        return jnp.zeros_like(x)

    model = ht.TriangleP1()
    ht.PlaneStressEnergy(model=model, body_force=bf,
                         assembly="quadrature").domain_energy(params, mesh)
    assert seen["max_x"] > 1.5  # plate is 2 long: physical coords
    ht.PlaneStressEnergy(model=model, body_force=bf, compat="reference",
                         assembly="quadrature").domain_energy(params, mesh)
    assert seen["max_x"] < 1.0  # reference-triangle coords


def test_e9_transpose_convention_single_element():
    """For a linear field u = A x on one non-right-symmetric triangle:
    the exact convention recovers grad_u == A (chain rule / patch test);
    the compat convention reproduces the reference's J^{-1} D_N result,
    which differs whenever J is non-symmetric."""
    from hidenn_fem_tpu.mesh.types import TriMesh
    verts = np.asarray([[0.0, 0.0], [1.0, 0.2], [0.3, 1.0]], np.float32)
    mesh = TriMesh.from_arrays(verts, np.asarray([[0, 1, 2]]))
    A = np.asarray([[2e-3, -1e-3], [5e-4, 3e-3]], np.float32)
    u_nodes = verts @ A.T
    x_ref = jnp.asarray([[1 / 3, 1 / 3]], jnp.float32)

    for compat in ("exact", "reference"):
        model = ht.TriangleP1(compat=compat)
        params = {"coords": jnp.asarray(verts), "u": jnp.asarray(u_nodes)}
        _, det, grad_u = model.apply_domain(params, mesh, x_ref,
                                            jnp.asarray([0]))
        grad_u = np.asarray(grad_u[0])
        if compat == "exact":
            np.testing.assert_allclose(grad_u, A, rtol=1e-4)
        else:
            # the reference computes grad_ref[i,j] = sum_a u[a,i] *
            # (J^{-1} D_N)[j,a]; equal to A only for symmetric J
            J = np.stack([verts[0] - verts[2], verts[1] - verts[2]],
                         axis=1)
            D_N = np.asarray([[1.0, 0, -1], [0, 1, -1]], np.float32)
            dN_ref = np.linalg.inv(J) @ D_N
            u3 = np.stack([u_nodes[0], u_nodes[1], u_nodes[2]])
            grad_expect = np.einsum("ai,ja->ij", u3, dN_ref)
            np.testing.assert_allclose(grad_u, grad_expect, rtol=1e-4)
            assert not np.allclose(grad_u, A, rtol=1e-2)


def test_energy_exact_for_linear_field():
    """Analytic check: for u = A x the strain energy equals
    area * density(A) exactly (any quadrature order)."""
    from hidenn_fem_tpu.mesh.types import TriMesh
    m0 = ht.proxy_plate_mesh(nx=9, ny=5)
    mesh = TriMesh.from_arrays(np.asarray(m0.coords),
                               np.asarray(m0.connectivity))
    A = np.array([[2e-4, 5e-5], [-1e-4, 3e-4]], np.float32)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = jnp.asarray(np.asarray(mesh.coords) @ A.T)
    E, nu = 10e9, 0.3
    f = E / (1 - nu ** 2)
    exx, eyy = A[0, 0], A[1, 1]
    gxy = A[0, 1] + A[1, 0]
    dens = 0.5 * (f * (exx ** 2 + eyy ** 2 + 2 * nu * exx * eyy)
                  + f * (1 - nu) / 2 * gxy ** 2)
    area = 2.0 * 1.0
    for order in (1, 3, 4, 6, 7):
        e = ht.PlaneStressEnergy(model=model, E=E, nu=nu,
                                 gauss_order=order)
        got = float(e.domain_energy(params, mesh))
        assert got == pytest.approx(area * dens, rel=1e-4), order
