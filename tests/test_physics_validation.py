"""Physics validation with correct (non-compat) numerics.

A hole-free plate clamped on the left and pulled by a uniform traction
t = F/L on the right approaches the uniform uniaxial plane-stress state
away from the clamped edge: sigma_xx = t, sigma_yy = sigma_xy = 0,
u_x ~ (t/E) x.  Saint-Venant: the clamp only perturbs a boundary layer of
width ~height near x = 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.ops.elasticity import plane_stress_C, \
    strain_voigt_from_grad, stress_from_strain


@pytest.fixture(scope="module")
def solved_plate():
    E, nu, t = 10e9, 0.3, 100e3 / 1.0
    mesh = ht.proxy_plate_mesh(nx=41, ny=21)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=E, nu=nu, F_total=100e3)
    # freeze coords for a pure quadratic solve to machine convergence
    coords0 = params["coords"]
    loss = lambda p: energy({"u": p["u"], "coords": coords0}, mesh)
    pf, losses = ht.run_lbfgs(loss, {"u": params["u"]}, num_steps=500)
    params = {"u": pf["u"], "coords": coords0}
    return mesh, model, params, (E, nu, t), np.asarray(losses)


def test_energy_matches_clapeyron(solved_plate):
    """At equilibrium the total potential equals -(1/2) x external work."""
    mesh, model, params, (E, nu, t), losses = solved_plate
    energy = ht.PlaneStressEnergy(model=model, E=E, nu=nu, F_total=100e3)
    total = float(energy(params, mesh))
    work = float(energy.edge_energy(params, mesh))
    assert total == pytest.approx(-0.5 * work, rel=1e-3)


def test_uniform_stress_away_from_clamp(solved_plate):
    mesh, model, params, (E, nu, t), _ = solved_plate
    det, grad_u = model.element_fields(params, mesh)
    eps = strain_voigt_from_grad(grad_u)
    sigma = np.asarray(stress_from_strain(eps, plane_stress_C(E, nu)))
    # element centroids
    coords = np.asarray(model.coords(params, mesh))
    cent = coords[np.asarray(mesh.connectivity)].mean(axis=1)
    far = cent[:, 0] > 1.0  # > one plate-height from the clamp
    sxx = sigma[far, 0]
    assert np.median(sxx) == pytest.approx(t, rel=0.02)
    assert np.abs(sigma[far, 1]).max() < 0.1 * t   # sigma_yy ~ 0
    assert np.abs(sigma[far, 2]).max() < 0.1 * t   # sigma_xy ~ 0


def test_displacement_profile(solved_plate):
    """u_x grows ~ (t/E) x away from the clamp; tip displacement close to
    t*L/E."""
    mesh, model, params, (E, nu, t), _ = solved_plate
    u = np.asarray(model.u_full(params, mesh))
    coords = np.asarray(model.coords(params, mesh))
    tip = np.abs(coords[:, 0] - 2.0) < 1e-6
    u_tip = u[tip, 0].mean()
    assert u_tip == pytest.approx(t * 2.0 / E, rel=0.05)


def test_von_mises_uniform_far_field(solved_plate):
    mesh, model, params, (E, nu, t), _ = solved_plate
    from hidenn_fem_tpu.postproc import von_mises_per_element
    vm = np.asarray(von_mises_per_element(model, params, mesh, E, nu))
    coords = np.asarray(model.coords(params, mesh))
    cent = coords[np.asarray(mesh.connectivity)].mean(axis=1)
    far = cent[:, 0] > 1.0
    assert np.median(vm[far]) == pytest.approx(t, rel=0.03)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["hybrid", "delaunay"])
def test_kirsch_howland_stress_concentration(backend):
    """A circular hole in a pulled plate concentrates stress by the
    Kirsch/Howland factor — a sharp analytic check the staircase-hole
    structured meshes cannot resolve, enabled by the exact circular
    rims of the hybrid (mesh/hybrid.py) and Delaunay (mesh/delaunay.py)
    backends.

    One hole of diameter 0.2 centered in the 2x1 plate under remote
    uniaxial tension t = F/L (the reference's example-4 BC family,
    ``/root/reference/examples/example4.py:14-26``, with a single
    centered hole): finite-width theory (Heywood's fit to Howland's
    series, d/W = 0.2) puts the peak rim stress at

        sigma_max = (2 + (1 - d/W)^3) / (1 - d/W) * t = 3.14 * t

    at the top/bottom of the rim, where the stress state is uniaxial
    hoop tension, so peak von Mises == sigma_max.  P1 centroid recovery
    at lc = 0.012 measures 0.966 (hybrid) / 0.976 (Delaunay) of that
    value — converging to 1.002 at lc = 0.006 (probe, r3) — with the
    argmax element ON the rim's top/bottom.  Asserts magnitude within
    [0.91, 1.05] and location within 2*lc of the analytic point."""
    E, nu, t = 10e9, 0.3, 1e5
    a, cx, cy = 0.1, 1.0, 0.5
    lc = 0.012
    gen = (ht.generate_mesh_hybrid if backend == "hybrid"
           else ht.generate_mesh_delaunay)
    mesh = gen(holes=((cx, cy, a),), lc=lc)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=E, nu=nu,
                                  F_total=100e3)
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    sol, hist = ht.aux_pcg_solve(loss, {"u": params["u"]},
                                 (coords0, mesh), mesh=mesh,
                                 max_iters=100, tol=1e-6)
    h = np.asarray(hist)
    assert h[h > 0][-1] < 1e-6
    params = {"u": sol["u"], "coords": coords0}

    det, grad_u = model.element_fields(params, mesh)
    sigma = np.asarray(stress_from_strain(
        strain_voigt_from_grad(grad_u), plane_stress_C(E, nu)))
    sxx, syy, sxy = sigma[:, 0], sigma[:, 1], sigma[:, 2]
    vm = np.sqrt(sxx**2 - sxx * syy + syy**2 + 3 * sxy**2)

    d_w = 2 * a / 1.0
    sigma_max = (2 + (1 - d_w)**3) / (1 - d_w) * t
    i = int(np.argmax(vm))
    assert 0.91 * sigma_max <= vm[i] <= 1.05 * sigma_max, (
        vm[i] / sigma_max)

    coords = np.asarray(model.coords(params, mesh))
    cent = coords[np.asarray(mesh.connectivity)].mean(axis=1)
    d_top = np.hypot(cent[i, 0] - cx, cent[i, 1] - (cy + a))
    d_bot = np.hypot(cent[i, 0] - cx, cent[i, 1] - (cy - a))
    assert min(d_top, d_bot) < 2 * lc, cent[i]
