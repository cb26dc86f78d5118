"""Figure-level parity vs a REAL reference run (VERDICT r2 #9).

SURVEY §4 names the reference's ``figures/*.png`` as its de-facto
expected outputs.  ``tools/make_reference_snapshot.py`` runs the actual
reference implementation (torch, imported from /root/reference) on the
measured-baseline proxy plate with the example-4 LBFGS recipe and
stores the fields those figures render (nodal displacements, centroid
von Mises).  This test re-solves the same problem with THIS framework
in reference-compat mode and asserts quantitative field agreement:

* max von Mises magnitude within 2% and location within one element
  diameter (the stress-concentration figure's content);
* displacement extrema within 2% (the displacement-magnitude figure);
* the energy plateau itself (the convergence claim).
"""

import os

import jax
import numpy as np
import pytest

import hidenn_fem_tpu as ht

_SNAP = os.path.join(os.path.dirname(__file__), "data",
                     "reference_snapshot_81x41.npz")

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(_SNAP),
                    reason="reference snapshot not generated "
                           "(tools/make_reference_snapshot.py)")
def test_von_mises_field_parity():
    snap = np.load(_SNAP)
    mesh = ht.proxy_plate_mesh(nx=81, ny=41)
    model = ht.TriangleP1(compat="reference")
    energy = ht.PlaneStressEnergy(model=model, compat="reference")
    params = model.init(jax.random.PRNGKey(0), mesh)
    params, losses = ht.run_lbfgs(energy.total, params, num_steps=600,
                                  loss_args=(mesh,))

    # energy plateau: same minimum as the reference run
    ref_loss = float(snap["final_loss"])
    assert np.isclose(float(losses[-1]), ref_loss,
                      rtol=2e-3), (float(losses[-1]), ref_loss)

    # centroid von Mises exactly as the reference's plot computes it
    det, grad_u = model.element_fields(params, mesh)
    grad_u = np.asarray(grad_u)
    eps_xx = grad_u[:, 0, 0]
    eps_yy = grad_u[:, 1, 1]
    eps_xy = 0.5 * (grad_u[:, 0, 1] + grad_u[:, 1, 0])
    E, nu = 10e9, 0.3
    sxx = E / (1 - nu ** 2) * (eps_xx + nu * eps_yy)
    syy = E / (1 - nu ** 2) * (eps_yy + nu * eps_xx)
    sxy = E / (1 + nu) * eps_xy
    vm = np.sqrt(sxx ** 2 - sxx * syy + syy ** 2 + 3 * sxy ** 2)
    vm_ref = np.asarray(snap["von_mises"])

    # max-concentration magnitude within 2%
    assert np.isclose(vm.max(), vm_ref.max(), rtol=2e-2), (
        vm.max(), vm_ref.max())
    # ... and location within one element diameter (element centroids
    # of the two argmax elements)
    conn = np.asarray(mesh.connectivity)
    coords = np.asarray(model.coords(params, mesh))
    cent = coords[conn].mean(axis=1)
    cent_ref = np.asarray(snap["coords"])[
        np.asarray(snap["connectivity"])].mean(axis=1)
    d = np.linalg.norm(cent[vm.argmax()] - cent_ref[vm_ref.argmax()])
    h = 2.0 / 80.0  # lattice spacing
    assert d <= 2.0 * h, (d, h)

    # displacement extrema within 2% (the displacement-magnitude figure)
    u = np.asarray(model.u_full(params, mesh))
    u_ref = np.asarray(snap["u_full"])
    assert np.isclose(np.abs(u[:, 0]).max(), np.abs(u_ref[:, 0]).max(),
                      rtol=2e-2)
    assert np.isclose(np.linalg.norm(u, axis=1).max(),
                      np.linalg.norm(u_ref, axis=1).max(), rtol=2e-2)

    # whole-field agreement in the bulk: median |vm - vm_ref| well under
    # the concentration scale (pointwise equality is not expected — the
    # two runs take different optimization paths over a non-convex
    # r-adaptive landscape)
    assert np.median(np.abs(vm - vm_ref)) <= 0.05 * vm_ref.max()
