"""Native Delaunay mesher tests — the gmsh-free unstructured backend
(``mesh/delaunay.py``), covering the reference's default example-4 mesh
source capability (``/root/reference/src/mesh.py:8-153``) without gmsh:
contract, element quality, genuinely-unstructured routing, a patch test
of the energy pipeline on an irregular mesh, and a solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.delaunay import (generate_mesh_delaunay,
                                          generate_mesh_unstructured)

HOLES = ((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1))


def _signed_areas(mesh):
    c = np.asarray(mesh.coords, dtype=np.float64)
    v = c[np.asarray(mesh.connectivity)]
    return 0.5 * ((v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
                  - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1]))


def _min_angles_deg(mesh):
    c = np.asarray(mesh.coords, dtype=np.float64)
    v = c[np.asarray(mesh.connectivity)]
    angs = []
    for i in range(3):
        e1 = v[:, (i + 1) % 3] - v[:, i]
        e2 = v[:, (i + 2) % 3] - v[:, i]
        cos = ((e1 * e2).sum(1)
               / (np.linalg.norm(e1, axis=1) * np.linalg.norm(e2, axis=1)))
        angs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
    return np.stack(angs, 1).min(1)


def test_contract_plate_with_holes():
    """Reference example-4 configuration: masks, edges, orientation,
    quality, and the genuinely-unstructured route."""
    mesh = generate_mesh_delaunay(holes=HOLES, lc=0.08)

    a = _signed_areas(mesh)
    assert (a > 0).all()                       # CCW / detJ > 0
    assert _min_angles_deg(mesh).min() > 15.0  # no slivers

    # mesh area ~ rect minus (polygonal) holes
    hole_area = sum(np.pi * r * r for _, _, r in HOLES)
    assert abs(a.sum() - (2.0 - hole_area)) < 0.02

    coords = np.asarray(mesh.coords)
    dir_m = np.asarray(mesh.dirichlet_mask)
    mn_m = np.asarray(mesh.neumann_mask)
    assert dir_m.sum() > 2 and (np.abs(coords[dir_m, 0]) < 1e-6).all()
    assert mn_m.sum() > 2 and (np.abs(coords[mn_m, 0] - 2.0) < 1e-6).all()
    ne = np.asarray(mesh.neumann_edges)
    assert len(ne) == mn_m.sum() - 1           # a chain up the right face
    assert mn_m[ne].all()

    # hole rims are geometric boundary
    gb = np.asarray(mesh.geom_boundary_mask)
    for cx, cy, r in HOLES:
        on_rim = np.abs(np.hypot(coords[:, 0] - cx,
                                 coords[:, 1] - cy) - r) < 1e-6
        assert on_rim.sum() >= 12 and gb[on_rim].all()

    # genuinely unstructured: lattice detection must reject
    assert mesh.lattice is None

    # no dead nodes
    used = np.zeros(coords.shape[0], dtype=bool)
    used[np.asarray(mesh.connectivity)] = True
    assert used.all()


def test_graded_size_field():
    """Callable lc: fine near the left edge, coarse on the right —
    element sizes must follow (the colored-Jacobi PCG scenario)."""
    def lc(p):
        return 0.04 + 0.12 * p[:, 0] / 2.0

    mesh = generate_mesh_delaunay(holes=(), lc=lc, smooth_iters=2)
    a = _signed_areas(mesh)
    assert (a > 0).all()
    cen = np.asarray(mesh.coords)[np.asarray(mesh.connectivity)].mean(1)
    left = a[cen[:, 0] < 0.4]
    right = a[cen[:, 0] > 1.6]
    ratio = np.median(right) / np.median(left)
    assert ratio > 4.0                          # ~ (0.16/0.05)^2 = 10
    assert _min_angles_deg(mesh).min() > 12.0


def test_patch_energy_on_irregular_mesh():
    """Linear displacement field => constant strain: the energy on the
    irregular mesh must equal density * mesh area exactly (P1 elements
    and any-order quadrature are exact for constant strain)."""
    mesh = generate_mesh_delaunay(
        holes=HOLES[:1], lc=0.1,
        boundaries={"up": 0, "down": 0, "right": 0, "left": 0})
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)

    E, nu = 10e9, 0.3
    exx, eyy, gxy = 1e-4, -2e-4, 3e-4
    coords = params["coords"]
    u = jnp.stack([exx * coords[:, 0] + 0.5 * gxy * coords[:, 1],
                   eyy * coords[:, 1] + 0.5 * gxy * coords[:, 0]],
                  axis=1)
    params = dict(params, u=u)

    energy = ht.PlaneStressEnergy(model=model, E=E, nu=nu)
    dom = float(energy.domain_energy(params, mesh))

    f = E / (1 - nu * nu)
    sxx = f * (exx + nu * eyy)
    syy = f * (eyy + nu * exx)
    sxy = f * (1 - nu) / 2 * gxy
    density = 0.5 * (sxx * exx + syy * eyy + sxy * gxy)
    area = _signed_areas(mesh).sum()
    assert dom == pytest.approx(density * area, rel=2e-5)


def test_solve_on_delaunay_mesh():
    """End-to-end: L-BFGS on a real irregular mesh reaches a finite
    plateau with rightward pull under the traction."""
    mesh = generate_mesh_delaunay(holes=HOLES[:1], lc=0.12)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    sol, losses = ht.run_lbfgs(energy.total, params, num_steps=150,
                               loss_args=(mesh,))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert losses[-1] < 0                       # work done by traction
    ux = np.asarray(model.u_full(sol, mesh))[:, 0]
    assert ux.max() > 0                          # pulled to the right


def test_unstructured_dispatcher_falls_back():
    mesh = generate_mesh_unstructured(holes=(), lc=0.2)
    assert _signed_areas(mesh).min() > 0


def test_unstructured_dispatcher_auto_hybridizes():
    """The dispatcher knows the geometry (rectangle + circular holes),
    so without gmsh it returns a hybrid lattice+collar mesh — the fast
    path for the production domain class (VERDICT r3 #1c) — and falls
    back to Delaunay when asked, when the size field is callable, or
    when a hole reaches the boundary ring."""
    holes = ((1.0, 0.5, 0.25),)
    m = generate_mesh_unstructured(holes=holes, lc=0.1)
    assert m.hybrid is not None
    assert _signed_areas(m).min() > 0
    # opt-out
    m2 = generate_mesh_unstructured(holes=holes, lc=0.1,
                                    prefer_hybrid=False)
    assert getattr(m2, "hybrid", None) is None
    # callable size fields are Delaunay-only
    m3 = generate_mesh_unstructured(
        holes=holes, lc=lambda p: 0.1 + 0 * p[:, 0])
    assert getattr(m3, "hybrid", None) is None
    # hole hugging the boundary: hybrid generator refuses, Delaunay runs
    m4 = generate_mesh_unstructured(holes=((0.2, 0.2, 0.19),), lc=0.1)
    assert getattr(m4, "hybrid", None) is None
    assert _signed_areas(m4).min() > 0


def test_radapt_aux_on_delaunay():
    """r-adaptivity with exact aux-PCG inner solves composes with a
    genuinely irregular mesh: monotone equilibrated energies, moved
    coordinates, no inverted elements."""
    from hidenn_fem_tpu.models.structured_grid import StructuredGridP1
    from hidenn_fem_tpu.solve.auxspace import radapt_aux_solve

    mesh = generate_mesh_delaunay(holes=HOLES[:1], lc=0.15)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    pf, energies = radapt_aux_solve(
        energy, params, mesh, loss_args=(mesh,),
        bg_model=StructuredGridP1(E=10e9, nu=0.3), outer_epochs=3,
        pcg_iters=80, coord_steps=10, coord_lr=1e-4)
    e = np.asarray(energies)
    assert np.all(np.isfinite(e))
    assert np.all(e[1:] <= e[:-1] + 1e-6 * np.abs(e[:-1]))
    assert float(jnp.max(jnp.abs(pf["coords"] - params["coords"]))) > 0
    import dataclasses
    moved = dataclasses.replace(mesh)
    c = np.asarray(model.coords(pf, mesh))
    v = c[np.asarray(moved.connectivity)]
    area2 = ((v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
             - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1]))
    assert (area2 > 0).all()                    # no inversions


def test_sharded_banded_energy_on_delaunay(eight_devices):
    """The multi-chip fast path (reband_for_shards +
    shard_map_banded_energy) composes with a real irregular mesh:
    sharded loss and gradients match single-device."""
    import dataclasses

    from hidenn_fem_tpu.parallel import sharding as sh

    mesh = generate_mesh_delaunay(holes=HOLES[:1], lc=0.06)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    dmesh = sh.device_mesh(8)
    banded = sh.reband_for_shards(mesh, 8, window_limit=800)
    loss_fn = sh.shard_map_banded_energy(energy, dmesh)
    single = dataclasses.replace(mesh, banded=None)
    v_sh, g_sh = jax.jit(jax.value_and_grad(loss_fn))(params, banded)
    v_ref, g_ref = jax.value_and_grad(
        lambda p: energy(p, single))(params)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-5)
    # irregular meshes have worse f32 reduction-order cancellation than
    # the proxy-lattice case (observed max 7e-4 rel on 1/1332 entries)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_sh[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=2e-3, atol=1e-9)
