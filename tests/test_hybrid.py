"""Hybrid lattice+collar meshes (mesh/hybrid.py): generation
invariants, route equality against the generic assembly, and solve
behavior.  The hybrid route must be *numerically invisible*: same
energy and both gradient groups as evaluating the full connectivity
through the generic gather path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidenn_fem_tpu.mesh import generate_mesh_hybrid
from hidenn_fem_tpu.mesh.hybrid import _shoelace, _walk_circle, _lc_fn
from hidenn_fem_tpu.models.triangle_p1 import TriangleP1
from hidenn_fem_tpu.ops.losses import PlaneStressEnergy

HOLES = ((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1))


def _mesh(lc=0.05, variant="up", holes=HOLES):
    return generate_mesh_hybrid(lc=lc, variant=variant, holes=holes)


def _loss(mesh, **kw):
    model = TriangleP1()
    return model, PlaneStressEnergy(model=model, backend="xla", **kw)


# --------------------------------------------------------- generation
def test_route_attached_and_shapes():
    mesh = _mesh()
    hy = mesh.hybrid
    assert hy is not None
    assert hy.lattice.prefix_identity and not hy.lattice.identity
    nx, ny = hy.lattice.nx, hy.lattice.ny
    assert mesh.n_nodes > nx * ny            # rim points appended
    assert hy.extra_conn.shape[0] > 0
    # collar triangles only reference staircase/rim nodes, never dead
    used = np.zeros(mesh.n_nodes, bool)
    used[np.asarray(mesh.connectivity)] = True
    assert used[np.asarray(hy.extra_conn)].all()


def test_all_detj_positive_and_area_conserved():
    mesh = _mesh()
    model, _ = _loss(mesh)
    params = model.init(jax.random.PRNGKey(0), mesh)
    det, _ = model.element_fields(params, mesh)
    det = np.asarray(det)
    assert (det > 0).all()
    area = 0.5 * det.sum()
    lcf = _lc_fn(0.05)
    rim = sum(abs(_shoelace(_walk_circle(cx, cy, r, lcf)))
              for cx, cy, r in HOLES)
    assert np.isclose(area, 2.0 * 1.0 - rim, rtol=1e-5)


def test_masks_and_edges():
    mesh = _mesh()
    c = np.asarray(mesh.coords)
    bc = np.asarray(mesh.dirichlet_mask)
    mn = np.asarray(mesh.neumann_mask)
    geom = np.asarray(mesh.geom_boundary_mask)
    ny = mesh.hybrid.lattice.ny
    # left face Dirichlet, right face Neumann (reference conventions)
    assert bc[np.abs(c[:, 0]) < 1e-8].all()
    assert mn[np.abs(c[:, 0] - 2.0) < 1e-8].all()
    # rim nodes are geometric boundary (frozen under r-adaptivity)
    n_lat = mesh.hybrid.lattice.nx * ny
    assert geom[n_lat:].all()
    # every right-face segment present as a Neumann edge
    assert mesh.neumann_edges.shape[0] == ny - 1
    # pinned (dead/clearance) nodes are Dirichlet and never referenced
    used = np.zeros(mesh.n_nodes, bool)
    used[np.asarray(mesh.connectivity)] = True
    assert bc[~used].all() and geom[~used].all() and not mn[~used].any()


def test_hole_touching_boundary_raises():
    with pytest.raises(ValueError):
        generate_mesh_hybrid(lc=0.05, holes=((0.05, 0.5, 0.12),))


def test_holefree_is_pure_lattice():
    mesh = generate_mesh_hybrid(lc=0.1, holes=())
    assert mesh.hybrid.extra_conn.shape[0] == 0
    assert mesh.hybrid.lattice.all_present
    assert mesh.n_nodes == mesh.hybrid.lattice.nx * mesh.hybrid.lattice.ny


# ----------------------------------------------------- route equality
@pytest.mark.parametrize("variant", ["up", "down", "zigzag"])
def test_energy_equals_generic_path(variant):
    mesh = _mesh(lc=0.075, variant=variant)
    model, loss = _loss(mesh)
    params = model.init(jax.random.PRNGKey(1), mesh)
    # make the field non-trivial so strains are O(1)
    params = {**params,
              "u": params["u"] + 1e-3 * jnp.sin(
                  jnp.asarray(mesh.coords) * 3.0)}
    generic_mesh = dataclasses.replace(mesh, hybrid=None)

    e_route = loss.total(params, mesh)
    e_gen = loss.total(params, generic_mesh)
    assert mesh.hybrid is not None
    np.testing.assert_allclose(e_route, e_gen, rtol=2e-5)

    g_route = jax.grad(lambda p: loss.total(p, mesh))(params)
    g_gen = jax.grad(lambda p: loss.total(p, generic_mesh))(params)
    for k in ("u", "coords"):
        np.testing.assert_allclose(np.asarray(g_route[k]),
                                   np.asarray(g_gen[k]),
                                   rtol=5e-4, atol=5e-3)


def test_route_is_actually_taken():
    mesh = _mesh(lc=0.075)
    model, loss = _loss(mesh)
    params = model.init(jax.random.PRNGKey(2), mesh)
    assert loss._hybrid_total(params, mesh) is not None
    # body force and custom traction ride the route (r3)
    loss_bf = dataclasses.replace(loss, body_force=lambda x: x)
    assert loss_bf._hybrid_total(params, mesh) is not None
    loss_tr = dataclasses.replace(
        loss, traction=lambda x: jnp.ones_like(x))
    assert loss_tr._hybrid_total(params, mesh) is not None
    # and falls back cleanly when conditions don't hold
    loss_c = dataclasses.replace(loss, assembly="quadrature")
    assert loss_c._hybrid_total(params, mesh) is None
    assert np.isfinite(float(loss_c.total(params, mesh)))


def test_traction_callable_matches_generic_path():
    """A custom traction callable keeps the domain on the hybrid route
    (the O(boundary) edge term evaluates generically) and matches the
    generic assembly."""
    mesh = _mesh(lc=0.075)
    model = TriangleP1()
    loss = PlaneStressEnergy(
        model=model, backend="xla",
        traction=lambda x: jnp.stack(
            [1e5 * (1.0 + 0.3 * x[:, 1]), 2e4 * jnp.ones(x.shape[0])],
            axis=1))
    params = model.init(jax.random.PRNGKey(1), mesh)
    params = {**params,
              "u": params["u"] + 1e-3 * jnp.sin(
                  jnp.asarray(mesh.coords) * 3.0)}
    generic_mesh = dataclasses.replace(mesh, hybrid=None)
    assert loss._hybrid_total(params, mesh) is not None
    np.testing.assert_allclose(loss.total(params, mesh),
                               loss.total(params, generic_mesh),
                               rtol=2e-5)
    g_route = jax.grad(lambda p: loss.total(p, mesh))(params)
    g_gen = jax.grad(lambda p: loss.total(p, generic_mesh))(params)
    for k in ("u", "coords"):
        np.testing.assert_allclose(np.asarray(g_route[k]),
                                   np.asarray(g_gen[k]),
                                   rtol=5e-4, atol=5e-3)


def test_body_force_matches_generic_path():
    """body_force != None must stay on the hybrid route (no silent
    gather-path cliff) and match the generic assembly — value and both
    gradient groups — including the collar elements' work term."""
    mesh = _mesh(lc=0.075)
    model = TriangleP1()
    loss = PlaneStressEnergy(
        model=model, backend="xla",
        body_force=lambda x: jnp.stack(
            [jnp.sin(x[:, 0]) * 1e4, x[:, 1] * 2e4], axis=1))
    params = model.init(jax.random.PRNGKey(1), mesh)
    params = {**params,
              "u": params["u"] + 1e-3 * jnp.sin(
                  jnp.asarray(mesh.coords) * 3.0)}
    generic_mesh = dataclasses.replace(mesh, hybrid=None)

    assert loss._hybrid_total(params, mesh) is not None
    e_route = loss.total(params, mesh)
    e_gen = loss.total(params, generic_mesh)
    np.testing.assert_allclose(e_route, e_gen, rtol=2e-5)
    g_route = jax.grad(lambda p: loss.total(p, mesh))(params)
    g_gen = jax.grad(lambda p: loss.total(p, generic_mesh))(params)
    for k in ("u", "coords"):
        np.testing.assert_allclose(np.asarray(g_route[k]),
                                   np.asarray(g_gen[k]),
                                   rtol=5e-4, atol=5e-3)


def test_radapt_gradients_flow_and_pins_hold():
    mesh = _mesh(lc=0.075)
    model, loss = _loss(mesh)
    params = model.init(jax.random.PRNGKey(3), mesh)
    g = jax.grad(lambda p: loss.total(p, mesh))(params)
    geom = np.asarray(mesh.geom_boundary_mask)
    gc = np.asarray(g["coords"])
    assert (gc[geom] == 0).all()            # pinned geometry
    assert np.abs(gc[~geom]).max() > 0      # interior nodes adapt
    gu = np.asarray(g["u"])
    bc = np.asarray(mesh.dirichlet_mask)
    assert (gu[bc] == 0).all()
    used = np.zeros(mesh.n_nodes, bool)
    used[np.asarray(mesh.connectivity)] = True
    assert (gu[~used] == 0).all()


# ----------------------------------------------------------- solving
@pytest.mark.slow
def test_aux_pcg_matches_delaunay_iterations():
    """The pinned dead lattice nodes must NOT degrade the aux-space
    preconditioner: rasterizing them as background Dirichlet used to
    stamp blobs over the hole regions and kill the coarse correction
    there (100-iter stall vs 32 on the node-free Delaunay mesh of the
    same geometry).  build_aux_preconditioner now masks Dirichlet to
    element-referenced nodes; iteration counts must match Delaunay."""
    import hidenn_fem_tpu as ht
    from hidenn_fem_tpu.models.structured_grid import StructuredGridP1

    iters = {}
    for name, gen in (
            ("hybrid", lambda: generate_mesh_hybrid(lc=0.0252)),
            ("delaunay", lambda: ht.generate_mesh_delaunay(lc=0.0252))):
        mesh = gen()
        model = TriangleP1()
        params = model.init(jax.random.PRNGKey(0), mesh)
        energy = PlaneStressEnergy(model=model, E=10e9, nu=0.3)
        coords0 = params["coords"]

        def loss(p, coords, m):
            return energy({"u": p["u"], "coords": coords}, m)

        up = {"u": params["u"]}
        bg = StructuredGridP1(E=10e9, nu=0.3)
        pre = ht.build_aux_preconditioner(loss, up, (coords0, mesh),
                                          mesh, bg_model=bg)
        _, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                   bg_model=bg, max_iters=100, tol=1e-6)
        h = np.asarray(hist)
        nz = h[h > 0]
        assert nz[-1] < 1e-6, f"{name} stalled at {nz[-1]:.2e}"
        iters[name] = len(nz)
    assert abs(iters["hybrid"] - iters["delaunay"]) <= 5, iters


@pytest.mark.slow
def test_lbfgs_solve_decreases_and_is_finite():
    from hidenn_fem_tpu.solve.drivers import minimize
    mesh = _mesh(lc=0.075)
    model, loss = _loss(mesh)
    params = model.init(jax.random.PRNGKey(4), mesh)
    u_only = {"u": params["u"]}

    def u_loss(p, m):
        return loss.total({"u": p["u"], "coords": params["coords"]}, m)

    out, hist = minimize(u_loss, u_only, method="lbfgs", num_steps=80,
                         loss_args=(mesh,))
    hist = np.asarray(hist)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]
    assert float(hist[-1]) < 0  # traction does work: negative potential


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_collar_energy_matches_generic(dtype):
    """ops/lattice_energy.collar_energy (compact [stair | rim] space,
    sorted-unique big-table access, incidence backward) must equal the
    generic node[conn] collar — value and node-table gradient — in both
    precisions.  The compact tables live on HybridRoute (stair_ids,
    extra_conn_rel, extra_incidence)."""
    from hidenn_fem_tpu.ops.lattice_energy import (collar_energy,
                                                   extra_elements_energy)
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    try:
        mesh = _mesh(lc=0.06, holes=((1.0, 0.5, 0.25),))
        hy = mesh.hybrid
        assert hy.extra_conn.shape[0] > 0
        assert int(hy.stair_ids.shape[0]) > 0
        # stair ids: sorted, unique, all lattice-block
        s = np.asarray(hy.stair_ids)
        assert (np.diff(s) > 0).all()
        assert s.max() < hy.lattice.nx * hy.lattice.ny
        node = jax.random.normal(jax.random.PRNGKey(3),
                                 (mesh.n_nodes, 4), dtype=dtype)

        def e_ref(n):
            return extra_elements_energy(n, hy.extra_conn, 10e9, 0.3,
                                         0.5)

        def e_fast(n):
            return collar_energy(n, hy, 10e9, 0.3, 0.5)

        v0, g0 = jax.value_and_grad(e_ref)(node)
        v1, g1 = jax.value_and_grad(e_fast)(node)
        rtol = 1e-12 if dtype == "float64" else 1e-5
        assert np.isclose(float(v0), float(v1), rtol=rtol)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g0), rtol=10 * rtol,
            atol=float(np.abs(np.asarray(g0)).max()) * rtol)
    finally:
        if dtype == "float64":
            jax.config.update("jax_enable_x64", False)
