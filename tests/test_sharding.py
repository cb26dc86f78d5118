"""Multi-chip (8 virtual CPU devices) sharding tests.

SURVEY.md §4's fake-backend strategy: shard an element batch over an
8-device mesh and assert the loss (and gradients) match the single-device
computation to float tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.parallel import sharding as sh

# multi-minute suite (8-device sharded solves) -> excluded from the quick lane
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    # lattice route stripped: this module tests the sharded
    # UNSTRUCTURED paths, whose single-device comparisons must run the
    # same gather-based assembly (the route reassociates differently)
    mesh = dataclasses.replace(ht.proxy_plate_mesh(nx=17, ny=9),
                               lattice=None)  # 256 elements
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    return mesh, tp1, params, energy


def test_pad_mesh_zero_contribution(setup):
    mesh, tp1, params, energy = setup
    padded = sh.pad_mesh(mesh, 7)  # force real padding
    assert padded.n_elements % 7 == 0
    assert padded.n_elements > mesh.n_elements
    e0 = float(energy(params, mesh))
    e1 = float(energy(params, padded))
    assert np.isclose(e0, e1, rtol=1e-6), (e0, e1)
    g0 = jax.grad(lambda p: energy(p, mesh))(params)
    g1 = jax.grad(lambda p: energy(p, padded))(params)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-12)


def test_gspmd_sharded_energy_matches(setup, eight_devices):
    mesh, tp1, params, energy = setup
    dmesh = sh.device_mesh(8)
    smesh = sh.shard_mesh(mesh, dmesh)
    sparams = sh.replicate(params, dmesh)

    e_single = float(energy(params, mesh))
    e_sharded = float(jax.jit(lambda p: energy(p, smesh))(sparams))
    assert np.isclose(e_single, e_sharded, rtol=1e-5)

    g0 = jax.grad(lambda p: energy(p, mesh))(params)
    g1 = jax.jit(jax.grad(lambda p: energy(p, smesh)))(sparams)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=2e-4, atol=1e-10)


def test_shard_mesh_clears_derived_tables(setup, eight_devices):
    """Regression (r4 advisor, high): a mesh carrying banded + paired
    (+ hybrid) tables — what from_arrays auto-builds for every big mesh —
    must shard cleanly; shard_mesh strips every derived single-device
    table so the sharded pytree matches mesh_shardings' spec."""
    mesh, tp1, params, energy = setup
    forced = ht.TriMesh.from_arrays(
        np.asarray(mesh.coords), np.asarray(mesh.connectivity),
        np.asarray(mesh.geom_boundary_mask),
        np.asarray(mesh.dirichlet_mask), np.asarray(mesh.neumann_mask),
        np.asarray(mesh.neumann_edges), build_banded=True)
    assert forced.banded is not None
    assert forced.banded_paired is not None  # the r4 crash precondition
    dmesh = sh.device_mesh(8)
    smesh = sh.shard_mesh(forced, dmesh)     # raised ValueError before fix
    for f in ("incidence", "banded", "banded_paired", "lattice", "hybrid",
              "fused_connectivity", "fused_incidence"):
        assert getattr(smesh, f) is None, f
    sparams = sh.replicate(params, dmesh)
    e_sharded = float(jax.jit(lambda p: energy(p, smesh))(sparams))
    assert np.isclose(float(energy(params, mesh)), e_sharded, rtol=1e-5)
    # shard_map_energy must likewise strip them inside loss_fn
    padded = sh.pad_mesh(forced, 8)
    loss_fn = sh.shard_map_energy(energy, dmesh)
    e2 = float(jax.jit(loss_fn)(params, padded))
    assert np.isclose(float(energy(params, mesh)), e2, rtol=1e-5)


def test_shard_map_energy_matches(setup, eight_devices):
    mesh, tp1, params, energy = setup
    dmesh = sh.device_mesh(8)
    padded = sh.pad_mesh(mesh, 8)
    loss_fn = sh.shard_map_energy(energy, dmesh)
    e_single = float(energy(params, mesh))
    e_sharded = float(jax.jit(loss_fn)(params, padded))
    assert np.isclose(e_single, e_sharded, rtol=1e-5)
    # gradient flows through shard_map + psum
    g = jax.jit(jax.grad(lambda p: loss_fn(p, padded)))(params)
    g0 = jax.grad(lambda p: energy(p, mesh))(params)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g0[k]),
                                   rtol=2e-4, atol=1e-10)


def test_sharded_solve_end_to_end(setup, eight_devices):
    """A short Adam solve on the 8-device mesh tracks the single-device
    solve (same trajectory up to reassociation noise)."""
    mesh, tp1, params, energy = setup
    dmesh = sh.device_mesh(8)
    smesh = sh.shard_mesh(mesh, dmesh)
    sparams = sh.replicate(params, dmesh)

    p1, l1 = ht.minimize(lambda p: energy(p, mesh), params, method="adam",
                         num_steps=50, learning_rate=1e-6)
    p2, l2 = ht.minimize(lambda p: energy(p, smesh), sparams, method="adam",
                         num_steps=50, learning_rate=1e-6)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)


def test_shard_map_banded_energy_matches(eight_devices):
    """The fast-path composition (VERDICT r1 #3): blocked-window Pallas
    energy with block axes sharded over the device mesh — loss AND both
    gradient groups match the single-device computation."""
    mesh = dataclasses.replace(ht.proxy_plate_mesh(nx=65, ny=33),
                               lattice=None)      # 4096 elements
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    dmesh = sh.device_mesh(8)
    # small window to force real multi-block tables on a test-size mesh;
    # pair=False pins this test to the triangle-table layout (the paired
    # layout has its own equality test below, and reband_for_shards only
    # builds the table set that will run)
    banded = sh.reband_for_shards(mesh, 8, window_limit=800, pair=False)
    assert banded.banded.starts.shape[0] % 8 == 0
    assert banded.banded.re_nstarts.shape[0] % 8 == 0

    loss_fn = sh.shard_map_banded_energy(energy, dmesh)
    single = dataclasses.replace(mesh, banded=None)
    v_sh, g_sh = jax.jit(jax.value_and_grad(loss_fn))(params, banded)
    v_ref, g_ref = jax.value_and_grad(
        lambda p: energy(p, single))(params)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-5)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_sh[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=5e-4, atol=1e-9)


def test_shard_map_banded_energy_paired(eight_devices):
    """VERDICT r4 #2: the sharded banded path runs the quad-paired
    tables when reband_for_shards builds them (same layout as the
    single-device production route) — loss and gradients match both the
    single-device paired computation and the XLA reference."""
    mesh = dataclasses.replace(ht.proxy_plate_mesh(nx=65, ny=33),
                               lattice=None)
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    dmesh = sh.device_mesh(8)
    banded = sh.reband_for_shards(mesh, 8, window_limit=800)
    assert banded.banded_paired is not None        # pairing sharded
    assert banded.banded_paired.k == 4
    assert banded.banded_paired.starts.shape[0] % 8 == 0
    assert banded.banded_paired.re_nstarts.shape[0] % 8 == 0

    loss_fn = sh.shard_map_banded_energy(energy, dmesh)
    v_sh, g_sh = jax.jit(jax.value_and_grad(loss_fn))(params, banded)
    single = dataclasses.replace(mesh, banded=None, banded_paired=None)
    v_ref, g_ref = jax.value_and_grad(
        lambda p: energy(p, single))(params)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-5)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_sh[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=5e-4, atol=1e-9)
    # pair=False keeps the triangle-table behavior (escape hatch)
    nopair = sh.reband_for_shards(mesh, 8, window_limit=800, pair=False)
    assert nopair.banded_paired is None
    v_np = float(jax.jit(loss_fn)(params, nopair))
    assert np.isclose(v_np, float(v_ref), rtol=1e-5)


def test_sharded_cg_displacement_solve(eight_devices):
    """Distributed Krylov solve: matrix-free CG whose every matvec is
    the element-sharded banded energy gradient (psum forward,
    communication-free recompute backward).  The solution must match the
    single-device CG solve."""
    mesh = dataclasses.replace(ht.proxy_plate_mesh(nx=33, ny=17),
                               lattice=None)
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    dmesh = sh.device_mesh(8)
    banded = sh.reband_for_shards(mesh, 8, window_limit=800)
    loss_fn = sh.shard_map_banded_energy(energy, dmesh)
    coords0 = params["coords"]

    def u_loss_sharded(p, coords, tri):
        return loss_fn({"u": p["u"], "coords": coords}, tri)

    def u_loss_single(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    up = {"u": params["u"]}
    sol_sh, h_sh = ht.cg_solve(u_loss_sharded, up,
                               loss_args=(coords0, banded),
                               max_iters=600, tol=1e-6)
    single = dataclasses.replace(mesh, banded=None)
    sol_ref, _ = ht.cg_solve(u_loss_single, up,
                             loss_args=(coords0, single),
                             max_iters=600, tol=1e-6)
    h = np.asarray(h_sh)
    assert h[h > 0][-1] <= 1e-6
    scale = float(jnp.max(jnp.abs(sol_ref["u"])))
    assert float(jnp.max(jnp.abs(sol_sh["u"] - sol_ref["u"]))) <= (
        1e-3 * scale)


@pytest.mark.parametrize("engine", ["replicated_coarse", "all"])
def test_sharded_multigrid_matches_single_device(eight_devices, engine):
    """Multi-chip MG (parallel/sharded_mg.py), both engines: dead-row
    padded row sharding with replicated coarse levels, and the
    all-levels-sharded variant (per-level padding) — same iteration
    count and solution as the single-device solve."""
    from hidenn_fem_tpu.models.structured_grid import (
        StructuredGridP1, generate_structured_grid)
    from hidenn_fem_tpu.parallel.sharded_mg import mg_pcg_solve_sharded

    grid = generate_structured_grid(length=2.0, height=1.0, nx=33,
                                    ny=17)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    sol0, h0 = ht.mg_pcg_solve(model, grid, params, max_iters=40,
                               tol=1e-6)
    sol1, h1 = mg_pcg_solve_sharded(model, grid, params, n_devices=8,
                                    max_iters=40, tol=1e-6,
                                    engine=engine)
    h1 = np.asarray(h1)
    assert h1[h1 > 0][-1] <= 1e-6
    it0, it1 = int((np.asarray(h0) > 0).sum()), int((h1 > 0).sum())
    assert abs(it1 - it0) <= 3, (it0, it1)
    s = float(jnp.max(jnp.abs(sol0["u"])))
    assert float(jnp.max(jnp.abs(sol1["u"] - sol0["u"]))) <= 5e-4 * s


def test_sharded_mg_collective_census(eight_devices):
    """The A/B evidence for the all-levels-sharded V-cycle: both engines
    compile to real distributed programs (collective-permute halo
    exchanges present), and the all-sharded engine does not emit more
    collectives than the replicated-coarse one."""
    from hidenn_fem_tpu.models.structured_grid import (
        StructuredGridP1, generate_structured_grid)
    from hidenn_fem_tpu.parallel.sharded_mg import count_collectives

    grid = generate_structured_grid(length=2.0, height=1.0, nx=65,
                                    ny=33)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    c_all = count_collectives(model, grid, params, engine="all")
    c_rep = count_collectives(model, grid, params,
                              engine="replicated_coarse")
    assert c_all["collective-permute"] > 0
    assert c_rep["collective-permute"] > 0
    total = lambda c: sum(c.values())
    assert total(c_all) <= total(c_rep), (c_all, c_rep)


def test_sharded_aux_pcg_matches_single_device(eight_devices):
    """Multi-chip auxiliary-space PCG (parallel/sharded_aux.py): the
    unstructured flagship solver with element-sharded matvecs and a
    replicated preconditioner — same iteration count and solution as
    the single-device aux_pcg_solve."""
    from hidenn_fem_tpu.models.structured_grid import StructuredGridP1
    from hidenn_fem_tpu.parallel.sharded_aux import aux_pcg_solve_sharded
    from hidenn_fem_tpu.solve.auxspace import aux_pcg_solve

    mesh = dataclasses.replace(ht.proxy_plate_mesh(nx=33, ny=17),
                               lattice=None)
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def u_loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    single = dataclasses.replace(mesh, banded=None)
    bg = StructuredGridP1(E=10e9, nu=0.3)
    sol0, h0 = aux_pcg_solve(u_loss, {"u": params["u"]},
                             (coords0, single), mesh=mesh, bg_model=bg,
                             max_iters=100, tol=1e-6)
    sol1, h1 = aux_pcg_solve_sharded(energy, mesh, params, n_devices=8,
                                     max_iters=100, tol=1e-6)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    assert h1[h1 > 0][-1] <= 1e-6
    it0, it1 = int((h0 > 0).sum()), int((h1 > 0).sum())
    # tol=1e-6 sits at the f32 residual floor (CLAUDE.md / SOLVERS):
    # single-device vs 8-shard reduction orders differ, so the last few
    # iterations wobble — observed (50, 47) on the hybrid flavor
    # depending on suite order.  Bound proximity loosely; the solution
    # equality below is the real assertion.
    assert abs(it1 - it0) <= 6, (it0, it1)
    # both ends sit inside the tol=1e-6 residual ball; on this
    # conditioning that allows a few-e-3 relative solution spread
    s = float(jnp.max(jnp.abs(sol0["u"])))
    assert float(jnp.max(jnp.abs(sol1["u"] - sol0["u"]))) <= 5e-3 * s


@pytest.mark.parametrize("kind", ["lattice", "hybrid"])
def test_sharded_aux_pcg_lattice_matvec(eight_devices, kind):
    """aux_pcg_solve_sharded routes lattice-topology and hybrid
    lattice+collar meshes through the row-sharded lattice matvec
    (_sharded_lattice_u_loss) instead of banded tables; iterations and
    solution must match the single-device aux_pcg_solve (whose matvec
    auto-routes the same fast path single-device)."""
    from hidenn_fem_tpu.models.structured_grid import StructuredGridP1
    from hidenn_fem_tpu.parallel.sharded_aux import aux_pcg_solve_sharded
    from hidenn_fem_tpu.solve.auxspace import aux_pcg_solve

    if kind == "lattice":
        mesh = ht.proxy_plate_mesh(nx=33, ny=17)
        assert mesh.lattice is not None
    else:
        mesh = ht.generate_mesh_hybrid(holes=((1.0, 0.5, 0.25),),
                                       lc=0.06)
        assert mesh.lattice is None and mesh.hybrid is not None
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def u_loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    bg = StructuredGridP1(E=10e9, nu=0.3)
    sol0, h0 = aux_pcg_solve(u_loss, {"u": params["u"]},
                             (coords0, mesh), mesh=mesh, bg_model=bg,
                             max_iters=100, tol=1e-6)
    sol1, h1 = aux_pcg_solve_sharded(energy, mesh, params, n_devices=8,
                                     max_iters=100, tol=1e-6)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    assert h1[h1 > 0][-1] <= 1e-6
    it0, it1 = int((h0 > 0).sum()), int((h1 > 0).sum())
    # tol=1e-6 sits at the f32 residual floor (CLAUDE.md / SOLVERS):
    # single-device vs 8-shard reduction orders differ, so the last few
    # iterations wobble — observed (50, 47) on the hybrid flavor
    # depending on suite order.  Bound proximity loosely; the solution
    # equality below is the real assertion.
    assert abs(it1 - it0) <= 6, (it0, it1)
    s = float(jnp.max(jnp.abs(sol0["u"])))
    assert float(jnp.max(jnp.abs(sol1["u"] - sol0["u"]))) <= 5e-3 * s


def test_edge_padding_degenerate_zero(setup):
    """Padded (0,0) edges have ds == 0 and contribute nothing."""
    mesh, tp1, params, energy = setup
    padded = sh.pad_mesh(mesh, 16)
    w0 = float(energy.edge_energy(params, mesh))
    w1 = float(energy.edge_energy(params, padded))
    assert np.isclose(w0, w1, rtol=1e-6)


def test_example7_sharded_small(eight_devices):
    from examples import example7_sharded
    params, losses = example7_sharded.main(nx=33, ny=17, n_devices=8,
                                           lbfgs_steps=40)
    assert np.all(np.isfinite(np.asarray(losses)))


@pytest.mark.parametrize("gen_kwargs", [
    dict(),                                              # identity plate
    dict(holes=((1.0, 0.5, 0.25),)),                     # perm-fill route
    dict(holes=((1.0, 0.5, 0.25),), keep_dead_nodes=True),  # identity+holes
], ids=["plate", "holes_renumbered", "holes_dead_nodes"])
def test_sharded_lattice_energy_matches(eight_devices, gen_kwargs):
    """The row-sharded lattice route (GSPMD dead-quad-row padding,
    parallel/sharded_lattice.py) matches the single-device lattice
    energy — value and both gradient groups — on all three route
    flavors: identity plate, renumbered hole mesh (replicated perm
    fill), and keep_dead_nodes hole mesh (zero gathers)."""
    from hidenn_fem_tpu.mesh.structured import generate_mesh
    from hidenn_fem_tpu.parallel.sharded_lattice import (
        sharded_lattice_energy)

    mesh = generate_mesh(nx=33, ny=17, **gen_kwargs)
    assert mesh.lattice is not None
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    dmesh = sh.device_mesh(8)
    loss_fn = sharded_lattice_energy(energy, dmesh)

    e0 = float(energy(params, mesh))
    e1 = float(jax.jit(loss_fn)(params, mesh))
    assert np.isclose(e0, e1, rtol=1e-5), (e0, e1)
    g0 = jax.grad(lambda p: energy(p, mesh))(params)
    g1 = jax.jit(jax.grad(loss_fn))(params, mesh)
    for k in g0:
        ref = np.asarray(g0[k])
        np.testing.assert_allclose(np.asarray(g1[k]), ref, rtol=5e-4,
                                   atol=1e-6 * max(np.abs(ref).max(),
                                                   1e-30))


def test_sharded_hybrid_energy_matches(eight_devices):
    """Hybrid lattice+collar meshes (mesh/hybrid.py) ride the same
    row-sharded lattice path: the prefix block shards, the O(rim)
    collar gather stays replicated; value and both gradient groups
    must match the single-device hybrid route."""
    from hidenn_fem_tpu.parallel.sharded_lattice import (
        sharded_lattice_energy)

    mesh = ht.generate_mesh_hybrid(holes=((1.0, 0.5, 0.25),), lc=0.06)
    assert mesh.lattice is None and mesh.hybrid is not None
    assert mesh.hybrid.extra_conn.shape[0] > 0
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    dmesh = sh.device_mesh(8)
    loss_fn = sharded_lattice_energy(energy, dmesh)

    e0 = float(energy(params, mesh))
    e1 = float(jax.jit(loss_fn)(params, mesh))
    assert np.isclose(e0, e1, rtol=1e-5), (e0, e1)
    g0 = jax.grad(lambda p: energy(p, mesh))(params)
    g1 = jax.jit(jax.grad(loss_fn))(params, mesh)
    for k in g0:
        ref = np.asarray(g0[k])
        np.testing.assert_allclose(np.asarray(g1[k]), ref, rtol=5e-4,
                                   atol=1e-6 * max(np.abs(ref).max(),
                                                   1e-30))


def test_sharded_lattice_body_force_matches(eight_devices):
    """body_force rides the sharded lattice route (body work from the
    same padded lattice slices, pad quads masked by t1/t2) — value and
    gradients must match the single-device total, on both a keep-dead
    lattice mesh and a hybrid mesh (collar work term included)."""
    from hidenn_fem_tpu.mesh.structured import generate_mesh
    from hidenn_fem_tpu.parallel.sharded_lattice import (
        sharded_lattice_energy)

    bf = lambda x: jnp.stack([jnp.sin(x[:, 0]) * 1e4,
                              x[:, 1] * 2e4], axis=1)
    meshes = [
        generate_mesh(nx=33, ny=17, holes=((1.0, 0.5, 0.25),),
                      keep_dead_nodes=True),
        ht.generate_mesh_hybrid(holes=((1.0, 0.5, 0.25),), lc=0.06),
    ]
    dmesh = sh.device_mesh(8)
    for mesh in meshes:
        tp1 = ht.TriangleP1()
        params = tp1.init(jax.random.PRNGKey(0), mesh)
        params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                               params["u"].shape)
        energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3,
                                      body_force=bf)
        loss_fn = sharded_lattice_energy(energy, dmesh)
        e0 = float(energy(params, mesh))
        e1 = float(jax.jit(loss_fn)(params, mesh))
        assert np.isclose(e0, e1, rtol=1e-5), (e0, e1)
        g0 = jax.grad(lambda p: energy(p, mesh))(params)
        g1 = jax.jit(jax.grad(loss_fn))(params, mesh)
        for k in g0:
            ref = np.asarray(g0[k])
            np.testing.assert_allclose(
                np.asarray(g1[k]), ref, rtol=5e-4,
                atol=1e-6 * max(np.abs(ref).max(), 1e-30))


def test_sharded_lattice_is_actually_sharded(eight_devices):
    """The compiled sharded-lattice step really distributes: the padded
    lattice operand is row-sharded in the compiled HLO (not replicated
    onto every device)."""
    from hidenn_fem_tpu.mesh.structured import generate_mesh
    from hidenn_fem_tpu.parallel.sharded_lattice import (
        sharded_lattice_energy)

    mesh = generate_mesh(nx=65, ny=33)
    tp1 = ht.TriangleP1()
    params = tp1.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=tp1, E=10e9, nu=0.3)
    dmesh = sh.device_mesh(8)
    loss_fn = sharded_lattice_energy(energy, dmesh)
    txt = jax.jit(jax.value_and_grad(loss_fn)).lower(
        params, mesh).compile().as_text()
    assert "devices=[8" in txt, "no 8-way sharded op in compiled HLO"
