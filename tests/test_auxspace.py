"""Auxiliary-space preconditioned CG (solve/auxspace.py): iteration
counts collapse vs plain CG on unstructured meshes, solutions agree,
setup reuse, and hole/graded robustness.  No reference counterpart."""

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.models.structured_grid import StructuredGridP1
from hidenn_fem_tpu.solve.auxspace import (aux_pcg_solve,
                                           build_aux_preconditioner,
                                           radapt_aux_solve)

# multi-minute solver suite (compiles big PCG programs) -> excluded from the quick lane
import pytest  # noqa: E402
pytestmark = pytest.mark.slow


def _plate(nx=33, ny=17, holes=()):
    if holes:
        mesh = ht.generate_mesh(length=2.0, height=1.0, holes=holes,
                                boundaries={"up": 0, "down": 0,
                                            "right": 2, "left": 1},
                                nx=nx, ny=ny, variant="up")
    else:
        mesh = ht.proxy_plate_mesh(nx=nx, ny=ny)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    return mesh, params, loss


def test_aux_pcg_collapses_iterations():
    """Plain CG iteration counts grow like O(nx) (312 at 41x21);
    auxiliary-space PCG collapses them (23 at 41x21, measured)."""
    mesh, params, loss = _plate()
    up = {"u": params["u"]}
    args = (params["coords"], mesh)
    _, hc = ht.cg_solve(loss, up, args, max_iters=2000, tol=1e-6)
    sola, ha = aux_pcg_solve(loss, up, args, mesh=mesh,
                             bg_model=StructuredGridP1(E=10e9, nu=0.3),
                             max_iters=200, tol=1e-6)
    it_cg = int((np.asarray(hc) > 0).sum())
    it_aux = int((np.asarray(ha) > 0).sum())
    assert it_aux * 5 < it_cg, (it_aux, it_cg)
    # converged in the residual metric
    ha = np.asarray(ha)
    assert ha[ha > 0][-1] <= 1e-6


def test_aux_pcg_matches_cg_solution():
    mesh, params, loss = _plate(nx=21, ny=11)
    up = {"u": params["u"]}
    args = (params["coords"], mesh)
    solc, _ = ht.cg_solve(loss, up, args, max_iters=2000, tol=1e-8)
    sola, _ = aux_pcg_solve(loss, up, args, mesh=mesh,
                            bg_model=StructuredGridP1(E=10e9, nu=0.3),
                            max_iters=200, tol=1e-8)
    s = float(jnp.max(jnp.abs(solc["u"])))
    assert float(jnp.max(jnp.abs(sola["u"] - solc["u"]))) <= 2e-3 * s
    moved = np.asarray(sola["u"] - params["u"])
    assert np.all(moved[np.asarray(mesh.dirichlet_mask)] == 0.0)


def test_aux_pcg_with_holes():
    """Holes leave hole-rim geometry in the fine mesh but the background
    lattice stays full — the preconditioner must still converge fast and
    agree with CG."""
    mesh, params, loss = _plate(nx=33, ny=17,
                                holes=((1.0, 0.5, 0.18),))
    up = {"u": params["u"]}
    args = (params["coords"], mesh)
    solc, hc = ht.cg_solve(loss, up, args, max_iters=3000, tol=1e-6)
    sola, ha = aux_pcg_solve(loss, up, args, mesh=mesh,
                             bg_model=StructuredGridP1(E=10e9, nu=0.3),
                             max_iters=300, tol=1e-6)
    it_cg = int((np.asarray(hc) > 0).sum())
    it_aux = int((np.asarray(ha) > 0).sum())
    assert it_aux * 3 < it_cg, (it_aux, it_cg)
    s = float(jnp.max(jnp.abs(solc["u"])))
    assert float(jnp.max(jnp.abs(sola["u"] - solc["u"]))) <= 5e-3 * s


def test_example10_small():
    from examples import example10_auxspace
    sol, hist = example10_auxspace.main(nx=33, ny=17)
    h = np.asarray(hist)
    assert h[h > 0][-1] <= 1e-6


def test_radapt_aux_improves_energy():
    """Alternating exact aux-PCG solves with coordinate steps lowers
    the equilibrated energy monotonically and moves the mesh (the
    unstructured r-adaptivity driver)."""
    mesh, params, _ = _plate(nx=17, ny=9)
    model = ht.TriangleP1()
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def loss(p, m):
        return energy(p, m)

    pf, energies = radapt_aux_solve(
        loss, params, mesh, loss_args=(mesh,),
        bg_model=StructuredGridP1(E=10e9, nu=0.3), outer_epochs=3,
        pcg_iters=60, coord_steps=10, coord_lr=1e-4)
    e = np.asarray(energies)
    assert np.all(np.isfinite(e))
    assert np.all(e[1:] <= e[:-1] + 1e-6 * np.abs(e[:-1]))
    assert float(jnp.max(jnp.abs(pf["coords"] - params["coords"]))) > 0


def test_aux_pcg_node_order_invariant():
    """Nothing in the coloring / transfer tables / incidence machinery
    may depend on lattice-friendly node ordering: a randomly permuted
    node numbering must give the identical iteration count and the
    permuted solution (measured 23 iters both ways; the two orderings
    take different-but-equivalent preconditioner routes — lattice
    "reshape" vs "perm" background — so solutions agree only to f32
    CG-solution accuracy at tol 1e-6, ~6e-4 rel)."""
    from hidenn_fem_tpu.mesh.types import TriMesh

    mesh, params, loss = _plate()
    rng = np.random.RandomState(0)
    perm = rng.permutation(mesh.n_nodes)
    inv = np.argsort(perm)
    m2 = TriMesh.from_arrays(
        coords=np.asarray(mesh.coords)[inv],
        connectivity=perm[np.asarray(mesh.connectivity)],
        geom_boundary_mask=np.asarray(mesh.geom_boundary_mask)[inv],
        dirichlet_mask=np.asarray(mesh.dirichlet_mask)[inv],
        neumann_mask=np.asarray(mesh.neumann_mask)[inv],
        neumann_edges=np.sort(perm[np.asarray(mesh.neumann_edges)],
                              axis=1))
    p2 = {"u": params["u"][inv], "coords": params["coords"][inv]}

    solA, hA = aux_pcg_solve(loss, {"u": params["u"]},
                             (params["coords"], mesh), mesh=mesh,
                             max_iters=200, tol=1e-6)
    solB, hB = aux_pcg_solve(loss, {"u": p2["u"]},
                             (p2["coords"], m2), mesh=m2,
                             max_iters=200, tol=1e-6)
    itA = int((np.asarray(hA) > 0).sum())
    itB = int((np.asarray(hB) > 0).sum())
    assert abs(itA - itB) <= 3, (itA, itB)
    s = float(jnp.max(jnp.abs(solA["u"])))
    assert float(jnp.max(jnp.abs(
        solB["u"] - solA["u"][inv]))) <= 2e-3 * s


def test_windowed_pt_matches_flat():
    """The blocked-window P^T (activated above the TPU gather row-rate
    cliff) is numerically identical to the flat incidence gather."""
    import dataclasses
    from hidenn_fem_tpu.solve import auxspace as ax

    mesh, params, loss = _plate()
    up = {"u": params["u"]}
    args = (params["coords"], mesh)
    bg = StructuredGridP1(E=10e9, nu=0.3)
    # lattice_bg=False: this test exercises the GENERIC bilinear
    # transfer machinery, which the lattice-aligned background skips
    pre = ax.build_aux_preconditioner(loss, up, args, mesh, bg_model=bg,
                                      lattice_bg=False)
    assert pre.ptw_rel is None         # small scale stays flat
    n = mesh.n_nodes
    pt_idx = np.asarray(pre.pt_idx).reshape(pre.pt_w.shape)
    win = ax._windowed_pt(pt_idx, np.asarray(pre.pt_w), n,
                          pre.grid.nx, pre.grid.ny)
    assert win is not None
    preW = dataclasses.replace(pre, ptw_rel=win[0], ptw_w=win[1],
                               ptw_starts=win[2], ptw_width=win[3])
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(n, 2).astype(np.float32))
    zA = ax._apply_aux(bg, pre, r)
    zB = ax._apply_aux(bg, preW, r)
    s = float(jnp.max(jnp.abs(zA)))
    assert float(jnp.max(jnp.abs(zA - zB))) <= 1e-6 * s
    solA, _ = aux_pcg_solve(loss, up, args, pre=pre, bg_model=bg,
                            max_iters=100, tol=1e-6)
    solB, _ = aux_pcg_solve(loss, up, args, pre=preW, bg_model=bg,
                            max_iters=100, tol=1e-6)
    s = float(jnp.max(jnp.abs(solA["u"])))
    assert float(jnp.max(jnp.abs(solA["u"] - solB["u"]))) <= 1e-5 * s


def test_lattice_bg_iteration_counts():
    """Pin the iteration counts of the lattice-aligned background vs
    the generic half-resolution background (VERDICT r3 #3: the 20->29
    change at 847K needed an explanation and a regression test).

    Measured on CPU (deterministic modulo float noise; ranges +/-3):

    * reshape (hole-free plate): identical, 23 vs 23 — the two
      backgrounds coincide up to resolution;
    * perm (deleted-node hole lattices): lattice-aligned is BETTER
      (27/32 vs 34/33 at 1/2 holes) — exact Dirichlet + fine-resolution
      hole masks beat the rasterized generic background;
    * hybrid (rim suffix nodes): lattice-aligned pays ~7 extra
      iterations (34/35 vs 27/28 at 1/3 holes) — rim/collar dofs live
      in quads the lattice route marks dead, so their coarse
      correction comes only through the 1-dilated rim activation band
      + restricted bilinear rim tables, weaker per application than
      the generic background's solid rasterized operator.  It still
      wins ~7x on wall at 847K (0.072 s vs 0.53 s): each application
      is gather-free (docs/SOLVERS.md).  Counts are stable across hole
      layouts (34 vs 35 for 1 vs 3 holes).
    """
    from hidenn_fem_tpu.mesh.hybrid import generate_mesh_hybrid

    def iters(mesh, lattice_bg):
        model = ht.TriangleP1()
        params = model.init(jax.random.PRNGKey(0), mesh)
        energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

        def loss(p, coords, m):
            return energy({"u": p["u"], "coords": coords}, m)

        up = {"u": params["u"]}
        args = (params["coords"], mesh)
        bg = StructuredGridP1(E=10e9, nu=0.3)
        pre = build_aux_preconditioner(loss, up, args, mesh,
                                       bg_model=bg,
                                       lattice_bg=lattice_bg)
        _, h = aux_pcg_solve(loss, up, args, pre=pre, bg_model=bg,
                             max_iters=300, tol=1e-6)
        h = np.asarray(h)
        assert h[h > 0][-1] <= 1e-6
        return int((h > 0).sum())

    cases = [
        ("reshape", ht.proxy_plate_mesh(nx=33, ny=17), 23, 23),
        ("perm", ht.generate_mesh(
            length=2.0, height=1.0, holes=((0.6, 0.5, 0.22),),
            boundaries={"up": 0, "down": 0, "right": 2, "left": 1},
            nx=33, ny=17, variant="up"), 27, 34),
        ("hybrid-1hole", generate_mesh_hybrid(
            lc=0.05, holes=((0.6, 0.5, 0.22),)), 34, 27),
        ("hybrid-3hole", generate_mesh_hybrid(
            lc=0.05, holes=((0.5, 0.3, 0.13), (1.2, 0.6, 0.15),
                            (1.7, 0.25, 0.1))), 35, 28),
    ]
    for name, mesh, exp_lat, exp_gen in cases:
        it_lat = iters(mesh, lattice_bg=True)
        it_gen = iters(mesh, lattice_bg=False)
        assert abs(it_lat - exp_lat) <= 3, (name, it_lat, exp_lat)
        assert abs(it_gen - exp_gen) <= 3, (name, it_gen, exp_gen)


@pytest.mark.parametrize("lattice_bg", [True, False])
def test_aux_pcg_float64(lattice_bg):
    """f64 end-to-end through aux-PCG (VERDICT r3 weak #7): converges
    BELOW the f32 residual floor (1e-10) on both background kinds and
    matches the f64 CG solution tightly."""
    jax.config.update("jax_enable_x64", True)
    try:
        mesh = ht.generate_mesh(length=2.0, height=1.0,
                                holes=((1.0, 0.5, 0.18),),
                                boundaries={"up": 0, "down": 0,
                                            "right": 2, "left": 1},
                                nx=33, ny=17, variant="up")
        model = ht.TriangleP1(dtype=jnp.float64)
        params = model.init(jax.random.PRNGKey(0), mesh)
        energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

        def loss(p, coords, m):
            return energy({"u": p["u"], "coords": coords}, m)

        up = {"u": params["u"]}
        args = (params["coords"], mesh)
        bg = StructuredGridP1(E=10e9, nu=0.3, dtype=jnp.float64)
        pre = build_aux_preconditioner(loss, up, args, mesh,
                                       bg_model=bg,
                                       lattice_bg=lattice_bg)
        assert (pre.lat_kind != "") == lattice_bg
        sola, ha = aux_pcg_solve(loss, up, args, pre=pre, bg_model=bg,
                                 max_iters=400, tol=1e-10)
        assert sola["u"].dtype == jnp.float64
        ha = np.asarray(ha)
        assert ha[ha > 0][-1] <= 1e-10        # below the f32 floor
        solc, _ = ht.cg_solve(loss, up, args, max_iters=5000, tol=1e-12)
        s = float(jnp.max(jnp.abs(solc["u"])))
        assert float(jnp.max(jnp.abs(
            sola["u"] - solc["u"]))) <= 1e-8 * s
    finally:
        jax.config.update("jax_enable_x64", False)


def test_aux_preconditioner_reuse():
    mesh, params, loss = _plate(nx=21, ny=11)
    up = {"u": params["u"]}
    args = (params["coords"], mesh)
    pre = build_aux_preconditioner(loss, up, args, mesh,
                                   bg_model=StructuredGridP1(
                                       E=10e9, nu=0.3))
    sol1, h1 = aux_pcg_solve(loss, up, args, pre=pre,
                             bg_model=StructuredGridP1(E=10e9, nu=0.3),
                             max_iters=200, tol=1e-6)
    h1 = np.asarray(h1)
    assert h1[h1 > 0][-1] <= 1e-6
    assert np.all(np.isfinite(np.asarray(sol1["u"])))


def test_lattice_bg_kinds_symmetric_and_match_generic():
    """The lattice-aligned background paths (kind "reshape" on
    identity/hybrid routes, "perm" on deleted-node hole lattices) must
    (a) be engaged on the right meshes, (b) apply a SYMMETRIC M^{-1}
    (PCG requirement: <x, My> == <Mx, y>), and (c) converge to the
    same solution as the generic bilinear-transfer background."""
    from hidenn_fem_tpu.mesh.hybrid import generate_mesh_hybrid
    from hidenn_fem_tpu.solve import auxspace as ax

    def _case(mesh, expect_kind, has_rim):
        model = ht.TriangleP1()
        params = model.init(jax.random.PRNGKey(0), mesh)
        energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

        def loss(p, coords, m):
            return energy({"u": p["u"], "coords": coords}, m)

        up = {"u": params["u"]}
        args = (params["coords"], mesh)
        bg = StructuredGridP1(E=10e9, nu=0.3)
        pre = build_aux_preconditioner(loss, up, args, mesh, bg_model=bg)
        assert pre.lat_kind == expect_kind
        assert (pre.rim_corners is not None) == has_rim
        rng = np.random.RandomState(1)
        n = mesh.n_nodes
        x = jnp.asarray(rng.randn(n, 2).astype(np.float32))
        y = jnp.asarray(rng.randn(n, 2).astype(np.float32))
        mx = ax._apply_aux(bg, pre, x)
        my = ax._apply_aux(bg, pre, y)
        a, b = float(jnp.vdot(x, my)), float(jnp.vdot(mx, y))
        assert abs(a - b) <= 1e-4 * max(abs(a), abs(b)), (a, b)

        solL, hL = aux_pcg_solve(loss, up, args, pre=pre, bg_model=bg,
                                 max_iters=300, tol=1e-6)
        preG = build_aux_preconditioner(loss, up, args, mesh,
                                        bg_model=bg, lattice_bg=False)
        assert preG.lat_kind == ""
        solG, _ = aux_pcg_solve(loss, up, args, pre=preG, bg_model=bg,
                                max_iters=300, tol=1e-6)
        hL = np.asarray(hL)
        assert hL[hL > 0][-1] <= 1e-6
        s = float(jnp.max(jnp.abs(solG["u"])))
        assert float(jnp.max(jnp.abs(
            solL["u"] - solG["u"]))) <= 2e-3 * s

    _case(ht.proxy_plate_mesh(nx=33, ny=17), "reshape", False)
    _case(ht.generate_mesh(length=2.0, height=1.0,
                           holes=((0.6, 0.5, 0.22),),
                           boundaries={"up": 0, "down": 0,
                                       "right": 2, "left": 1},
                           nx=33, ny=17, variant="up"),
          "perm", False)
    _case(generate_mesh_hybrid(lc=0.05, holes=((0.6, 0.5, 0.22),)),
          "reshape", True)
