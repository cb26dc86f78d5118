"""Lattice detection + gather-free energy route (mesh/lattice.py,
ops/lattice_energy.py): detection across triangulation variants and
holes, rejection of genuinely unstructured meshes, and value/gradient
equality against the unstructured assembly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.lattice import detect_lattice
from hidenn_fem_tpu.mesh.structured import generate_mesh


def _perturbed_params(model, mesh):
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    params["coords"] = params["coords"] + 1e-3 * jax.random.normal(
        jax.random.PRNGKey(2), params["coords"].shape)
    return params


@pytest.mark.parametrize("variant,holes,identity", [
    ("up", (), True),
    ("down", (), True),
    ("zigzag", (), True),
    ("zigzag", ((1.0, 0.5, 0.25),), False),
    ("up", ((0.6, 0.4, 0.15), (1.4, 0.6, 0.2)), False),
])
def test_lattice_route_matches_unstructured(variant, holes, identity):
    mesh = generate_mesh(nx=33, ny=17, holes=holes, variant=variant)
    assert mesh.lattice is not None
    assert mesh.lattice.identity == identity
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  backend="xla")
    off = dataclasses.replace(mesh, lattice=None)
    v_lat = float(energy(params, mesh))
    v_ref = float(energy(params, off))
    assert np.isclose(v_lat, v_ref, rtol=1e-5), (v_lat, v_ref)
    g_lat = jax.grad(lambda p: energy(p, mesh))(params)
    g_ref = jax.grad(lambda p: energy(p, off))(params)
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_lat[k]), ref,
                                   rtol=5e-4,
                                   atol=1e-5 * np.abs(ref).max())


def test_rejects_unstructured():
    """Perturbed node coordinates (not a tensor grid) must not detect."""
    rng = np.random.default_rng(0)
    mesh = generate_mesh(nx=9, ny=5, holes=())
    coords = np.asarray(mesh.coords) + 0.01 * rng.standard_normal(
        (mesh.n_nodes, 2))
    assert detect_lattice(coords, np.asarray(mesh.connectivity),
                          np.asarray(mesh.neumann_edges)) is None


def test_rejects_non_lattice_connectivity():
    """Lattice coords but a flipped diagonal pair inside one quad."""
    mesh = generate_mesh(nx=9, ny=5, holes=(), variant="up")
    conn = np.asarray(mesh.connectivity).copy()
    # swap element 0 (up-T1 of quad 0) for the down-T1 of the same quad
    # while keeping its up-T2 sibling: mixed diagonals -> reject
    ny = 5
    n00, n10, n01 = 0, ny, 1
    conn[0] = [n00, n10, n01]
    assert detect_lattice(np.asarray(mesh.coords), conn,
                          np.zeros((0, 2))) is None


def test_rejects_interior_neumann_edge():
    mesh = generate_mesh(nx=9, ny=5, holes=())
    edges = np.array([[1, 2]])      # interior vertical lattice edge? no:
    # nodes 1,2 are (0,1),(0,2) = left-face segment; use a genuinely
    # interior edge instead: (ny+1, ny+2) lies at i=1
    edges = np.array([[6, 7]])
    assert detect_lattice(np.asarray(mesh.coords),
                          np.asarray(mesh.connectivity), edges) is None


def test_route_requires_exact_config():
    """compat='reference', a traction callable, or a body force all opt
    out of the route (they change the numbers the route computes)."""
    mesh = ht.proxy_plate_mesh(nx=17, ny=9)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    e = ht.PlaneStressEnergy(model=model, backend="xla")
    assert e._lattice_total(params, mesh) is not None
    assert ht.PlaneStressEnergy(
        model=ht.TriangleP1(compat="reference"), compat="reference",
        backend="xla")._lattice_total(params, mesh) is None
    # body force rides the route (r3: lattice_body_work)
    bf = lambda x: jnp.zeros_like(x)
    assert ht.PlaneStressEnergy(
        model=model, body_force=bf,
        backend="xla")._lattice_total(params, mesh) is not None


@pytest.mark.parametrize("variant,holes", [
    ("up", ()),
    ("zigzag", ((1.0, 0.5, 0.25),)),
])
def test_body_force_matches_unstructured(variant, holes):
    """body_force != None stays on the lattice route
    (lattice_body_work: slice-based work term, t1/t2-masked dead
    quads) and matches the generic assembly in value and gradients."""
    mesh = generate_mesh(nx=33, ny=17, holes=holes, variant=variant,
                         keep_dead_nodes=bool(holes))
    assert mesh.lattice is not None
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    bf = lambda x: jnp.stack([jnp.sin(x[:, 0]) * 1e4,
                              x[:, 1] * 2e4], axis=1)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  body_force=bf, backend="xla")
    assert energy._lattice_total(params, mesh) is not None
    off = dataclasses.replace(mesh, lattice=None)
    v_lat = float(energy(params, mesh))
    v_ref = float(energy(params, off))
    assert np.isclose(v_lat, v_ref, rtol=1e-5), (v_lat, v_ref)
    g_lat = jax.grad(lambda p: energy(p, mesh))(params)
    g_ref = jax.grad(lambda p: energy(p, off))(params)
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_lat[k]), ref,
                                   rtol=5e-4,
                                   atol=1e-5 * np.abs(ref).max())


def test_route_in_solver():
    """A short LBFGS solve through the routed energy converges to the
    same plateau as the unstructured path."""
    mesh = ht.proxy_plate_mesh(nx=33, ny=17)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  backend="xla")
    off = dataclasses.replace(mesh, lattice=None)
    _, l_lat = ht.run_lbfgs(energy.total, params, num_steps=120,
                            loss_args=(mesh,))
    _, l_ref = ht.run_lbfgs(energy.total, params, num_steps=120,
                            loss_args=(off,))
    assert np.isfinite(float(l_lat[-1]))
    assert np.isclose(float(l_lat[-1]), float(l_ref[-1]), rtol=1e-4)


def test_keep_dead_nodes_equivalent():
    """generate_mesh(keep_dead_nodes=True) keeps hole-interior nodes as
    pinned dead DOFs: identity lattice numbering (zero-gather route),
    identical element set, and the solve reaches the same plateau and
    displacement extrema as the renumbered mesh."""
    holes = ((1.0, 0.5, 0.25),)
    m_ren = generate_mesh(nx=33, ny=17, holes=holes)
    m_dead = generate_mesh(nx=33, ny=17, holes=holes,
                           keep_dead_nodes=True)
    assert m_dead.n_elements == m_ren.n_elements
    assert m_dead.n_nodes == 33 * 17
    assert m_dead.lattice is not None and m_dead.lattice.identity
    model = ht.TriangleP1()
    energy = ht.PlaneStressEnergy(model=model, backend="xla")
    s1, l1 = ht.run_lbfgs(
        energy.total, model.init(jax.random.PRNGKey(0), m_ren),
        num_steps=150, loss_args=(m_ren,))
    s2, l2 = ht.run_lbfgs(
        energy.total, model.init(jax.random.PRNGKey(0), m_dead),
        num_steps=150, loss_args=(m_dead,))
    assert np.isclose(float(l1[-1]), float(l2[-1]), rtol=1e-4)
    u1 = np.asarray(model.u_full(s1, m_ren))
    u2 = np.asarray(model.u_full(s2, m_dead))
    assert np.isclose(np.abs(u1).max(), np.abs(u2).max(), rtol=1e-3)
    # dead nodes (referenced by no triangle) carry exactly-zero values
    referenced = np.zeros(m_dead.n_nodes, bool)
    referenced[np.asarray(m_dead.connectivity).ravel()] = True
    assert (~referenced).any()
    assert np.abs(u2[~referenced]).max() == 0.0


def test_windowed_fill_equals_flat():
    """The blocked-window permutation fill (kept as a measured-negative
    lead: slower than flat on v5e, see mesh/lattice.py note) stays
    numerically identical to the flat fill."""
    import dataclasses

    from hidenn_fem_tpu.mesh import lattice as L

    mesh = generate_mesh(nx=33, ny=17, holes=((1.0, 0.5, 0.25),),
                         variant="zigzag")
    rt = mesh.lattice
    w = L._window_maps(np.asarray(rt.inv_map),
                       np.asarray(rt.fwd_map, np.int64),
                       mesh.n_nodes, rt.nx, rt.ny, target=64)
    rt_w = dataclasses.replace(rt, fw_rel=w[0], fw_starts=w[1],
                               bw_rel=w[2], bw_starts=w[3],
                               fw_width=w[4], bw_width=w[5])
    mesh_w = dataclasses.replace(mesh, lattice=rt_w)
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    energy = ht.PlaneStressEnergy(model=model, backend="xla")
    v_w = float(energy(params, mesh_w))
    v_f = float(energy(params, mesh))
    assert np.isclose(v_w, v_f, rtol=1e-6)
    g_w = jax.grad(lambda p: energy(p, mesh_w))(params)
    g_f = jax.grad(lambda p: energy(p, mesh))(params)
    for k in g_f:
        ref = np.asarray(g_f[k])
        np.testing.assert_allclose(np.asarray(g_w[k]), ref, rtol=5e-4,
                                   atol=1e-5 * max(np.abs(ref).max(),
                                                   1e-30))


@pytest.mark.parametrize("k", [4, 8, 16])
@pytest.mark.parametrize("variant,holes", [
    ("up", ((1.0, 0.5, 0.25),)),
    ("zigzag", ((0.6, 0.4, 0.15), (1.4, 0.6, 0.2))),
])
def test_chunked_fill_equals_flat(k, variant, holes):
    """The chunked monotone fill (opt-in: measured SLOWER than flat on
    v5e at production scale, see the mesh/lattice.py note) stays
    numerically identical to the flat permutation gather — value and
    both gradient groups — across hole layouts and chunk sizes."""
    from hidenn_fem_tpu.mesh import lattice as L

    mesh = generate_mesh(nx=33, ny=17, holes=holes, variant=variant)
    rt = mesh.lattice
    assert rt is not None and not rt.identity and rt.ck_k == 0
    cm = L._chunk_maps(np.asarray(rt.inv_map),
                       np.asarray(rt.fwd_map, np.int64),
                       mesh.n_nodes, rt.nx, rt.ny, k=k)
    if cm is None:       # too many run-boundary chunks at this tiny
        pytest.skip("chunk gate: fixup fraction too high at test scale")
    mesh_c = dataclasses.replace(
        mesh, lattice=dataclasses.replace(rt, **cm))
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    energy = ht.PlaneStressEnergy(model=model, backend="xla")
    v_c = float(energy(params, mesh_c))
    v_f = float(energy(params, mesh))
    assert np.isclose(v_c, v_f, rtol=1e-6), (v_c, v_f)
    g_c = jax.grad(lambda p: energy(p, mesh_c))(params)
    g_f = jax.grad(lambda p: energy(p, mesh))(params)
    for key in g_f:
        ref = np.asarray(g_f[key])
        np.testing.assert_allclose(np.asarray(g_c[key]), ref, rtol=5e-4,
                                   atol=1e-5 * max(np.abs(ref).max(),
                                                   1e-30))


@pytest.mark.parametrize("k", [3, 4, 8])
def test_chunked_gather_synthetic(k):
    """_chunked_gather == src[m] on adversarial monotone maps:
    leading-dead chunks (negative window start), trailing dead tail,
    multiple runs inside one chunk (exact fixup), and the total
    (no-dead) compaction direction."""
    from hidenn_fem_tpu.mesh.lattice import _chunk_dir
    from hidenn_fem_tpu.ops.lattice_energy import _chunked_gather

    rng = np.random.default_rng(0)
    cases = []
    # leading dead, mid-gaps, trailing dead (expansion direction)
    m1 = np.array([99, 99, 0, 1, 2, 99, 99, 3, 4, 99, 5, 6, 7, 8,
                   99, 99, 9, 99], np.int64)
    cases.append((m1, 10))
    # dense runs with single-element runs (gap every other entry)
    m2 = np.array([0, 99, 1, 99, 2, 99, 3, 4, 5, 99, 6], np.int64)
    cases.append((m2, 7))
    # total monotone map (compaction direction: no dead entries)
    m3 = np.sort(rng.choice(40, size=17, replace=False)).astype(np.int64)
    cases.append((m3, 40))
    for m, s in cases:
        m = np.where(m == 99, s, m)
        src = rng.standard_normal((s, 4)).astype(np.float32)
        rowa, off, live, fr, fi = _chunk_dir(m, s, k)
        out = np.asarray(_chunked_gather(
            jnp.asarray(src), jnp.asarray(rowa), jnp.asarray(off),
            None if live is None else jnp.asarray(live),
            jnp.asarray(fr), jnp.asarray(fi), k, m.size))
        pad = np.concatenate([src, np.zeros((1, 4), np.float32)])
        ref = pad[np.minimum(m, s)]
        np.testing.assert_array_equal(out, ref)


def test_chunked_fill_auto_enabled(monkeypatch):
    """HDNN_LATTICE_CHUNK=1 opts the chunk tables in (kept as a
    measured-negative lead); unset/0 leaves them off."""
    monkeypatch.setenv("HDNN_LATTICE_CHUNK", "1")
    mesh = generate_mesh(nx=33, ny=17, holes=((1.0, 0.5, 0.25),))
    assert mesh.lattice.ck_k == 8
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    energy = ht.PlaneStressEnergy(model=model, backend="xla")
    monkeypatch.delenv("HDNN_LATTICE_CHUNK")
    mesh_f = generate_mesh(nx=33, ny=17, holes=((1.0, 0.5, 0.25),))
    assert mesh_f.lattice.ck_k == 0
    assert np.isclose(float(energy(params, mesh)),
                      float(energy(params, mesh_f)), rtol=1e-6)


def test_perm_fill_gradient():
    """The permutation fill's custom backward (a gather, not a scatter)
    equals the autodiff of an equivalent dense formulation."""
    from hidenn_fem_tpu.ops.lattice_energy import _perm_fill
    rng = np.random.default_rng(3)
    n, nxny = 7, 12
    posns = rng.permutation(nxny)[:n]
    inv_map = np.full(nxny, n, np.int32)
    inv_map[posns] = np.arange(n)
    fwd_map = posns.astype(np.int32)
    node = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((nxny, 4)), jnp.float32)

    def f(nd):
        return jnp.sum(_perm_fill(nd, jnp.asarray(inv_map),
                                  jnp.asarray(fwd_map)) * ct)

    def f_ref(nd):
        pad = jnp.concatenate([nd, jnp.zeros((1, 4))], axis=0)
        return jnp.sum(pad[jnp.asarray(inv_map)] * ct)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(node)),
                               np.asarray(jax.grad(f_ref)(node)),
                               rtol=1e-6)


@pytest.mark.parametrize("holes", [(), ((1.0, 0.5, 0.25),)])
def test_lattice_route_float64(holes):
    """f64 models must ride the lattice route correctly (VERDICT r3
    weak #7: the route was untested in f64 — value and both gradient
    groups vs the forced-generic f64 path to 1e-12, and no silent
    downcast anywhere in the fill/stencil)."""
    jax.config.update("jax_enable_x64", True)
    try:
        mesh = generate_mesh(nx=33, ny=17, holes=holes)
        assert mesh.lattice is not None
        model = ht.TriangleP1(dtype=jnp.float64)
        params = model.init(jax.random.PRNGKey(0), mesh)
        params["u"] = 1e-4 * jax.random.normal(
            jax.random.PRNGKey(1), params["u"].shape, jnp.float64)
        energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
        off = dataclasses.replace(mesh, lattice=None)
        v_lat = energy(params, mesh)
        assert v_lat.dtype == jnp.float64
        v_ref = float(energy(params, off))
        assert np.isclose(float(v_lat), v_ref, rtol=1e-12)
        g_lat = jax.grad(lambda p: energy(p, mesh))(params)
        g_ref = jax.grad(lambda p: energy(p, off))(params)
        for k in g_ref:
            assert g_lat[k].dtype == jnp.float64
            ref = np.asarray(g_ref[k])
            np.testing.assert_allclose(
                np.asarray(g_lat[k]), ref, rtol=1e-10,
                atol=1e-12 * max(np.abs(ref).max(), 1e-30))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_static_route_flags():
    """uniform_sel / all_present are static trace-time specializations
    (ops/lattice_energy._domain_from_lat picks the triangle family and
    drops the presence masks); detection must set them exactly."""
    rt = generate_mesh(nx=9, ny=5, holes=(), variant="up").lattice
    assert rt.uniform_sel == "up" and rt.all_present
    rt = generate_mesh(nx=9, ny=5, holes=(), variant="down").lattice
    assert rt.uniform_sel == "down" and rt.all_present
    rt = generate_mesh(nx=9, ny=5, holes=(), variant="zigzag").lattice
    assert rt.uniform_sel == "" and rt.all_present
    rt = generate_mesh(nx=33, ny=17, variant="up",
                       holes=((1.0, 0.5, 0.25),)).lattice
    assert rt.uniform_sel == "up" and not rt.all_present
