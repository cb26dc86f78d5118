"""Quad-paired banded assembly (k=4): the default-on production route for
every large unstructured mesh (``ops/losses.py`` prefers
``mesh.banded_paired``; ``TriMesh.from_arrays`` auto-builds it >250K).

Covers VERDICT r4 #1: pair_connectivity invariants (partition of the
element set, degenerate fillers, None fallback), interpret-mode equality
of the 16-row kernel vs the triangle route — value, ``jax.grad``, and the
single-pass value-and-grad/ownership path — on structured and Delaunay
meshes, and the dispatch preference for the paired tables.

Reference hot loop being replaced: ``/root/reference/src/loss.py:55-88``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.banded import (build_banded_assembly,
                                        build_paired_assembly,
                                        pair_connectivity)
from hidenn_fem_tpu.mesh.types import TriMesh
from hidenn_fem_tpu.ops import quadrature as quad
from hidenn_fem_tpu.ops.banded_energy import banded_element_energy


def _tri_sets(conn3: np.ndarray) -> list:
    """Canonical (sorted-tuple) node sets, one per triangle."""
    return sorted(tuple(sorted(r)) for r in np.asarray(conn3))


def _unpair(paired: np.ndarray) -> np.ndarray:
    """Expand k=4 rows back to triangles: (0,1,2) always, (0,1,3) unless
    the row is a degenerate filler (slot 3 == slot 0)."""
    p = np.asarray(paired)
    t1 = p[:, [0, 1, 2]]
    real = p[:, 3] != p[:, 0]
    t2 = p[real][:, [0, 1, 3]]
    return np.concatenate([t1, t2], axis=0)


def _perturbed_params(model, mesh, seed=0):
    params = model.init(jax.random.PRNGKey(seed), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                           params["u"].shape)
    params["coords"] = params["coords"] + 1e-3 * jax.random.normal(
        jax.random.PRNGKey(seed + 2), params["coords"].shape)
    return params


@pytest.fixture(scope="module")
def structured():
    m = ht.proxy_plate_mesh(nx=33, ny=17)
    return dataclasses.replace(m, lattice=None)


@pytest.fixture(scope="module")
def delaunay():
    from hidenn_fem_tpu.mesh.delaunay import generate_mesh_delaunay
    return generate_mesh_delaunay(lc=0.09)


# ---------------------------------------------------------------- invariants

def test_pair_connectivity_partition_structured(structured):
    conn = np.asarray(structured.connectivity)
    paired = pair_connectivity(conn)
    assert paired is not None
    assert _tri_sets(_unpair(paired)) == _tri_sets(conn)
    # slots (0,1) are the shared edge: both triangles of a real pair
    # contain it (guaranteed by construction; spot-check the layout)
    real = paired[paired[:, 3] != paired[:, 0]]
    assert real.shape[0] > 0


def test_pair_connectivity_partition_delaunay(delaunay):
    conn = np.asarray(delaunay.connectivity)
    paired = pair_connectivity(conn)
    assert paired is not None
    assert _tri_sets(_unpair(paired)) == _tri_sets(conn)
    # a genuinely irregular mesh pairs nearly completely (>90% measured
    # on Delaunay output; the matching quality claim behind the 2.0x)
    real_rows = int((paired[:, 3] != paired[:, 0]).sum())
    assert 2 * real_rows >= 0.9 * conn.shape[0]


def test_pair_connectivity_locality(delaunay):
    """Rows sorted by min node: the paired tables must band at least as
    tightly as the triangle tables (pairing must not break the window
    construction)."""
    conn = np.asarray(delaunay.connectivity)
    paired = pair_connectivity(conn)
    mins = paired.min(axis=1)
    assert np.all(np.diff(mins) >= 0)


def test_pair_connectivity_fillers_degenerate():
    """Deleting elements creates unmatched triangles; they must ride as
    degenerate fillers (slot 3 == slot 0) and the partition must hold."""
    m = ht.proxy_plate_mesh(nx=17, ny=9)
    conn = np.asarray(m.connectivity)
    keep = np.ones(conn.shape[0], bool)
    keep[::7] = False                      # punch out every 7th triangle
    conn = conn[keep]
    paired = pair_connectivity(conn)
    assert paired is not None
    filler = paired[paired[:, 3] == paired[:, 0]]
    assert filler.shape[0] > 0
    assert _tri_sets(_unpair(paired)) == _tri_sets(conn)


def test_greedy_match_equals_sequential(delaunay):
    """Both matcher implementations (native C++ loop and the numpy
    fallback) must reproduce the sequential first-come greedy EXACTLY
    (same accept set), so pairing results are independent of whether
    the native tier is built."""
    from hidenn_fem_tpu.mesh.banded import _greedy_match

    for conn in (np.asarray(delaunay.connectivity),
                 np.asarray(ht.proxy_plate_mesh(nx=33, ny=17)
                            .connectivity)):
        ne = conn.shape[0]
        edges = np.sort(np.concatenate(
            [conn[:, [0, 1]], conn[:, [1, 2]], conn[:, [2, 0]]]), axis=1)
        tri = np.tile(np.arange(ne), 3)
        order = np.lexsort((edges[:, 1], edges[:, 0]))
        es, ts = edges[order], tri[order]
        shared = np.where((es[1:] == es[:-1]).all(axis=1))[0]
        a_all, b_all = ts[shared], ts[shared + 1]

        matched = np.zeros(ne, bool)
        accept_seq = np.zeros(a_all.size, bool)
        for i in range(a_all.size):
            a, b = a_all[i], b_all[i]
            if matched[a] or matched[b]:
                continue
            matched[a] = matched[b] = True
            accept_seq[i] = True

        accept_vec, matched_vec = _greedy_match(a_all, b_all, ne)
        np.testing.assert_array_equal(accept_vec, accept_seq)
        np.testing.assert_array_equal(matched_vec, matched)


def test_pair_connectivity_none_when_nothing_pairs():
    """Edge-disjoint triangle soup: no shared edges, matching is empty,
    the builder must return None (callers keep the triangle tables)."""
    conn = np.arange(30, dtype=np.int64).reshape(10, 3)
    assert pair_connectivity(conn) is None
    assert build_paired_assembly(conn, 30) is None


def test_from_arrays_builds_and_gates_paired(monkeypatch):
    m = ht.proxy_plate_mesh(nx=17, ny=9)
    args = (np.asarray(m.coords), np.asarray(m.connectivity))
    forced = TriMesh.from_arrays(*args, build_banded=True)
    assert forced.banded is not None and forced.banded_paired is not None
    assert forced.banded_paired.k == 4
    nopair = TriMesh.from_arrays(*args, build_banded="nopair")
    assert nopair.banded is not None and nopair.banded_paired is None
    monkeypatch.setenv("HDNN_NO_PAIR", "1")
    gated = TriMesh.from_arrays(*args, build_banded=True)
    assert gated.banded is not None and gated.banded_paired is None


# ------------------------------------------------------- kernel equality

def _xla_ref(structured_or_mesh, model, params):
    e_ref = ht.PlaneStressEnergy(model=model, backend="xla")
    clean = dataclasses.replace(structured_or_mesh, banded=None,
                                banded_paired=None)
    v = float(e_ref.domain_energy(params, clean))
    g = jax.grad(lambda p: e_ref.domain_energy(p, clean))(params)
    return v, g


@pytest.mark.parametrize("fixture", ["structured", "delaunay"])
def test_paired_energy_value_grad_vg(fixture, request):
    """The 16-row two-triangle kernel on real paired tables: value,
    reverse-mode gradient (recompute backward), and the single-pass
    value-and-grad (ownership-masked) all match the XLA triangle route
    to f32 tolerance."""
    mesh = request.getfixturevalue(fixture)
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    v_ref, g_ref = _xla_ref(mesh, model, params)

    # small window -> real multi-block tables at test size
    ba = build_paired_assembly(np.asarray(mesh.connectivity),
                               mesh.n_nodes, window_limit=700)
    assert ba is not None and ba.k == 4
    assert ba.re_own_lo is not None        # single-pass vg path reachable

    # unit-level: the k=4 kernel straight off the tables (interpret mode)
    node = model.packed_nodes(params, mesh)
    w_sum = quad.triangle_weight_sum(4)
    v = float(banded_element_energy(node, ba, 10e9, 0.3, w_sum, True))
    assert np.isclose(v, v_ref, rtol=1e-5), (v, v_ref)

    # integration-level equality through PlaneStressEnergy
    mesh_p = dataclasses.replace(mesh, banded=ba, banded_paired=ba)
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v_p = float(e_bf.domain_energy(params, mesh_p))
    assert np.isclose(v_p, v_ref, rtol=1e-5), (v_p, v_ref)

    g_p = jax.grad(lambda p: e_bf.domain_energy(p, mesh_p))(params)
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_p[k]), ref, rtol=5e-4,
                                   atol=1e-5 * np.abs(ref).max())

    # single-pass value-and-grad (the production vg path)
    v_vg, g_vg = jax.value_and_grad(
        lambda p: e_bf.domain_energy(p, mesh_p))(params)
    assert np.isclose(float(v_vg), v_ref, rtol=1e-5)
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_vg[k]), ref, rtol=5e-4,
                                   atol=1e-5 * np.abs(ref).max())


def test_paired_energy_with_fillers():
    """Equality on a mesh with unmatched triangles: the degenerate filler
    rows (slot 3 == slot 0) must contribute exactly zero energy and
    cotangent (the eps-guarded-det argument)."""
    m = ht.proxy_plate_mesh(nx=17, ny=9)
    conn = np.asarray(m.connectivity)
    keep = np.ones(conn.shape[0], bool)
    keep[::7] = False
    mesh = TriMesh.from_arrays(np.asarray(m.coords), conn[keep],
                               np.asarray(m.geom_boundary_mask),
                               np.asarray(m.dirichlet_mask),
                               np.asarray(m.neumann_mask),
                               np.asarray(m.neumann_edges),
                               build_banded=True, build_lattice=False)
    assert mesh.banded_paired is not None
    paired = pair_connectivity(conn[keep])
    assert (paired[:, 3] == paired[:, 0]).sum() > 0   # fillers present
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    v_ref, g_ref = _xla_ref(mesh, model, params)
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v_vg, g_vg = jax.value_and_grad(
        lambda p: e_bf.domain_energy(p, mesh))(params)
    assert np.isclose(float(v_vg), v_ref, rtol=1e-5), (float(v_vg), v_ref)
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_vg[k]), ref, rtol=5e-4,
                                   atol=1e-5 * np.abs(ref).max())


def test_dispatch_prefers_paired_tables(structured):
    """The route must run the paired tables when both are present: plant
    deliberately-degenerate triangle tables (zero energy) next to correct
    paired tables — the result must still match the reference, proving
    the paired tables were the ones consumed."""
    mesh = structured
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    v_ref, _ = _xla_ref(mesh, model, params)
    conn = np.asarray(mesh.connectivity)
    ba_pair = build_paired_assembly(conn, mesh.n_nodes, window_limit=700)
    zero_conn = np.zeros_like(conn)        # all-degenerate: energy == 0
    from hidenn_fem_tpu.mesh.types import build_incidence_table
    ba_zero = build_banded_assembly(zero_conn, mesh.n_nodes,
                                    build_incidence_table(
                                        zero_conn, mesh.n_nodes),
                                    window_limit=700)
    mesh2 = dataclasses.replace(mesh, banded=ba_zero,
                                banded_paired=ba_pair)
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v = float(e_bf.domain_energy(params, mesh2))
    assert np.isclose(v, v_ref, rtol=1e-5), (v, v_ref)
    assert abs(v_ref) > 1e-12              # the probe is discriminating


# ------------------------------------------------------- strips (k=6)

def _unstrip(strips: np.ndarray) -> np.ndarray:
    """Expand k=6 sliding-triple rows back to triangles, dropping
    degenerate (repeated-vertex) fillers."""
    s = np.asarray(strips)
    tris = []
    for i in range(4):
        t = s[:, i:i + 3]
        live = ((t[:, 0] != t[:, 1]) & (t[:, 1] != t[:, 2])
                & (t[:, 0] != t[:, 2]))
        tris.append(t[live])
    return np.concatenate(tris, axis=0)


@pytest.mark.parametrize("fixture", ["structured", "delaunay"])
def test_strip_connectivity_partition(fixture, request):
    """Strips cover the element set exactly once: expanding the sliding
    triples (minus degenerate fillers) reproduces the triangle multiset,
    and coverage is high (~100% structured, >90% Delaunay measured)."""
    from hidenn_fem_tpu.mesh.banded import strip_connectivity
    conn = np.asarray(request.getfixturevalue(fixture).connectivity)
    sk = strip_connectivity(conn)
    assert sk is not None
    strips, keep = sk
    assert strips.shape[1] == 6 and keep.shape == strips.shape
    assert _tri_sets(_unstrip(strips)) == _tri_sets(conn)
    # dead slots flagged exactly where the trailing triangles degenerate.
    # Coverage: ~100% structured / 97.6% Delaunay at 66K measured; the
    # tiny test fixture (530 elems) is boundary-dominated, hence 0.85.
    full = keep.all(axis=1)
    assert 4 * int(full.sum()) >= 0.85 * conn.shape[0]
    # rows sorted by min node (banded locality)
    mins = strips.min(axis=1)
    assert np.all(np.diff(mins) >= 0)


def test_strip_connectivity_leftovers():
    """Punching out triangles leaves unmerged pairs and lone fillers;
    both must ride as degenerate-tailed strips with dead slots marked."""
    from hidenn_fem_tpu.mesh.banded import strip_connectivity
    m = ht.proxy_plate_mesh(nx=17, ny=9)
    conn = np.asarray(m.connectivity)
    kp = np.ones(conn.shape[0], bool)
    kp[::7] = False
    conn = conn[kp]
    strips, keep = strip_connectivity(conn)
    assert _tri_sets(_unstrip(strips)) == _tri_sets(conn)
    assert (~keep).any()                    # some dead slots exist
    # every dead slot's triangles are all degenerate (zero cotangent)
    for r in range(strips.shape[0]):
        for j in range(6):
            if keep[r, j]:
                continue
            for i in range(max(0, j - 2), min(4, j + 1)):
                t = strips[r, i:i + 3]
                assert len(set(t.tolist())) < 3


@pytest.mark.parametrize("fixture", ["structured", "delaunay"])
def test_striped_energy_value_grad_vg(fixture, request):
    """The 24-row strip kernel on real striped tables: value, gradient,
    and the single-pass value-and-grad all match the XLA triangle route
    to f32 tolerance (mirrors the paired-kernel test)."""
    from hidenn_fem_tpu.mesh.banded import build_striped_assembly
    mesh = request.getfixturevalue(fixture)
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    v_ref, g_ref = _xla_ref(mesh, model, params)

    ba = build_striped_assembly(np.asarray(mesh.connectivity),
                                mesh.n_nodes, window_limit=700)
    assert ba is not None and ba.k == 6
    assert ba.re_own_lo is not None

    node = model.packed_nodes(params, mesh)
    w_sum = quad.triangle_weight_sum(4)
    v = float(banded_element_energy(node, ba, 10e9, 0.3, w_sum, True))
    assert np.isclose(v, v_ref, rtol=1e-5), (v, v_ref)

    mesh_p = dataclasses.replace(mesh, banded_paired=ba)
    e_bf = ht.PlaneStressEnergy(model=model, backend="pallas_interpret")
    v_vg, g_vg = jax.value_and_grad(
        lambda p: e_bf.domain_energy(p, mesh_p))(params)
    assert np.isclose(float(v_vg), v_ref, rtol=1e-5)
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_vg[k]), ref, rtol=5e-4,
                                   atol=1e-5 * np.abs(ref).max())

    g_p = jax.grad(lambda p: e_bf.domain_energy(p, mesh_p))(params)
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_p[k]), ref, rtol=5e-4,
                                   atol=1e-5 * np.abs(ref).max())


def test_from_arrays_strips_env(monkeypatch):
    m = ht.proxy_plate_mesh(nx=17, ny=9)
    args = (np.asarray(m.coords), np.asarray(m.connectivity))
    monkeypatch.setenv("HDNN_STRIPS", "1")
    forced = TriMesh.from_arrays(*args, build_banded=True)
    assert forced.banded_paired is not None
    assert forced.banded_paired.k == 6
