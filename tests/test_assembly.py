"""Scatter-free (incidence-gather) assembly backward: exact agreement
with XLA scatter-add AD, including under element padding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.types import build_incidence_table
from hidenn_fem_tpu.ops.assembly import gather_with_incidence
from hidenn_fem_tpu.parallel import sharding as sh


def test_incidence_table_correct():
    conn = np.asarray([[0, 1, 2], [1, 2, 3], [3, 0, 1]])
    table = build_incidence_table(conn, 5)
    flat = conn.reshape(-1)
    for n in range(5):
        rows = sorted(r for r in table[n] if r >= 0)
        assert rows == sorted(np.nonzero(flat == n)[0].tolist())
    # node 4 unused -> all -1
    assert np.all(table[4] == -1)


def test_gather_backward_matches_scatter():
    mesh = ht.proxy_plate_mesh(nx=13, ny=7)
    key = jax.random.PRNGKey(0)
    node = jax.random.normal(key, (mesh.n_nodes, 4))

    def f_inc(node):
        g = gather_with_incidence(node, mesh.connectivity, mesh.incidence)
        return jnp.sum(jnp.sin(g) * g)

    def f_scat(node):
        g = node[mesh.connectivity]
        return jnp.sum(jnp.sin(g) * g)

    assert np.isclose(float(f_inc(node)), float(f_scat(node)))
    g1 = jax.grad(f_inc)(node)
    g2 = jax.grad(f_scat)(node)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6,
                               atol=1e-7)


def test_energy_grads_incidence_vs_scatter():
    """The library fused path with mesh.incidence set must produce the
    same gradients as with it stripped (scatter AD)."""
    mesh = ht.proxy_plate_mesh(nx=13, ny=7)
    mesh_noinc = dataclasses.replace(mesh, incidence=None)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=model)
    g1 = jax.grad(lambda p: energy(p, mesh))(params)
    g2 = jax.grad(lambda p: energy(p, mesh_noinc))(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-5, atol=1e-9)


def test_incidence_backward_with_padding():
    """Element padding appended after the incidence table was built must
    not change gradients (padded degenerate elements have exactly-zero
    cotangents; -1 slots hit the appended zeros row)."""
    import dataclasses
    # strip the lattice route on both sides: this test is about the
    # incidence-gather backward, which the route would bypass
    mesh = dataclasses.replace(ht.proxy_plate_mesh(nx=13, ny=7),
                               lattice=None)
    padded = sh.pad_mesh(mesh, 7)
    assert padded.incidence is not None  # pad_mesh keeps the table
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=model)
    g1 = jax.grad(lambda p: energy(p, mesh))(params)
    g2 = jax.grad(lambda p: energy(p, padded))(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-6, atol=1e-10)


def test_incidence_gather_sum_matches_flat():
    """The split per-slot gather-sum (fusion-preserving backward form,
    ops/assembly.py) must equal the flat [N*K] gather + reshape +
    axis-sum it replaced, including -1 sentinel slots (which wrap to the
    appended zeros row)."""
    from hidenn_fem_tpu.ops import assembly as asm
    from hidenn_fem_tpu.ops.assembly import (incidence_gather_sum,
                                             weighted_incidence_gather_sum)
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(41, 3)).astype(np.float32))
    # last row is the zeros/sentinel row, as every call site arranges
    table = table.at[-1].set(0.0)
    inc = rng.integers(0, 40, size=(29, 5)).astype(np.int32)
    inc[rng.random(inc.shape) < 0.3] = -1
    inc = jnp.asarray(inc)
    w = jnp.asarray(rng.normal(size=(29, 5)).astype(np.float32))

    flat = jnp.sum(table[inc.reshape(-1)].reshape(29, 5, 3), axis=1)
    wflat = jnp.sum(w[..., None] * table[inc.reshape(-1)].reshape(29, 5, 3),
                    axis=1)
    # exercise BOTH sides of the size gate (the split form above
    # _SPLIT_MIN_ROWS output rows, the flat form below it)
    saved = asm._SPLIT_MIN_ROWS
    for thresh in (saved, 1):
        asm._SPLIT_MIN_ROWS = thresh
        try:
            np.testing.assert_allclose(
                np.asarray(incidence_gather_sum(table, inc)),
                np.asarray(flat), rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(
                np.asarray(weighted_incidence_gather_sum(table, inc, w)),
                np.asarray(wflat), rtol=1e-6, atol=1e-6)
        finally:
            asm._SPLIT_MIN_ROWS = saved
