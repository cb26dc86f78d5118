"""shard_map composition of the slab kernel (parallel/sharded_slab.py):
value and both gradient groups match the single-device slab kernel and
the XLA lattice route on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.structured import generate_mesh
from hidenn_fem_tpu.parallel.sharded_slab import shard_map_lattice_slab


def _dmesh():
    devs = np.array(jax.devices("cpu")[:8])
    from hidenn_fem_tpu.parallel.sharding import ELEM_AXIS
    return Mesh(devs, (ELEM_AXIS,))


def _perturbed_params(model, mesh):
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    params["coords"] = params["coords"] + 1e-3 * jax.random.normal(
        jax.random.PRNGKey(2), params["coords"].shape)
    return params


@pytest.mark.parametrize("variant,holes,keep_dead", [
    ("up", (), False),
    ("zigzag", (), False),
    ("up", ((0.6, 0.4, 0.15),), True),
])
def test_sharded_slab_matches_single_device(variant, holes, keep_dead):
    mesh = generate_mesh(nx=65, ny=17, holes=holes, variant=variant,
                         keep_dead_nodes=keep_dead)
    model = ht.TriangleP1()
    params = _perturbed_params(model, mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  backend="pallas_interpret")
    ref_energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                      backend="xla")
    sharded = shard_map_lattice_slab(energy, _dmesh())

    v1, g1 = jax.value_and_grad(lambda p: sharded(p, mesh))(params)
    v2, g2 = jax.value_and_grad(lambda p: ref_energy(p, mesh))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-6)
    for k in ("u", "coords"):
        scale = float(jnp.max(jnp.abs(g2[k]))) + 1e-30
        np.testing.assert_allclose(np.asarray(g1[k]) / scale,
                                   np.asarray(g2[k]) / scale,
                                   atol=2e-6)


def test_sharded_slab_rejects_renumbered():
    mesh = generate_mesh(nx=33, ny=17, holes=((1.0, 0.5, 0.25),),
                         variant="up")
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    sharded = shard_map_lattice_slab(energy, _dmesh())
    with pytest.raises(ValueError, match="slab-kernel set"):
        sharded(params, mesh)
