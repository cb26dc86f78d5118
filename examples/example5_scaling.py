"""Example 5 — million-element r-adaptive plate, element-sharded.

The north-star scaling configuration (BASELINE.json config 5): the 2D
plate-under-traction problem on a ~1M-element mesh with r-adaptivity,
element batches sharded over all available devices (ICI on a TPU slice),
nodal parameters replicated, scalar energy psum-reduced.

This has no reference counterpart — the reference is single-device only
(SURVEY.md §2: no distributed code of any kind).  On a single chip the
banded (blocked-window) assembly path is used automatically; on multiple
devices the mesh is padded and sharded over the 'elem' axis.

Run: ``python -m examples.example5_scaling``
(Use XLA_FLAGS=--xla_force_host_platform_device_count=8 + CPU to simulate
8 devices without a pod.)
"""

import time

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.parallel import sharding as sh
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def main(nx=1000, ny=500, lbfgs_steps=200):
    t0 = time.time()
    mesh = ht.generate_mesh(
        length=2.0, height=1.0,
        holes=((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1)),
        nx=nx, ny=ny)
    print(f"mesh: {mesh.n_elements} elements, {mesh.n_nodes} nodes "
          f"({time.time()-t0:.1f}s host gen; banded assembly: "
          f"{mesh.banded is not None})")

    model = ht.TriangleP1(u_fixed=0.0)
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    n_dev = len(jax.devices())
    if n_dev > 1:
        dmesh = sh.device_mesh()
        mesh_run = sh.shard_mesh(mesh, dmesh)
        params = sh.replicate(params, dmesh)
        print(f"sharded over {n_dev} devices (element axis)")
    else:
        mesh_run = mesh

    # throughput probe (slope-timed energy fwd+bwd); the mesh rides as a
    # loop-invariant operand, NOT in the carry (carried tables get copied
    # every iteration — ~ms/step of pure copy at this scale)
    def step(p, m):
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return p, val

    dt = slope_time_scan(step, params, n1=5, n2=55, args=(mesh_run,))
    nqp = mesh.n_elements * 4
    print(f"energy fwd+bwd: {dt*1e3:.2f} ms/step -> {nqp/dt:.3e} qp/s "
          f"({nqp/dt/8.36e5:.0f}x the reference CPU baseline)")

    # a short LBFGS solve (full solves just scale num_steps)
    t0 = time.time()
    p1, losses = ht.run_lbfgs(energy.total, params,
                              num_steps=lbfgs_steps,
                              loss_args=(mesh_run,))
    losses = np.asarray(losses)
    print(f"LBFGS {lbfgs_steps} iters: {time.time()-t0:.1f}s wall "
          f"(cold, includes jit compile), "
          f"energy {losses[0]:.4e} -> {losses[-1]:.4e}")
    t0 = time.time()
    params, losses = ht.run_lbfgs(energy.total, params,
                                  num_steps=lbfgs_steps,
                                  loss_args=(mesh_run,))
    losses = np.asarray(losses)
    print(f"LBFGS {lbfgs_steps} iters: {time.time()-t0:.1f}s wall (warm)")
    return params, losses


if __name__ == "__main__":
    main()
