"""Collar-route A/B: split per-slot vs flat incidence-gather backward.

The split per-slot incidence gather (``ops/assembly.py:
incidence_gather_sum``) is a big win inside the ~29K-row banded node
blocks (12.14 -> 9.29 ms/step at 922K, ``tools/microbench_pairlegs.py``)
but a disaster on the hybrid collar's ~2.5K-row compact table: each of
the K=6 separate gathers pays a fixed per-op cost that tiny shapes
cannot amortize.  This harness measures the SAME 847K hybrid mesh's
production vg step with the helper forced each way.

## Measured (r5, 847K 3-hole hybrid, v5e)

  split forced :  1722.9 us/step
  flat  forced :   377.4 us/step   (4.6x — the regression that led to
                                    the _SPLIT_MIN_ROWS size gate)

Run (real chip): ``python -m tools.microbench_collar``.
"""
import jax
import jax.numpy as jnp

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.hybrid import generate_mesh_hybrid
from hidenn_fem_tpu.ops import assembly
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def main():
    mesh = generate_mesh_hybrid(lc=0.00209)
    hy = mesh.hybrid
    print("elements", mesh.connectivity.shape[0], "collar",
          hy.extra_conn_rel.shape, hy.extra_incidence.shape, flush=True)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    params["u"] = 1e-4 * jax.random.normal(jax.random.PRNGKey(1),
                                           params["u"].shape)
    energy = ht.PlaneStressEnergy(model=model)

    def timed(tag):
        def step(p, m):
            val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
            p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
            return p, val

        t = slope_time_scan(step, params, n1=10, n2=110, args=(mesh,))
        print(f"{tag}: {t * 1e6:8.1f} us/step", flush=True)

    saved = assembly._SPLIT_MIN_ROWS
    try:
        assembly._SPLIT_MIN_ROWS = 0          # force the split form
        timed("split forced")
        jax.clear_caches()
        assembly._SPLIT_MIN_ROWS = 1 << 60    # force the flat form
        timed("flat  forced")
    finally:
        assembly._SPLIT_MIN_ROWS = saved


if __name__ == "__main__":
    main()
