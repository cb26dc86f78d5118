"""Example 6 — million-element plate on the gather-free structured path.

The structured-lattice model (``models/structured_grid.py``) assembles by
array slices instead of gathers: ~73 microseconds per energy
forward+backward at 922K elements on one v5e chip (~60,000x the reference
CPU baseline).  This example runs the full plate-with-holes solve at that
scale — LBFGS with r-adaptivity — and recovers the von Mises field via
the exact TriMesh equivalence.

No reference counterpart (the reference is single-device, gather-based,
and tops out ~1e6 quadrature evals/sec).

Run: ``python -m examples.example6_structured``
"""

import os
import time

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import plots
from hidenn_fem_tpu.models.structured_grid import (StructuredGridP1,
                                                   generate_structured_grid)


def main(nx=1000, ny=500, lbfgs_steps=600, outdir="out"):
    os.makedirs(outdir, exist_ok=True)
    t0 = time.time()
    grid = generate_structured_grid(
        length=2.0, height=1.0,
        holes=((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1)),
        nx=nx, ny=ny)
    print(f"lattice {nx}x{ny}: {grid.n_elements} active elements "
          f"({time.time()-t0:.1f}s host gen)")

    model = StructuredGridP1(E=10e9, nu=0.3, F_total=100e3)
    params = model.init(jax.random.PRNGKey(0), grid)

    t0 = time.time()
    params, losses = ht.run_lbfgs(model.total, params,
                                  num_steps=lbfgs_steps, memory_size=10,
                                  loss_args=(grid,))
    losses = np.asarray(losses)
    print(f"LBFGS {lbfgs_steps} iters: {time.time()-t0:.1f}s wall "
          f"(incl compile); energy {losses[0]:.4e} -> {losses[-1]:.4e}")

    # post-processing through the exact TriMesh equivalence
    mesh = model.to_trimesh(grid)
    tparams = {"coords": params["coords"].reshape(-1, 2),
               "u": params["u"].reshape(-1, 2)}
    tmodel = ht.TriangleP1()
    u = np.asarray(tmodel.u_full(tparams, mesh))
    print("u_x:", u[:, 0].mean(), u[:, 0].min(), u[:, 0].max())
    plots.plot_von_mises(tmodel, tparams, mesh, E=10e9, nu=0.3,
                         save_path=f"{outdir}/example6_von_mises.png")
    return params, losses


if __name__ == "__main__":
    main()
