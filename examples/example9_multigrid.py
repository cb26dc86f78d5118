"""Example 9: geometric multigrid displacement solve at 922K elements.

The reference's flagship plate problem is solved with 600 L-BFGS
iterations (``/root/reference/examples/example4.py:68-80``, 13.8 s on
CPU).  At fixed node coordinates it is the linear FEM system K u = f;
``solve/multigrid.py`` solves it with V-cycle-preconditioned CG built
entirely from TPU-native lattice ops (subsample / interleave / slice —
no gathers, no scatters), with every level operator a gradient of the
production structured-grid energy.

Measured warm on one TPU v5e chip at 921,600 elements (961x481 lattice):

* plain matrix-free CG: 2,190 matvecs, 0.196 s
* MG-PCG: **15 iterations, 0.047 s** (wall, incl. the ~40 ms tunnel
  scalar fetch), agreeing with CG to 2.1e-7 in max |u| difference
* hierarchy setup (6 levels, exact colored-probe diagonals + power
  iteration): ~3 s warm, reusable across solves

``radapt_mg_solve`` then alternates exact MG solves with node-coordinate
descent — r-adaptivity with an equilibrated inner state every epoch.

Run: ``python -m examples.example9_multigrid [nx ny]``
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.models.structured_grid import (
    StructuredGridP1, generate_structured_grid)


def main(nx: int = 961, ny: int = 481, radapt_epochs: int = 0):
    grid = generate_structured_grid(length=2.0, height=1.0, holes=(),
                                    nx=nx, ny=ny)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)

    t0 = time.time()
    levels = ht.build_hierarchy(model, grid, model.coords(params, grid))
    print(f"hierarchy: {[(l.grid.nx, l.grid.ny) for l in levels]} "
          f"({time.time() - t0:.1f}s incl. compile)")

    t0 = time.time()
    sol, hist = ht.mg_pcg_solve(model, grid, params, max_iters=40,
                                tol=1e-6, levels=levels)
    h = np.asarray(hist)
    nz = h[h > 0]
    print(f"MG-PCG: {len(nz)} iterations to rel res {nz[-1]:.2e} "
          f"({time.time() - t0:.1f}s incl. compile); "
          f"energy {float(model(sol, grid)):.6e}")

    t0 = time.time()
    sol, hist = ht.mg_pcg_solve(model, grid, params, max_iters=40,
                                tol=1e-6, levels=levels)
    np.asarray(hist)          # materialize: dispatch alone is async
    print(f"warm solve: {time.time() - t0:.3f}s")

    if radapt_epochs:
        t0 = time.time()
        pf, energies = ht.radapt_mg_solve(
            model, grid, params, outer_epochs=radapt_epochs,
            coord_steps=10, coord_lr=1e-7)
        e = np.asarray(energies)
        print(f"r-adaptive MG ({radapt_epochs} epochs): energy "
              f"{e[0]:.6e} -> {e[-1]:.6e} ({time.time() - t0:.1f}s)")
        return pf, e
    return sol, h


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
