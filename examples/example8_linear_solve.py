"""Example 8: direct FEM displacement solve by matrix-free CG.

The reference only ever *optimizes* its energies (Adam / L-BFGS,
``/root/reference/examples/example4.py:53-138``); but at a fixed mesh the
plate energy is quadratic in the nodal values — the classic linear FEM
system K u = f.  ``cg_solve`` solves it directly: conjugate gradients
with the stiffness matvec evaluated as grad(p0+v) − grad(p0) (exact for
quadratic energies), every iteration riding the production reverse-mode
fast paths.  ``radapt_cg_solve`` then alternates exact displacement
solves with coordinate (r-adaptivity) steps.

Measured warm on one TPU v5e chip: the 6,400-element plate converges to
1e-6 relative residual in ~68 ms (337 matvecs); the 922K-element
structured plate in 0.195 s.

Run: ``python -m examples.example8_linear_solve``
"""

from __future__ import annotations

import time

import jax
import numpy as np

import hidenn_fem_tpu as ht


def main(nx: int = 81, ny: int = 41, max_iters: int = 600,
         radapt_epochs: int = 3):
    mesh = ht.proxy_plate_mesh(nx=nx, ny=ny)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    coords0 = params["coords"]

    def u_loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    t0 = time.time()
    sol, hist = ht.cg_solve(u_loss, {"u": params["u"]},
                            loss_args=(coords0, mesh),
                            max_iters=max_iters, tol=1e-6)
    h = np.asarray(hist)
    iters = int(np.count_nonzero(h))
    e_lin = float(u_loss(sol, coords0, mesh))
    print(f"CG displacement solve: {iters} matvecs to rel res "
          f"{h[h > 0][-1]:.2e} ({time.time()-t0:.2f}s incl. compile); "
          f"energy {e_lin:.6e}")

    def loss(p, m):
        return energy(p, m)

    t0 = time.time()
    pf, energies = ht.radapt_cg_solve(
        loss, {"u": sol["u"], "coords": coords0}, loss_args=(mesh,),
        outer_epochs=radapt_epochs, cg_iters=max_iters,
        coord_steps=20, coord_lr=1e-5)
    e = np.asarray(energies)
    print(f"r-adaptive CG ({radapt_epochs} epochs): energy "
          f"{e[0]:.6e} -> {e[-1]:.6e} ({time.time()-t0:.2f}s)")
    return pf, e


if __name__ == "__main__":
    main()
