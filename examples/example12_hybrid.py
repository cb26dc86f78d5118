"""Example 12: hole geometry at lattice speed — the hybrid mesh.

The same plate-with-holes problem as the flagship example 4
(``/root/reference/examples/example4.py:14-26``: 2x1 plate, three
circular holes, left face clamped, 100 kN traction on the right), on a
``generate_mesh_hybrid`` mesh: a structured triangular lattice
everywhere the domain is rectangular, tied to exact circle rims by a
thin Delaunay collar (``mesh/hybrid.py``).  The energy then evaluates
almost entirely from node-lattice SLICES — zero assembly gathers for
the lattice part, one tiny O(rim) gather for the collar — instead of
the 3*Ne-row connectivity gathers that bound fully unstructured
meshes.  Compare with example 11 (the genuinely irregular Delaunay
mesh) at the same lc: identical physics, ~order-of-magnitude cheaper
steps at scale.

Pipeline mirrors example 11: displacement solve by auxiliary-space
PCG, then von Mises recovery + the reference's result figures.

Run: ``python -m examples.example12_hybrid [lc]`` (default 0.02 —
about 9,400 elements).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import plots
from hidenn_fem_tpu.models.structured_grid import StructuredGridP1

HOLES = ((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1))


def main(lc: float = 0.02, outdir: str = "out"):
    os.makedirs(outdir, exist_ok=True)
    t0 = time.time()
    mesh = ht.generate_mesh_hybrid(holes=HOLES, lc=lc)
    k = int(mesh.hybrid.extra_conn.shape[0])
    print(f"mesh: {mesh.n_elements} elements / {mesh.n_nodes} nodes, "
          f"{k} collar triangles ({100.0 * k / mesh.n_elements:.1f}% "
          f"ride gathers; lc={lc:g}, {time.time() - t0:.2f}s)")

    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    # displacement solve at fixed geometry: aux-space PCG (example 10);
    # every matvec rides the hybrid slice+collar route
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    up = {"u": params["u"]}
    bg = StructuredGridP1(E=10e9, nu=0.3)
    t0 = time.time()
    pre = ht.build_aux_preconditioner(loss, up, (coords0, mesh), mesh,
                                      bg_model=bg)
    sol, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                 bg_model=bg, max_iters=200, tol=1e-6)
    h = np.asarray(hist)
    nz = h[h > 0]
    print(f"aux-PCG: {len(nz)} iterations to rel residual "
          f"{nz[-1]:.2e} ({time.time() - t0:.2f}s incl. compile)")

    params = dict(params, u=sol["u"])
    e = float(energy.total(params, mesh))
    u = np.asarray(model.u_full(params, mesh))
    print(f"energy {e:.4f}, max u_x {u[:, 0].max():.3e} m")

    plots.plot_mesh(mesh, save_path=f"{outdir}/ex12_mesh.png")
    plots.plot_displacement_magnitude(
        model, params, mesh, save_path=f"{outdir}/ex12_disp.png")
    plots.plot_von_mises(model, params, mesh, E=10e9, nu=0.3,
                         save_path=f"{outdir}/ex12_von_mises.png")
    print(f"figures: {outdir}/ex12_{{mesh,disp,von_mises}}.png")
    return e


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
