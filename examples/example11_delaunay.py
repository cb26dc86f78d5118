"""Example 11: the gmsh workflow without gmsh — native Delaunay mesh.

The reference's flagship example 4 defaults to a real gmsh OCC mesh
(``/root/reference/examples/example4.py:14-26``: 2x1 plate, three
circular holes, left face clamped, 100 kN traction on the right,
mesh size lc).  gmsh cannot be installed in every environment, so
``mesh/delaunay.py`` builds the same mesh from first principles
(boundary/rim sampling + hex interior + Delaunay + smoothing +
RCM-banded node ordering).  The result is genuinely irregular —
lattice detection rejects it, so this example exercises exactly the
production path a gmsh user hits:

1. generate the unstructured mesh (``generate_mesh_unstructured``
   dispatches to gmsh when installed, Delaunay otherwise),
2. displacement solve by auxiliary-space PCG (example 10's machinery —
   the right solver for a mesh with no lattice),
3. von Mises stress recovery + the reference's result figures.

Run: ``python -m examples.example11_delaunay [lc]`` (default 0.05,
the reference's example-4 size — about 4,400 elements).
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


def main(lc: float = 0.05, outdir: str = "out"):
    os.makedirs(outdir, exist_ok=True)
    t0 = time.time()
    # the Delaunay backend directly: this example demonstrates the
    # genuinely-irregular path (the generate_mesh_unstructured
    # dispatcher now auto-hybridizes qualifying hole layouts instead —
    # see mesh/delaunay.py)
    mesh = ht.generate_mesh_delaunay(holes=HOLES, lc=lc)
    print(f"mesh: {mesh.n_elements} elements / {mesh.n_nodes} nodes "
          f"(lc={lc:g}, {time.time() - t0:.2f}s, "
          f"lattice={'yes' if mesh.lattice is not None else 'no'})")

    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    # displacement solve at fixed geometry: aux-space PCG (example 10)
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

    plots.plot_mesh(mesh, save_path=f"{outdir}/ex11_mesh.png")
    plots.plot_displacement_magnitude(
        model, params, mesh, save_path=f"{outdir}/ex11_disp.png")
    plots.plot_von_mises(model, params, mesh, E=10e9, nu=0.3,
                         save_path=f"{outdir}/ex11_von_mises.png")
    print(f"figures: {outdir}/ex11_{{mesh,disp,von_mises}}.png")
    return e


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.05)
