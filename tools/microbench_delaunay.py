"""On-chip numbers for REAL irregular meshes (mesh/delaunay.py).

The repo's "unstructured" rows elsewhere are measured on
lattice-topology proxy meshes with the lattice route disabled; this
harness generates genuinely irregular Delaunay meshes (lattice
detection rejects them, so every number below is the production
routing a gmsh user would hit) and measures:

* host-side preprocessing (mesh gen + banded tables),
* the fwd+bwd energy step at ~6.4K and ~922K elements,
* the auxiliary-space PCG displacement solve at ~922K.

Run (real chip): ``python -m tools.microbench_delaunay [small|big]``.
"""
import sys
import time

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.models.structured_grid import StructuredGridP1
from hidenn_fem_tpu.utils.profiling import slope_time_scan

HOLES = ((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1))


def build(tag, lc):
    t0 = time.time()
    mesh = ht.generate_mesh_delaunay(holes=HOLES, lc=lc)
    ne = int(mesh.connectivity.shape[0])
    nn = int(mesh.coords.shape[0])
    print(f"{tag}: {ne} elements / {nn} nodes "
          f"(lc={lc:.4g}, prep {time.time() - t0:.1f}s, "
          f"lattice={mesh.lattice})", flush=True)
    return mesh


def step_bench(tag, mesh):
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def step_vg(p, mesh):
        val, g = jax.value_and_grad(energy.total)(p, mesh)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g), val

    t = slope_time_scan(step_vg, params, args=(mesh,))
    print(f"{tag}: fwd+bwd {t*1e6:8.1f} us/step", flush=True)
    return model, params, energy


def aux_bench(tag, mesh, model, params, energy):
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    up = {"u": params["u"]}
    bg = StructuredGridP1(E=10e9, nu=0.3)
    t0 = time.time()
    pre = ht.build_aux_preconditioner(loss, up, (coords0, mesh), mesh,
                                      bg_model=bg)
    print(f"{tag}: aux setup bg {pre.grid.nx}x{pre.grid.ny} "
          f"({time.time() - t0:.1f}s incl. compile)", flush=True)
    sol, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                 bg_model=bg, max_iters=100, tol=1e-6)
    np.asarray(hist)
    t0 = time.time()
    sol, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                 bg_model=bg, max_iters=100, tol=1e-6)
    h = np.asarray(hist)
    nz = h[h > 0]
    print(f"{tag}: aux-PCG {len(nz)} iters to {nz[-1]:.2e}, "
          f"warm {time.time() - t0:.3f}s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "small"):
        mesh = build("delaunay-6k ", 0.0262)
        step_bench("delaunay-6k ", mesh)
    if which in ("all", "big"):
        mesh = build("delaunay-922k", 0.00218)
        model, params, energy = step_bench("delaunay-922k", mesh)
        aux_bench("delaunay-922k", mesh, model, params, energy)


if __name__ == "__main__":
    main()
