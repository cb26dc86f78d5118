"""On-chip numbers for hybrid lattice+collar meshes (mesh/hybrid.py).

The claim to verify: production plate-with-circular-holes geometry
(exact rims, like a gmsh/Delaunay mesh) at near-lattice-route speed —
the energy step should land close to the keep-dead structured lattice
numbers (~0.2 ms at 922K) instead of the ~18 ms the banded gather path
costs on a Delaunay mesh of the same size, because only the O(rim)
collar rides gathers.

Measures, per scale:
* host-side preprocessing,
* the fwd+bwd energy step through the hybrid route,
* the same mesh forced down the generic banded path (route disabled,
  banded tables rebuilt) — the honest A/B on identical geometry,
* the auxiliary-space PCG displacement solve (big scale).

Run (real chip): ``python -m tools.microbench_hybrid [small|big]``.
"""
import sys
import time

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.types import TriMesh
from hidenn_fem_tpu.models.structured_grid import StructuredGridP1
from hidenn_fem_tpu.utils.profiling import slope_time_scan

HOLES = ((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1))


def build(tag, lc):
    t0 = time.time()
    mesh = ht.generate_mesh_hybrid(holes=HOLES, lc=lc)
    ne = int(mesh.connectivity.shape[0])
    nn = int(mesh.coords.shape[0])
    k = int(mesh.hybrid.extra_conn.shape[0])
    print(f"{tag}: {ne} elements / {nn} nodes / {k} collar "
          f"(lc={lc:.4g}, prep {time.time() - t0:.1f}s)", flush=True)
    return mesh


def step_bench(tag, mesh):
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    def step_vg(p, mesh):
        val, g = jax.value_and_grad(energy.total)(p, mesh)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g), val

    t = slope_time_scan(step_vg, params, args=(mesh,))
    print(f"{tag}: fwd+bwd {t*1e6:8.1f} us/step (hybrid route)",
          flush=True)
    return model, params, energy, step_vg


def generic_bench(tag, mesh, params, step_vg):
    # identical geometry, route off, banded tables on — what the same
    # mesh costs as a plain unstructured mesh
    t0 = time.time()
    plain = TriMesh.from_arrays(
        coords=np.asarray(mesh.coords),
        connectivity=np.asarray(mesh.connectivity),
        geom_boundary_mask=np.asarray(mesh.geom_boundary_mask),
        dirichlet_mask=np.asarray(mesh.dirichlet_mask),
        neumann_mask=np.asarray(mesh.neumann_mask),
        neumann_edges=np.asarray(mesh.neumann_edges),
        build_lattice=False)
    prep = time.time() - t0
    t = slope_time_scan(step_vg, params, args=(plain,))
    print(f"{tag}: fwd+bwd {t*1e6:8.1f} us/step (generic banded path, "
          f"tables {prep:.1f}s)", flush=True)


def aux_bench(tag, mesh, model, params, energy, lattice_bg=True):
    coords0 = params["coords"]

    def loss(p, coords, m):
        return energy({"u": p["u"], "coords": coords}, m)

    up = {"u": params["u"]}
    bg = StructuredGridP1(E=10e9, nu=0.3)
    tag = f"{tag}{'' if lattice_bg else ' generic-bg'}"
    t0 = time.time()
    pre = ht.build_aux_preconditioner(loss, up, (coords0, mesh), mesh,
                                      bg_model=bg,
                                      lattice_bg=lattice_bg)
    print(f"{tag}: aux setup bg {pre.grid.nx}x{pre.grid.ny} "
          f"({time.time() - t0:.1f}s incl. compile)", flush=True)
    sol, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                 bg_model=bg, max_iters=100, tol=3e-6)
    np.asarray(hist)
    t0 = time.time()
    sol, hist = ht.aux_pcg_solve(loss, up, (coords0, mesh), pre=pre,
                                 bg_model=bg, max_iters=100, tol=3e-6)
    h = np.asarray(hist)
    nz = h[h > 0]
    print(f"{tag}: aux-PCG {len(nz)} iters to {nz[-1]:.2e}, "
          f"warm {time.time() - t0:.3f}s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "small"):
        mesh = build("hybrid-6k  ", 0.0252)
        model, params, energy, step_vg = step_bench("hybrid-6k  ", mesh)
        generic_bench("hybrid-6k  ", mesh, params, step_vg)
    if which in ("all", "big"):
        mesh = build("hybrid-922k", 0.00209)
        model, params, energy, step_vg = step_bench("hybrid-922k", mesh)
        generic_bench("hybrid-922k", mesh, params, step_vg)
        aux_bench("hybrid-922k", mesh, model, params, energy,
                  lattice_bg=False)
        aux_bench("hybrid-922k", mesh, model, params, energy,
                  lattice_bg=True)


if __name__ == "__main__":
    main()
