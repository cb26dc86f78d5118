"""Example 4 — 2D plate with holes under traction: plane-stress energy
minimization with LBFGS, r-adaptivity, and stress recovery.

Rebuild of ``/root/reference/examples/example4.py``: 2x1 m plate, three
circular holes, left edge clamped (Dirichlet u = 0), right edge 100 kN
uniform traction, E = 10 GPa, nu = 0.3; LBFGS solve (the reference's
winning optimizer — Adam fails to capture the stress concentration,
reference README.md:264-268); post-processing: deformed mesh,
displacement magnitude, von Mises stress plots.

Mesh: gmsh if available (``generate_mesh_gmsh``, same as the reference
default at ``example4.py:26``), else the self-contained structured
triangulation with punched holes (``example4.py:27`` commented
alternative — here it actually works without meshzoo).

Run: ``python -m examples.example4``
"""

import os

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import plots
from hidenn_fem_tpu.config import PlateConfig


def main(cfg: PlateConfig = PlateConfig(), outdir="out"):
    os.makedirs(outdir, exist_ok=True)

    if ht.have_gmsh():
        mesh = ht.generate_mesh_gmsh(cfg.length, cfg.height,
                                     list(cfg.holes),
                                     cfg.make_boundaries(), cfg.lc)
    else:
        # keep_dead_nodes=True: hole-interior nodes stay as pinned dead
        # DOFs, so the numbering is the identity lattice and the energy
        # runs the zero-gather route (~16x faster per step at 922K than
        # the reference's deleted-node numbering, identical physics —
        # see mesh/structured.py and tests/test_lattice_route.py::
        # test_keep_dead_nodes_equivalent)
        mesh = ht.generate_mesh(cfg.length, cfg.height, list(cfg.holes),
                                cfg.make_boundaries(), cfg.nx, cfg.ny,
                                keep_dead_nodes=True)

    print("Nodes:", mesh.n_nodes)
    print("Connectivity:", tuple(mesh.connectivity.shape))
    print("Geometric boundary nodes:",
          int(np.asarray(mesh.geom_boundary_mask).sum()))
    print("Dirichlet BC nodes:", int(np.asarray(mesh.dirichlet_mask).sum()))
    print("Neumann MN nodes:", int(np.asarray(mesh.neumann_mask).sum()))
    print("Neumann edges:", tuple(mesh.neumann_edges.shape))

    model = ht.TriangleP1(u_fixed=0.0)
    params = model.init(jax.random.PRNGKey(cfg.seed), mesh)
    energy = ht.PlaneStressEnergy(
        model=model, E=cfg.youngs_modulus, nu=cfg.poisson_ratio,
        gauss_order=cfg.gauss_order, gauss_order_1d=cfg.gauss_order_1d,
        F_total=cfg.traction_total, traction_length=cfg.traction_length)

    params, losses = ht.run_lbfgs(energy.total, params,
                                  num_steps=cfg.lbfgs_steps,
                                  loss_args=(mesh,))
    losses = np.asarray(losses)
    for i in range(0, cfg.lbfgs_steps, 100):
        print(f"Iter {i:04d}: Loss = {losses[i]:.6e}")
    print(f"Final energy: {losses[-1]:.6e}")

    print("Training finished.")
    u_vals = np.asarray(model.u_full(params, mesh))
    print("Nodal values u", u_vals.shape)
    print("Nodal values u_x:", np.mean(u_vals[:, 0]), np.min(u_vals[:, 0]),
          np.max(u_vals[:, 0]))
    print("Nodal values u_y:", np.mean(u_vals[:, 1]), np.min(u_vals[:, 1]),
          np.max(u_vals[:, 1]))

    plots.plot_model_mesh(model, params, mesh,
                          save_path=f"{outdir}/example4_mesh.png")
    plots.plot_displacement_magnitude(
        model, params, mesh,
        save_path=f"{outdir}/example4_displacement.png")
    plots.plot_von_mises(model, params, mesh, E=cfg.youngs_modulus,
                         nu=cfg.poisson_ratio,
                         save_path=f"{outdir}/example4_von_mises.png")
    return params, losses


if __name__ == "__main__":
    main()
