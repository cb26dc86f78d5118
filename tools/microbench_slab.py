"""On-chip A/B for the slab Pallas kernel vs the XLA lattice route.

Run (real chip): ``python -m tools.microbench_slab [which]`` with
``which`` in {all, plain, dead, 6k, zig, solve, structured}.

Measures production routing (losses level) both ways by toggling
HDNN_LATTICE_SLAB, plus the node-space L-BFGS plate solve and the
structured-grid kernel route.  When the kernel wins, flip the
defaults (losses._lattice_total, structured_grid._domain_from_node)
and refresh bench/PARITY/README — see CLAUDE.md round-3 notes.
"""
import os
import sys
import time

import jax
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.mesh.structured import generate_mesh
from hidenn_fem_tpu.utils.profiling import slope_time_scan

HOLES = ((0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1))


def measure(mesh, tag):
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    for label, env in [("xla-route", "0"), ("slab-kern", "1")]:
        os.environ.pop("HDNN_LATTICE_SLAB", None)
        os.environ.pop("HDNN_NO_SLAB", None)
        if env == "1":
            os.environ["HDNN_LATTICE_SLAB"] = "1"
        else:
            os.environ["HDNN_NO_SLAB"] = "1"   # robust to a default flip
        energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
        v = float(energy(params, mesh))

        def step_vg(p, mesh):
            val, g = jax.value_and_grad(
                lambda q: energy(q, mesh))(p)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g), val

        def step_val(u, coords, mesh):
            val = energy({"u": u, "coords": coords}, mesh)
            return u + 0 * val, val

        t_vg = slope_time_scan(step_vg, params, args=(mesh,))
        t_v = slope_time_scan(step_val, params["u"],
                              args=(params["coords"], mesh))
        print(f"{tag:18s} {label}: value={v:.6e}  "
              f"vg {t_vg*1e6:8.1f} us  val {t_v*1e6:8.1f} us",
              flush=True)


def solve_ab():
    mesh = ht.proxy_plate_mesh(nx=81, ny=41)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    for label, env in [("params-xla", None), ("params-slab", "1"),
                       ("node-slab", "1node"), ("node-xla", "0node")]:
        os.environ.pop("HDNN_LATTICE_SLAB", None)
        if env and env.startswith("1"):
            os.environ["HDNN_LATTICE_SLAB"] = "1"
        energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
        # Stable loss identities only: a per-leg lambda would recompile
        # the whole solve inside the timed region (the jit
        # function-identity trap — CLAUDE.md).
        if env and env.endswith("node"):
            sol, losses = ht.lbfgs_node_space(energy, params, mesh,
                                              num_steps=600)
            np.asarray(losses)
            t0 = time.time()
            sol, losses = ht.lbfgs_node_space(energy, params, mesh,
                                              num_steps=600)
            np.asarray(losses)
        else:
            sol, losses = ht.run_lbfgs(energy.total, params,
                                       num_steps=600, loss_args=(mesh,))
            np.asarray(losses)
            t0 = time.time()
            sol, losses = ht.run_lbfgs(energy.total, params,
                                       num_steps=600, loss_args=(mesh,))
            np.asarray(losses)
        print(f"plate-lbfgs600 {label}: warm {time.time()-t0:.3f}s "
              f"final {float(np.asarray(losses)[-1]):.6f}", flush=True)


def structured_ab():
    from hidenn_fem_tpu.models.structured_grid import (
        StructuredGridP1, generate_structured_grid)
    grid = generate_structured_grid(nx=961, ny=481)
    model = StructuredGridP1(E=10e9, nu=0.3)
    params = model.init(jax.random.PRNGKey(0), grid)
    for label, env in [("xla", None), ("slab", "1")]:
        os.environ.pop("HDNN_LATTICE_SLAB", None)
        os.environ.pop("HDNN_NO_SLAB", None)
        if env:
            os.environ["HDNN_LATTICE_SLAB"] = "1"
        else:
            os.environ["HDNN_NO_SLAB"] = "1"

        def step(p, grid):
            val, g = jax.value_and_grad(
                lambda q: model.total(q, grid))(p)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g), val

        t = slope_time_scan(step, params, args=(grid,))
        print(f"structured-922k {label}: vg {t*1e6:8.1f} us", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "plain"):
        measure(ht.proxy_plate_mesh(nx=961, ny=481), "922k-plain")
    if which in ("all", "dead"):
        measure(generate_mesh(nx=961, ny=481, holes=HOLES, variant="up",
                              keep_dead_nodes=True), "922k-holes-dead")
    if which in ("all", "6k"):
        measure(ht.proxy_plate_mesh(nx=81, ny=41), "6.4k-plain")
    if which in ("all", "zig"):
        measure(generate_mesh(nx=241, ny=121, holes=(),
                              variant="zigzag"), "58k-zigzag")
    if which in ("all", "solve"):
        solve_ab()
    if which in ("all", "structured"):
        structured_ab()


if __name__ == "__main__":
    main()
