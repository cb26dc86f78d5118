"""Microbench: 922K-element lattice-route value_and_grad on the real chip.

Establishes the A/B baseline for fused-kernel work on the lattice
energy (``ops/lattice_energy.py``): per-step device time of the full
training step (energy + grads w.r.t. u AND coords) and of the matvec
step (grads w.r.t. u only), via slope timing (the only reliable timer
through the axon tunnel — see utils/profiling.py).

Also prints the HBM roofline lower bound: the step must at least read
the [N, 4] f32 node table and write same-shape gradients, so
bytes >= 3 * N * 4 * 4 (read + two grad groups); everything XLA
materializes beyond that is overhead a fused kernel can remove.

Run: ``python -m tools.microbench_lattice [nx ny]``
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import hidenn_fem_tpu as ht
from hidenn_fem_tpu.utils.profiling import slope_time_scan


def main(nx: int = 961, ny: int = 481):
    mesh = ht.proxy_plate_mesh(nx=nx, ny=ny)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    assert mesh.lattice is not None
    n = params["u"].shape[0]
    print(f"lattice {mesh.lattice.nx}x{mesh.lattice.ny} "
          f"identity={mesh.lattice.identity} "
          f"uniform_sel={mesh.lattice.uniform_sel!r} N={n}")

    def step_full(p, mesh):
        val, g = jax.value_and_grad(lambda q: energy(q, mesh))(p)
        p = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
        return p, val

    def step_u(u, coords, mesh):
        val, g = jax.value_and_grad(
            lambda q: energy({"u": q, "coords": coords}, mesh))(u)
        return u - 1e-12 * g, val

    def step_value(u, coords, mesh):
        val = energy({"u": u, "coords": coords}, mesh)
        return u + 0 * val, val

    t_full = slope_time_scan(step_full, params, args=(mesh,))
    t_u = slope_time_scan(
        lambda u, c, m: step_u(u, c, m), params["u"],
        args=(params["coords"], mesh))
    t_val = slope_time_scan(
        lambda u, c, m: step_value(u, c, m), params["u"],
        args=(params["coords"], mesh))

    floor_full = 3 * n * 4 * 4          # read node + write du + dcoords
    floor_u = (2 * n * 4 + n * 2) * 4   # read node, write du
    peak = 819e9
    print(f"fwd+bwd (u+coords): {t_full * 1e6:8.1f} us/step  "
          f"lb {floor_full / t_full / 1e9:6.1f} GB/s "
          f"({floor_full / t_full / peak * 100:4.1f}% peak)")
    print(f"fwd+bwd (u only):   {t_u * 1e6:8.1f} us/step  "
          f"lb {floor_u / t_u / 1e9:6.1f} GB/s "
          f"({floor_u / t_u / peak * 100:4.1f}% peak)")
    print(f"value only:         {t_val * 1e6:8.1f} us/step")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
