"""Example 7: element-sharded plate solve over a JAX device mesh.

The reference has no distributed code (SURVEY.md §2); this demonstrates
the framework's production parallelism on the example-4 plate problem
(``/root/reference/examples/example4.py``): banded-table block axes
sharded over the device mesh (``parallel/sharding.py``), forward scalar
partials psum-reduced over ICI, and the communication-free recompute
backward.  On a machine without a TPU pod it runs on virtual CPU
devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m examples.example7_sharded

On a real v5e-8 the same code runs unchanged (drop the XLA_FLAGS).
"""

from __future__ import annotations

import os

import numpy as np


def _ensure_devices(n: int) -> None:
    os.environ.setdefault("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] = (
            os.environ["XLA_FLAGS"]
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()


def main(nx: int = 129, ny: int = 65, n_devices: int = 8,
         lbfgs_steps: int = 200, outdir: str = "out"):
    import jax
    if jax.local_device_count() < n_devices:
        # only possible before backend init; harmless otherwise
        try:
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass

    import hidenn_fem_tpu as ht
    from hidenn_fem_tpu.parallel import sharding as sh

    mesh = ht.generate_mesh(length=2.0, height=1.0,
                            holes=[(0.5, 0.7, 0.12), (1.0, 0.3, 0.15),
                                   (1.4, 0.6, 0.1)],
                            boundaries={"up": 0, "down": 0, "right": 2,
                                        "left": 1},
                            nx=nx, ny=ny)
    print(f"Nodes: {mesh.n_nodes}  elements: {mesh.n_elements}")

    dmesh = sh.device_mesh(n_devices)
    print(f"device mesh: {dmesh.devices.size} x "
          f"{dmesh.devices[0].platform}")
    banded = sh.reband_for_shards(mesh, n_devices, window_limit=50_000)
    tbl = (banded.banded_paired if banded.banded_paired is not None
           else banded.banded)
    print(f"banded blocks (k={tbl.k}): fwd {tbl.starts.shape[0]}, "
          f"bwd {tbl.re_nstarts.shape[0]} "
          f"({n_devices} devices x contiguous slices)")

    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    loss_fn = sh.shard_map_banded_energy(energy, dmesh)

    params, losses = ht.run_lbfgs(loss_fn, params,
                                  num_steps=lbfgs_steps,
                                  loss_args=(banded,))
    losses = np.asarray(losses)
    print(f"energy: first {losses[0]:.4e}  last {losses[-1]:.6e}")

    # cross-check against the single-device energy at the solution
    single = float(energy(params, mesh))
    sharded = float(loss_fn(params, banded))
    print(f"single-device energy {single:.6e}  sharded {sharded:.6e}")
    assert np.isclose(single, sharded, rtol=1e-4)
    return params, losses


if __name__ == "__main__":
    _ensure_devices(8)
    main()
