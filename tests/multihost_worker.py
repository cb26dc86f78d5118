"""Worker process for the multi-host (multi-process) test.

Launched by ``tests/test_multihost.py`` as 2 separate processes, each
with 2 virtual CPU devices.  Joins the distributed runtime through
``hidenn_fem_tpu.parallel.multihost`` (the code under test), computes
the element-sharded plate energy + gradients over the 4-device GLOBAL
mesh, and prints one JSON line so the parent can assert against the
single-process value.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-process CPU collectives need the gloo backend
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hidenn_fem_tpu.parallel import multihost

    multihost.initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)

    import numpy as np

    import hidenn_fem_tpu as ht
    from hidenn_fem_tpu.parallel import sharding as sh

    summary = multihost.process_summary()
    assert multihost.is_multihost()
    assert summary["process_count"] == nproc
    assert summary["global_devices"] == 2 * nproc

    # the production GSPMD route over the GLOBAL device list: element
    # tables sharded across all devices of all processes, nodal arrays
    # replicated; jax.device_put with a NamedSharding handles the
    # multi-process placement (each process provides its local shards)
    dmesh = sh.device_mesh()          # all global devices
    tri = ht.proxy_plate_mesh(nx=17, ny=9)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), tri)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)

    smesh = sh.shard_mesh(tri, dmesh)
    sparams = sh.replicate(params, dmesh)

    # pass the sharded mesh as an OPERAND, not a closure capture: jit
    # constants must be addressable from one process, operands may span
    # the global mesh
    val, grads = jax.jit(jax.value_and_grad(
        lambda p, m: energy(p, m)))(sparams, smesh)
    # outputs are replicated -> addressable from every process
    gnorm = float(jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda g: jnp_sum_sq(g), grads)) ** 0.5)
    print(json.dumps({"pid": pid, "loss": float(val), "gnorm": gnorm,
                      **summary}), flush=True)


def jnp_sum_sq(g):
    import jax.numpy as jnp
    return float(jnp.sum(g * g))


if __name__ == "__main__":
    main()
