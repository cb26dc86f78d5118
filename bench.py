"""Headline benchmark: quadrature-point evals/sec (forward+backward).

Measures the production energy hot path — value_and_grad of the 2D plate
total-potential energy — on the exact BASELINE.md workload: the 81x41
proxy plate (6,400 P1 elements, order-4 triangle quadrature = 25,600
quadrature points per energy evaluation).  The reference baseline is
8.36e5 qp/s fwd+bwd (PyTorch, 1x CPU, BASELINE.md row 3; hot path
``/root/reference/src/loss.py:55-88`` + ``src/models.py:316-357``).

The default (fused) assembly computes energies/gradients numerically
equal to evaluating the model at every quadrature point (P1 strain is
constant per element, so the quadrature loop collapses to the weight sum
— verified against the general per-qp path in
tests/test_triangle_p1.py::test_fused_vs_quadrature_assembly).

Timing is per-step *slope timing* inside scan-compiled optimize loops
(two scan lengths; the difference cancels dispatch/transfer fixed costs,
which are large on tunneled devices) — the same shape as the production
drivers in ``hidenn_fem_tpu/solve/drivers.py``, which run whole solves as
one on-device program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json

import jax

BASELINE_QP_PER_S = 8.36e5  # measured reference, BASELINE.md row 3


def main():
    import hidenn_fem_tpu as ht
    from hidenn_fem_tpu.utils.profiling import slope_time_scan

    mesh = ht.proxy_plate_mesh(nx=81, ny=41)       # 6,400 elements
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3,
                                  gauss_order=4)
    n_qp = mesh.n_elements * 4                     # 25,600

    def step(carry):
        p, m = carry
        val, grads = jax.value_and_grad(lambda q: energy(q, m))(p)
        p = jax.tree.map(lambda x, g: x - 1e-15 * g, p, grads)
        return (p, m), val

    dt = slope_time_scan(step, (params, mesh), n1=50, n2=550)
    qp_per_s = n_qp / dt
    print(json.dumps({
        "metric": "quadrature_point_evals_per_sec_fwd_bwd",
        "value": float(f"{qp_per_s:.4g}"),
        "unit": "qp/s",
        "vs_baseline": float(f"{qp_per_s / BASELINE_QP_PER_S:.4g}"),
    }))


if __name__ == "__main__":
    main()
