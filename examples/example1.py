"""Example 1 — 1D L2 projection of sin(2*pi*x) onto a piecewise-linear FE
space with r-adaptivity.

Rebuild of ``/root/reference/examples/example1.py``: 100-node grid on
[0, 1], 1000 training samples, Adam lr 5e-3, 500 epochs; expected final
MSE ~3.2e-7 (BASELINE.md row 1 — parity verified in
tests/test_baseline_parity.py).

Run: ``python -m examples.example1``
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import plots
from hidenn_fem_tpu.config import Projection1DConfig


def main(cfg: Projection1DConfig = Projection1DConfig(), outdir="out"):
    os.makedirs(outdir, exist_ok=True)

    model, params = ht.Linear1D.from_node_coords(
        np.linspace(cfg.x0, cfg.xN, cfg.n_nodes), r_adapt=cfg.r_adapt)
    x_train = jnp.linspace(cfg.x0, cfg.xN, cfg.n_train)
    u_true = jnp.sin(2 * jnp.pi * x_train)

    loss_fn = lambda p: ht.l2_loss(model, p, x_train, u_true)
    params, losses = ht.minimize(loss_fn, params, method="adam",
                                 num_steps=cfg.epochs,
                                 learning_rate=cfg.learning_rate)
    losses = np.asarray(losses)
    for epoch in range(0, cfg.epochs, 100):
        print(f"Epoch {epoch}: loss={losses[epoch]:.6f}")
    print(f"Final MSE: {losses[-1]:.3e}")

    exact = lambda x: np.sin(2 * np.pi * x)
    exact_d = lambda x: 2 * np.pi * np.cos(2 * np.pi * x)
    plots.plot_fem_solution(model, params, u_exact=exact,
                            title="L2 Projection of sin(2*pi*x)",
                            save_path=f"{outdir}/example1_solution.png")
    plots.plot_fem_derivative(model, params, u_exact=exact_d,
                              title="Derivative of L2 Projection (du/dx)",
                              save_path=f"{outdir}/example1_derivative.png")
    return params, losses


if __name__ == "__main__":
    main()
