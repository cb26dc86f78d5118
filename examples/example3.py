"""Example 3 — 1D bar under a distributed body force: total-potential
energy minimization with r-adaptivity and an exact-solution check.

Rebuild of ``/root/reference/examples/example3.py`` — broken as shipped
(imports a nonexistent quadrature symbol, ``example3.py:5`` vs
``src/utils.py:4``).  This version works: bar [0, 10], E = 175,
u(0) = u(10) = 0, 89 nodes, 2-point Gauss per element, two-Gaussian-bump
body force, Adam lr 1e-4, 4000 epochs; validated against the closed-form
solution (``example3.py:101-115``).

Unlike the reference (quirk E5: quadrature geometry under no_grad), the
energy here is differentiable through the integration map by default.

Run: ``python -m examples.example3``
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import plots
from hidenn_fem_tpu.config import Bar1DConfig


def b_force(x):
    """Two Gaussian-like bumps (``examples/example3.py:16-24``).

    The reference writes this as ``-N / exp(+pi x^2)``; the denominator
    overflows to inf in f32 far from the bump centers, which is benign in
    the forward pass (finite/inf == 0) but produces inf/inf == NaN in the
    derivative — and our energy differentiates through the quadrature
    geometry (unlike the reference's no_grad detach, quirk E5).  The
    mathematically identical ``-N * exp(-pi x^2)`` form is stable in both.
    """
    n1 = 4 * jnp.pi ** 2 * (x - 2.5) ** 2 - 2 * jnp.pi
    n2 = 8 * jnp.pi ** 2 * (x - 7.5) ** 2 - 4 * jnp.pi
    return (-n1 * jnp.exp(-jnp.pi * (x - 2.5) ** 2)
            - n2 * jnp.exp(-jnp.pi * (x - 7.5) ** 2))


def u_true(x, E):
    """Closed-form displacement (``examples/example3.py:101-107``)."""
    pi = np.pi
    term1 = (1 / E) * (np.exp(-pi * (x - 2.5) ** 2) - np.exp(-6.25 * pi))
    term2 = (2 / E) * (np.exp(-pi * (x - 7.5) ** 2) - np.exp(-56.25 * pi))
    constant = np.exp(-6.25 * pi) - np.exp(-56.25 * pi)
    return term1 + term2 - constant * x / (10 * E)


def du_dx_true(x, E):
    """Closed-form derivative (``examples/example3.py:109-115``)."""
    pi = np.pi
    term1 = (2 / E) * (-pi * (x - 2.5) * np.exp(-pi * (x - 2.5) ** 2))
    term2 = (4 / E) * (-pi * (x - 7.5) * np.exp(-pi * (x - 7.5) ** 2))
    constant = np.exp(-6.25 * pi) - np.exp(-56.25 * pi)
    return term1 + term2 - constant * x / (10 * E)


def main(cfg: Bar1DConfig = Bar1DConfig(), outdir="out"):
    os.makedirs(outdir, exist_ok=True)

    model, params = ht.Linear1D.from_node_coords(
        np.linspace(0, cfg.length, cfg.n_nodes), r_adapt=cfg.r_adapt,
        u0=cfg.u0, uN=cfg.uN)

    loss_fn = lambda p: ht.bar_energy_1d(model, p, cfg.n_gauss, b_force,
                                         E=cfg.youngs_modulus)
    params, losses = ht.minimize(loss_fn, params, method="adam",
                                 num_steps=cfg.epochs,
                                 learning_rate=cfg.learning_rate)
    losses = np.asarray(losses)
    for epoch in range(0, cfg.epochs, 500):
        print(f"Epoch {epoch}: loss={losses[epoch]:.6f}")

    # exact-solution validation
    xs = np.linspace(0, cfg.length, 2000)
    u_h = np.asarray(model.apply(params, jnp.asarray(xs, jnp.float32)))
    err = np.sqrt(np.mean((u_h - u_true(xs, cfg.youngs_modulus)) ** 2))
    print(f"Final energy: {losses[-1]:.6f}; RMS error vs exact: {err:.3e}")

    plots.plot_fem_solution(
        model, params, u_exact=lambda x: u_true(x, cfg.youngs_modulus),
        title="FEM Solution (Displacement)",
        save_path=f"{outdir}/example3_solution.png")
    plots.plot_fem_derivative(
        model, params, u_exact=lambda x: du_dx_true(x, cfg.youngs_modulus),
        title="FEM Derivative (du/dx)",
        save_path=f"{outdir}/example3_derivative.png")
    return params, losses, err


if __name__ == "__main__":
    main()
