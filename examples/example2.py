"""Example 2 — 2D L2 projection of sin(2*pi*x)cos(2*pi*y) onto a
structured bilinear FE space with per-axis r-adaptivity.

Rebuild of ``/root/reference/examples/example2.py`` — which is broken as
shipped (the structured model class is shadowed by the triangular one,
``src/models.py:93`` vs ``:241``; constructing it raises TypeError).  This
version *works*: 25x25 grid on [0,1]^2, minibatch 1000 collocation points
per epoch, Adam lr 5e-3, 5000 epochs.

Run: ``python -m examples.example2``
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import plots
from hidenn_fem_tpu.config import Projection2DConfig


def main(cfg: Projection2DConfig = Projection2DConfig(), outdir="out"):
    os.makedirs(outdir, exist_ok=True)

    model, params = ht.Bilinear2D.create(
        np.linspace(0, 1, cfg.nx), np.linspace(0, 1, cfg.ny),
        r_adapt=cfg.r_adapt, seed=cfg.seed)

    n1d = cfg.n_train_1d
    g = jnp.linspace(0, 1, n1d)
    XX, YY = jnp.meshgrid(g, g, indexing="ij")
    x_train = jnp.stack([XX.ravel(), YY.ravel()], axis=1)
    u_true = jnp.sin(2 * jnp.pi * x_train[:, 0]) \
        * jnp.cos(2 * jnp.pi * x_train[:, 1])

    opt = ht.adam(cfg.learning_rate)

    # minibatched collocation (the reference's randint minibatching,
    # example2.py:42-44) — whole training loop is one scan-compiled program
    # with a folded-in PRNG stream
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def train(params, key):
        opt_state = opt.init(params)

        def step(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (cfg.batch_size,), 0,
                                     x_train.shape[0])
            xb, ub = x_train[idx], u_true[idx]
            loss, grads = jax.value_and_grad(
                lambda p: jnp.mean((model.apply(p, xb) - ub) ** 2))(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, _, _), losses = jax.lax.scan(
            step, (params, opt_state, key), length=cfg.epochs)
        return params, losses

    params, losses = train(params, jax.random.PRNGKey(cfg.seed))
    losses = np.asarray(losses)
    for epoch in range(0, cfg.epochs, 500):
        print(f"Epoch {epoch}: loss={losses[epoch]:.6f}")
    print(f"Final minibatch MSE: {losses[-1]:.3e}")

    exact2d = lambda X, Y: np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    plots.plot_2d_solution(model, params, u_exact=exact2d,
                           save_path=f"{outdir}/example2_solution.png")
    plots.plot_2d_derivatives(model, params, n_eval=50,
                              title="FEM Derivatives",
                              save_path=f"{outdir}/example2_derivatives.png")
    return params, losses


if __name__ == "__main__":
    main()
