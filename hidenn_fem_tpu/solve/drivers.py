"""Whole-solve drivers: scan-compiled optimization loops.

The reference drives every solve with a Python epoch loop around
``loss.backward(); optimizer.step()`` (``examples/example1.py:35-40``,
``example4.py:70-80``).  Here each solve is ONE compiled program:
``jax.lax.scan`` over optimizer steps inside a single ``jit``, so the hot
loop never returns to Python — the idiomatic XLA shape for thousands of
tiny FEM steps.

Loss functions are closures ``loss_fn(params) -> scalar``; gradients for
both nodal values and nodal coordinates (r-adaptivity) come from one
``jax.value_and_grad``.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from . import optimizers as _opt

__all__ = ["minimize", "run_optimizer", "run_lbfgs", "MinimizeResult"]


class MinimizeResult(tuple):
    """Result of :func:`minimize` — unpacks like the 2-tuple
    ``(params, history)`` every driver returns, plus a ``kind``
    attribute naming what ``history`` holds: ``"loss"`` (per-step loss,
    methods adam/lbfgs) or ``"relres"`` (per-iteration relative residual
    norms, methods cg/jacobi_cg).  Callers that plot the history
    uniformly should branch on ``result.kind``."""

    def __new__(cls, params, history, kind):
        obj = super().__new__(cls, (params, history))
        obj.kind = kind
        return obj

    @property
    def params(self):
        return self[0]

    @property
    def history(self):
        return self[1]


@functools.partial(jax.jit, static_argnames=("loss_fn", "optimizer",
                                             "num_steps"))
def _run_first_order(loss_fn, optimizer, num_steps, params, loss_args):
    # loss_args are jit operands: large arrays (meshes) ride as runtime
    # parameters instead of being baked into the executable as constants
    opt_state = optimizer.init(params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, *loss_args)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state),
                                       length=num_steps)
    return params, losses


@functools.partial(jax.jit, static_argnames=("loss_fn", "optimizer",
                                             "num_steps"))
def _run_lbfgs(loss_fn, optimizer, num_steps, params, loss_args):
    fn = lambda p: loss_fn(p, *loss_args)
    opt_state = optimizer.init(params)
    value_and_grad = optax.value_and_grad_from_state(fn)

    def step(carry, _):
        params, opt_state = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = optimizer.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=fn)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    (params, _), losses = jax.lax.scan(step, (params, opt_state),
                                       length=num_steps)
    return params, losses


def run_optimizer(loss_fn: Callable, params, optimizer, num_steps: int,
                  loss_args: tuple = ()
                  ) -> Tuple[dict, jax.Array]:
    """Run a first-order optimizer for ``num_steps``; returns
    (final_params, per-step loss history [num_steps]).

    Pass large data (meshes, training sets) via ``loss_args`` —
    ``loss_fn(params, *loss_args)`` — rather than closing over it, so it
    enters the compiled program as an operand, not an embedded constant.
    """
    return _run_first_order(loss_fn, optimizer, num_steps, params,
                            tuple(loss_args))


def run_lbfgs(loss_fn: Callable, params, num_steps: int = 600,
              memory_size: int = 100, max_linesearch_steps: int = 20,
              tol: Optional[float] = None, loss_args: tuple = (),
              linesearch: str = "none"
              ) -> Tuple[dict, jax.Array]:
    """Run LBFGS iterations (one iteration ~ one torch inner step; the
    reference's 30 outer epochs x max_iter=20 correspond to
    ``num_steps=600``).

    ``linesearch="none"`` (default) is torch's LBFGS default — fixed step
    lr=1, the configuration the measured baseline used; ~6x faster on TPU
    than ``"zoom"`` (strong-Wolfe), which is available for problems that
    need globalization.

    ``tol``: optional convergence tolerance — stop early once the gradient
    infinity-norm drops below it (torch LBFGS's ``tolerance_grad``
    semantics, default 1e-7 there).  The loss history is padded with the
    final value after convergence.
    """
    optimizer = _opt.lbfgs(memory_size=memory_size,
                           max_linesearch_steps=max_linesearch_steps,
                           linesearch=linesearch)
    if linesearch == "none":
        if tol is None:
            return _run_first_order(loss_fn, optimizer, num_steps, params,
                                    tuple(loss_args))
        return _run_first_order_tol(loss_fn, optimizer, num_steps,
                                    float(tol), params, tuple(loss_args))
    if tol is None:
        return _run_lbfgs(loss_fn, optimizer, num_steps, params,
                          tuple(loss_args))
    return _run_lbfgs_tol(loss_fn, optimizer, num_steps, float(tol),
                          params, tuple(loss_args))


@functools.partial(jax.jit, static_argnames=("loss_fn", "optimizer",
                                             "num_steps", "tol"))
def _run_first_order_tol(loss_fn, optimizer, num_steps, tol, params,
                         loss_args):
    opt_state = optimizer.init(params)

    def step(carry, _):
        params, opt_state, converged, last = carry

        def do_step(args):
            params, opt_state = args
            value, grad = jax.value_and_grad(loss_fn)(params, *loss_args)
            updates, opt_state = optimizer.update(grad, opt_state, params)
            params = optax.apply_updates(params, updates)
            gmax = jnp.max(jnp.asarray(
                [jnp.max(jnp.abs(g)) for g in jax.tree.leaves(grad)]))
            return params, opt_state, gmax < tol, value

        params, opt_state, converged, last = jax.lax.cond(
            converged,
            lambda args: (args[0], args[1], jnp.bool_(True), last),
            do_step,
            (params, opt_state))
        return (params, opt_state, converged, last), last

    init = (params, opt_state, jnp.bool_(False),
            jnp.asarray(jnp.inf, jnp.float32))
    (params, _, _, _), losses = jax.lax.scan(step, init, length=num_steps)
    return params, losses


@functools.partial(jax.jit, static_argnames=("loss_fn", "optimizer",
                                             "num_steps", "tol"))
def _run_lbfgs_tol(loss_fn, optimizer, num_steps, tol, params, loss_args):
    base_fn = loss_fn
    loss_fn = lambda p: base_fn(p, *loss_args)
    opt_state = optimizer.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        params, opt_state, converged, last = carry

        def do_step(args):
            params, opt_state = args
            value, grad = value_and_grad(params, state=opt_state)
            updates, opt_state = optimizer.update(
                grad, opt_state, params, value=value, grad=grad,
                value_fn=loss_fn)
            params = optax.apply_updates(params, updates)
            gmax = jnp.max(jnp.asarray(
                [jnp.max(jnp.abs(g)) for g in jax.tree.leaves(grad)]))
            return params, opt_state, gmax < tol, value

        params, opt_state, converged, last = jax.lax.cond(
            converged,
            lambda args: (args[0], args[1], jnp.bool_(True), last),
            do_step,
            (params, opt_state))
        return (params, opt_state, converged, last), last

    init = (params, opt_state, jnp.bool_(False),
            jnp.asarray(jnp.inf, jnp.float32))
    (params, _, _, _), losses = jax.lax.scan(step, init, length=num_steps)
    return params, losses


def minimize(loss_fn: Callable, params, method: str = "adam",
             num_steps: int = 1000, learning_rate: float = 1e-3,
             group_lrs: Optional[dict] = None, loss_args: tuple = (),
             **kwargs) -> Tuple[dict, jax.Array]:
    """One-call solve facade.

    method: "adam" (optionally with ``group_lrs`` for the two-group scheme,
    ``examples/example4.py:54-57``), "lbfgs" (``examples/example4.py:68``),
    "cg", or "jacobi_cg" (matrix-free conjugate gradients, optionally
    Jacobi-preconditioned via graph-colored probing — ONLY for losses
    quadratic in ``params``, e.g. the displacement problem at fixed
    mesh; see ``solve/linear.py``; "jacobi_cg" needs ``mesh=`` or
    ``node_colors=``; both return relative residual norms, not losses).
    Structured grids additionally get ``mg_pcg_solve`` and unstructured
    meshes ``aux_pcg_solve`` (different signatures — see
    ``solve/multigrid.py`` / ``solve/auxspace.py``).
    Large data (meshes) should go in ``loss_args``
    (``loss_fn(params, *loss_args)``) instead of being closed over.

    Returns a :class:`MinimizeResult` — unpacks as ``(params, history)``
    and carries ``.kind`` ("loss" or "relres") identifying what the
    history array holds.
    """
    if method == "adam":
        opt = (_opt.adam_per_group(group_lrs) if group_lrs
               else _opt.adam(learning_rate))
        return MinimizeResult(
            *run_optimizer(loss_fn, params, opt, num_steps, loss_args),
            kind="loss")
    if method == "lbfgs":
        return MinimizeResult(
            *run_lbfgs(loss_fn, params, num_steps, loss_args=loss_args,
                       **kwargs), kind="loss")
    if method == "cg":
        from .linear import cg_solve
        return MinimizeResult(
            *cg_solve(loss_fn, params, loss_args=loss_args,
                      max_iters=num_steps, **kwargs), kind="relres")
    if method == "jacobi_cg":
        from .linear import jacobi_pcg_solve
        return MinimizeResult(
            *jacobi_pcg_solve(loss_fn, params, loss_args=loss_args,
                              max_iters=num_steps, **kwargs),
            kind="relres")
    raise ValueError(f"unknown method {method!r}")


def alternating_solve(loss_fn: Callable, params, outer_epochs: int = 500,
                      u_steps: int = 10, coord_steps: int = 5,
                      u_lr: float = 1e-6, coord_lr: float = 1e-7,
                      u_key: str = "u", coord_key: str = "coords"
                      ) -> Tuple[dict, jax.Array]:
    """Alternating freeze scheme: optimize nodal values with the mesh
    frozen, then node coordinates with values frozen
    (``examples/example4.py:83-112`` as a first-class strategy).

    The whole alternation compiles to one scan: each outer epoch runs
    ``u_steps`` value updates then ``coord_steps`` coordinate updates.
    """
    opt_u = _opt.freeze_groups(_opt.adam(u_lr), [coord_key])
    opt_c = _opt.freeze_groups(_opt.adam(coord_lr), [u_key])

    @functools.partial(jax.jit, static_argnames=())
    def run(params):
        state_u = opt_u.init(params)
        state_c = opt_c.init(params)

        def one_epoch(carry, _):
            params, state_u, state_c = carry

            def u_step(carry, _):
                params, state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, state = opt_u.update(grads, state, params)
                return (optax.apply_updates(params, updates), state), loss

            (params, state_u), _ = jax.lax.scan(
                u_step, (params, state_u), length=u_steps)

            def c_step(carry, _):
                params, state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, state = opt_c.update(grads, state, params)
                return (optax.apply_updates(params, updates), state), loss

            (params, state_c), losses = jax.lax.scan(
                c_step, (params, state_c), length=coord_steps)
            return (params, state_u, state_c), losses[-1]

        (params, _, _), losses = jax.lax.scan(
            one_epoch, (params, state_u, state_c), length=outer_epochs)
        return params, losses

    return run(params)


def solve_with_checkpointing(loss_fn: Callable, params, optimizer,
                             num_steps: int, checkpoint_dir: str,
                             checkpoint_every: int = 1000,
                             metrics_path: Optional[str] = None,
                             resume: bool = True,
                             n_quad_points: Optional[int] = None
                             ) -> Tuple[dict, list]:
    """Long-run driver: chunked scan-compiled optimization with periodic
    checkpoints + JSONL metrics, resumable after a crash.

    The reference has no checkpoint/resume at all (SURVEY.md §5); long
    multi-chip r-adaptivity runs get deterministic resume here.  Between
    scan chunks the host writes ``ckpt_<step>.msgpack`` (params +
    optimizer state) and a metrics line (loss, per-group grad norms,
    wall/step, qp-evals/sec).
    """
    import time as _time

    from ..utils import checkpoint as _ckpt
    from ..utils import metrics as _metrics

    opt_state = optimizer.init(params)
    start_step = 0
    if resume:
        latest = _ckpt.latest_checkpoint(checkpoint_dir)
        if latest is not None:
            params, opt_state, start_step, _ = _ckpt.restore_checkpoint(
                latest, params, opt_state)

    @functools.partial(jax.jit, static_argnames=("chunk",))
    def run_chunk(params, opt_state, chunk):
        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), length=chunk)
        return params, opt_state, losses

    import os
    os.makedirs(checkpoint_dir, exist_ok=True)
    writer = (_metrics.MetricsWriter(metrics_path) if metrics_path
              else None)
    all_losses = []
    step_i = start_step
    try:
        while step_i < num_steps:
            chunk = min(checkpoint_every, num_steps - step_i)
            t0 = _time.perf_counter()
            params, opt_state, losses = run_chunk(params, opt_state, chunk)
            last = float(losses[-1])        # sync
            wall = (_time.perf_counter() - t0) / chunk
            step_i += chunk
            all_losses.append(losses)
            _ckpt.save_checkpoint(
                f"{checkpoint_dir}/ckpt_{step_i}.msgpack", params,
                opt_state, step=step_i)
            if writer:
                writer.write(_metrics.solve_metrics(
                    step_i, last, wall_per_step=wall,
                    n_quad_points=n_quad_points))
    finally:
        if writer:
            writer.close()
    return params, all_losses


def two_phase_solve(loss_fn: Callable, params, adam_steps: int = 1000,
                    lbfgs_steps: int = 800, u_lr: float = 1e-6,
                    coord_lr: float = 1e-7, u_key: str = "u",
                    coord_key: str = "coords"):
    """Adam warmup then LBFGS refinement
    (``examples/example4.py:114-138`` as a first-class strategy)."""
    opt = _opt.adam_per_group({u_key: u_lr, coord_key: coord_lr})
    params, adam_losses = run_optimizer(loss_fn, params, opt, adam_steps)
    params, lbfgs_losses = run_lbfgs(loss_fn, params, lbfgs_steps)
    return params, jnp.concatenate([adam_losses, lbfgs_losses])
