"""Matrix-free conjugate-gradient solve of quadratic energies.

The reference only ever minimizes its energies with generic optimizers
(Adam / L-BFGS, ``/root/reference/examples/example4.py:53-138``), but the
HiDeNN plate energy with node coordinates frozen is *exactly* the FEM
linear system K u = f (the energy is quadratic in the nodal values, and
solving it IS the classic displacement FEM solve).  CG is the optimal
Krylov method for that job, and on TPU every iteration is one pass of the
production energy gradient.

Stiffness matvec without forming K and without forward-mode AD:

    K v = grad(p0 + v) - grad(p0)

which is exact for quadratic losses (the gradient is affine).  This
matters here because the fast energy paths (Pallas kernels, blocked-window
assembly, incidence gathers) are ``jax.custom_vjp`` functions — reverse
mode only — so the usual jvp-of-grad HVP cannot trace through them; the
two-point form uses nothing but reverse mode.

Fixed (Dirichlet) degrees of freedom need no special casing: the masked
parameter reconstruction gives them exactly-zero gradients, so every
Krylov vector stays in the free subspace automatically.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["cg_solve", "radapt_cg_solve", "jacobi_diagonal",
           "jacobi_pcg_solve"]


def _tree_dot(a, b) -> jax.Array:
    leaves = jax.tree.leaves(jax.tree.map(jnp.vdot, a, b))
    return functools.reduce(jnp.add, leaves)


def _tree_axpy(alpha, x, y):
    """y + alpha * x, leafwise."""
    return jax.tree.map(lambda xl, yl: yl + alpha * xl, x, y)


@functools.partial(jax.jit,
                   static_argnames=("loss_fn", "max_iters"))
def _cg(loss_fn, max_iters, tol, params, loss_args, dinv=None,
        atol=0.0):
    # tol/atol ride as traced scalars (they only enter the while_loop
    # condition arithmetic): a new tolerance must NOT recompile the
    # solver — remote compiles occasionally take minutes here.
    grad_fn = jax.grad(lambda p, *a: loss_fn(p, *a))
    g0 = grad_fn(params, *loss_args)

    def matvec(v):
        gv = grad_fn(_tree_axpy(1.0, v, params), *loss_args)
        return jax.tree.map(jnp.subtract, gv, g0)

    def precond(r):
        if dinv is None:
            return r
        return jax.tree.map(jnp.multiply, dinv, r)

    r = jax.tree.map(jnp.negative, g0)
    z = precond(r)
    p = z
    x = jax.tree.map(jnp.zeros_like, params)
    rs0 = _tree_dot(r, r)
    rz0 = _tree_dot(r, z)
    tiny = jnp.asarray(1e-30, rs0.dtype)
    hist0 = jnp.zeros((max_iters,), rs0.dtype)

    # while_loop, not scan: a converged solve STOPS instead of paying a
    # full (frozen) matvec for every remaining iteration.  The solver
    # itself is not differentiated, so reverse-mode-through-scan is not
    # needed here.
    def cond(carry):
        i, _, _, _, _, rs = carry[:6]
        return ((i < max_iters) & (rs > (tol * tol) * rs0)
                & (rs > atol * atol))

    def body(carry):
        i, x, r, p, rz, rs, hist = carry
        Ap = matvec(p)
        pAp = _tree_dot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, tiny), 0.0)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, Ap, r)
        z = precond(r)
        rz_new = _tree_dot(r, z)
        beta = rz_new / jnp.maximum(rz, tiny)
        p = jax.tree.map(lambda zl, pl: zl + beta * pl, z, p)
        rs_new = _tree_dot(r, r)
        hist = hist.at[i].set(jnp.sqrt(rs_new / jnp.maximum(rs0, tiny)))
        return (i + 1, x, r, p, rz_new, rs_new, hist)

    _, x, _, _, _, _, hist = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x, r, p, rz0, rs0, hist0))
    return jax.tree.map(jnp.add, params, x), hist


@functools.partial(jax.jit, static_argnames=("loss_fn", "n_colors"))
def _jacobi_diag(loss_fn, n_colors, params, loss_args, colors):
    """Exact diag(K) by colored probing (see ``mesh/coloring.py``): one
    matvec per (color, leaf, component).  Leafwise probing is exact even
    for multi-leaf params: the probed positions of the probed leaf's
    gradient rows only see same-leaf, same-component, same-color
    couplings — i.e. the diagonal."""
    grad_fn = jax.grad(lambda p, *a: loss_fn(p, *a))
    g0 = grad_fn(params, *loss_args)
    leaves, treedef = jax.tree.flatten(params)
    g0_leaves = jax.tree.leaves(g0)

    def probe(diags, c):
        mask = None
        out = []
        for li, leaf in enumerate(leaves):
            dl = diags[li]
            if mask is None or mask.dtype != leaf.dtype:
                mask = (colors == c).astype(leaf.dtype)
            for k in range(leaf.shape[-1]):
                zl = mask[:, None] * jax.nn.one_hot(k, leaf.shape[-1],
                                                    dtype=leaf.dtype)
                zs = [jnp.zeros_like(x) for x in leaves]
                zs[li] = zl
                gz = grad_fn(
                    _tree_axpy(1.0, jax.tree.unflatten(treedef, zs),
                               params), *loss_args)
                kz = jax.tree.leaves(gz)[li] - g0_leaves[li]
                dl = dl + zl * kz
            out.append(dl)
        return tuple(out), None

    diags, _ = jax.lax.scan(
        probe, tuple(jnp.zeros_like(l) for l in leaves),
        jnp.arange(n_colors))
    return jax.tree.unflatten(treedef, list(diags))


def jacobi_diagonal(loss_fn: Callable, params, loss_args: tuple,
                    node_colors) -> dict:
    """Exact stiffness diagonal of a quadratic ``loss_fn`` at ``params``
    (matrix-free; ``n_colors * n_components`` gradient evaluations).
    ``node_colors`` is a proper coloring of the stiffness sparsity graph
    (``mesh.coloring.color_nodes``); every leaf of ``params`` must be
    node-indexed ``[N, C]``."""
    colors = jnp.asarray(node_colors)
    n_colors = int(jnp.max(colors)) + 1 if colors.size else 1
    return _jacobi_diag(loss_fn, n_colors, params, tuple(loss_args),
                        colors)


def jacobi_pcg_solve(loss_fn: Callable, params, loss_args: tuple = (),
                     mesh=None, node_colors=None, max_iters: int = 500,
                     tol: float = 1e-6, atol: float = 0.0
                     ) -> Tuple[dict, jax.Array]:
    """Jacobi-preconditioned CG: ``cg_solve`` with ``M = diag(K)``
    extracted exactly by colored probing.  Pass either a ``TriMesh``
    (colors computed from its connectivity — native C++ when built) or a
    precomputed ``node_colors``.  Plain CG is already well-scaled on
    uniform meshes; Jacobi pays off when element sizes vary (r-adapted
    or graded meshes) or materials are heterogeneous."""
    if node_colors is None:
        from ..mesh.coloring import color_nodes
        import numpy as np
        node_colors = color_nodes(np.asarray(mesh.connectivity),
                                  mesh.n_nodes)
    diag = jacobi_diagonal(loss_fn, params, loss_args, node_colors)
    tiny = 1e-30
    dinv = jax.tree.map(
        lambda d: jnp.where(d > tiny, 1.0 / jnp.maximum(d, tiny), 0.0),
        diag)
    return _cg(loss_fn, int(max_iters), float(tol), params,
               tuple(loss_args), dinv=dinv, atol=float(atol))


def cg_solve(loss_fn: Callable, params, loss_args: tuple = (),
             max_iters: int = 500, tol: float = 1e-6, atol: float = 0.0
             ) -> Tuple[dict, jax.Array]:
    """Minimize a quadratic loss by conjugate gradients (see module
    docstring) — the direct FEM solve for the fixed-mesh displacement
    problem.

    Args:
      loss_fn: ``loss_fn(params, *loss_args) -> scalar``, quadratic in
        every leaf of ``params``.  Freeze non-quadratic parameter groups
        by threading them through ``loss_args`` (e.g.
        ``lambda p, coords, mesh: energy({"u": p["u"],
        "coords": coords}, mesh)``) — NOT by closure, which bakes device
        arrays into the program.
      params: initial guess pytree (the solve returns params + K^{-1} r).
      max_iters: Krylov iteration cap; the loop exits at convergence.
      tol: relative-residual stop, ||r|| <= tol * ||r0||.
      atol: absolute-residual floor (also stops when ||r|| <= atol).
        float32 residuals stall around 1e-6 relative on these problems
        — a tighter ``tol`` alone just burns the full iteration cap on
        noise; set ``atol`` to the known noise floor to exit instead
        (e.g. when restarting from an already-converged state).

    Returns:
      (solution pytree, per-iteration relative residual norms — zero for
      iterations never executed).
    """
    return _cg(loss_fn, int(max_iters), float(tol), params,
               tuple(loss_args), atol=float(atol))


@functools.lru_cache(maxsize=64)
def _u_loss_for(loss_fn, u_key, coord_key):
    """Memoized displacement-only adapter of ``loss_fn``.

    jit caches key on function identity, so building this closure fresh
    per driver call would force a FULL solver recompile on every call
    (measured ~200 s at 922K) — the same lesson as the memoized
    optimizer constructors (``solve/optimizers.py``)."""
    def u_loss(pu, coords, *a):
        return loss_fn({u_key: pu[u_key], coord_key: coords}, *a)
    return u_loss


def radapt_cg_solve(loss_fn: Callable, params, loss_args: tuple = (),
                    outer_epochs: int = 10, cg_iters: int = 400,
                    cg_tol: float = 1e-6, coord_steps: int = 20,
                    coord_lr: float = 1e-7, u_key: str = "u",
                    coord_key: str = "coords") -> Tuple[dict, jax.Array]:
    """r-adaptivity with EXACT inner displacement solves.

    The reference's alternating scheme
    (``/root/reference/examples/example4.py:83-112``) takes a few Adam
    steps on the nodal values, then a few on the node coordinates.  The
    value phase is approximating the solution of a *quadratic* problem —
    so solve it exactly instead: each outer epoch (1) CG-solves the
    displacement system at the current mesh (``cg_solve``), then
    (2) takes ``coord_steps`` Adam steps on the node coordinates at the
    solved displacements.  The energy after each epoch is the TRUE
    r-adaptive objective at an exactly-equilibrated state, so coordinate
    gradients are never polluted by an unconverged value phase.

    Args / returns follow ``cg_solve``; ``loss_fn(params, *loss_args)``
    must be quadratic in ``params[u_key]`` at fixed ``params[coord_key]``.
    Returns (params, per-epoch energies at the equilibrated states).
    """
    from . import optimizers as _opt
    from .drivers import run_optimizer

    opt_c = _opt.freeze_groups(_opt.adam(coord_lr), [u_key])
    u_loss = _u_loss_for(loss_fn, u_key, coord_key)

    energies = []
    for _ in range(outer_epochs):
        coords0 = params[coord_key]
        pu, _ = cg_solve(u_loss, {u_key: params[u_key]},
                         loss_args=(coords0,) + tuple(loss_args),
                         max_iters=cg_iters, tol=cg_tol)
        params = {u_key: pu[u_key], coord_key: coords0}
        energies.append(loss_fn(params, *loss_args))
        params, _ = run_optimizer(loss_fn, params, opt_c, coord_steps,
                                  tuple(loss_args))
    return params, jnp.stack(energies)
