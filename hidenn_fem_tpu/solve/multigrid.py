"""Geometric multigrid-preconditioned CG for the structured-grid plate.

The reference solves its flagship plate problem with generic optimizers
(600 L-BFGS iterations, ``/root/reference/examples/example4.py:68-80``).
At fixed node coordinates that problem is the linear FEM system K u = f;
matrix-free CG (``solve/linear.py``) solves it exactly but its iteration
count grows like O(nx) with resolution (2,190 matvecs at 922K elements).
On a structured lattice the textbook fix is geometric multigrid, and the
lattice form is TPU-native end to end: coarsening is ``[::2, ::2]``
subsampling, prolongation is bilinear lattice interpolation, restriction
its transpose — all slice/pad ops at HBM bandwidth, no gathers anywhere.

Everything is matrix-free against the production energy:

* level operators are two-point gradient differences
  ``K_l v = grad(E_l)(v) - grad(E_l)(0)`` of the SAME
  ``StructuredGridP1.domain_energy`` evaluated on coarsened grids (exact
  for the quadratic energy, and reverse-mode only, so the fast
  custom-VJP paths stay usable);
* level diagonals are extracted EXACTLY with 8 colored probes — the
  lattice node-adjacency graph (8-neighbourhood for every split) is
  properly 4-colored by ``(i % 2, j % 2)``, times 2 displacement
  components, so ``diag(K) = sum_c z_c * (K z_c)``;
* smoothing is fixed-degree Chebyshev-Jacobi targeting the upper part
  ``[lmax/4, lmax]`` of the ``D^{-1}K`` spectrum (lmax from a short
  power iteration at setup).  A fixed polynomial is a LINEAR, symmetric
  operator, so the V(nu,nu)-cycle is an SPD preconditioner and plain
  PCG applies (no flexible variant needed).

Dirichlet DOFs need no explicit elimination anywhere: the model pins
them by masked reconstruction, so level gradients (hence residuals) are
exactly zero there and the probe-extracted diagonal is zero, which the
guarded ``1/diag`` turns into a frozen DOF for the smoother.  Hole
interiors (weight-0 quads) freeze the same way.  Prolongation output is
masked to the free subspace so the preconditioner never writes junk
into pinned DOFs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.structured_grid import StructuredGrid

__all__ = ["coarsen_grid", "build_hierarchy", "vcycle", "mg_pcg_solve",
           "radapt_mg_solve"]

_TINY = 1e-30


# --------------------------------------------------------------- hierarchy
def coarsen_grid(grid: StructuredGrid) -> Optional[StructuredGrid]:
    """One geometric coarsening step (``None`` if the quad lattice is not
    2-divisible).  Only the operator-relevant fields matter on coarse
    levels: coords (sampled), Dirichlet mask (sampled — a coarse node is
    pinned iff its fine image is), and the quad mask, coarsened by
    VOLUME FRACTION (mean of the 4 fine quads): hole rims get
    fractionally-stiff coarse quads, so rim nodes still receive coarse
    correction — the conservative all-active (min) rule starved them
    and cost 36 vs 15 PCG iterations on a 3-hole plate (measured; the
    rules agree exactly on hole-free grids).  Neumann data is dropped:
    the traction is linear in u, so it shifts the RHS but not K, and
    the preconditioner only needs K.
    """
    nx, ny = grid.nx, grid.ny
    if nx < 3 or ny < 3 or (nx - 1) % 2 or (ny - 1) % 2:
        return None
    nxc, nyc = (nx - 1) // 2 + 1, (ny - 1) // 2 + 1
    # stays on-device: fetching the 922K quad mask through the tunnel
    # would cost seconds (CLAUDE.md: device->host ~0.4 MB/s)
    qm = jnp.reshape(grid.quad_mask, (nxc - 1, 2, nyc - 1, 2))
    return StructuredGrid(
        coords=grid.coords[::2, ::2],
        geom_boundary_mask=grid.geom_boundary_mask[::2, ::2],
        dirichlet_mask=grid.dirichlet_mask[::2, ::2],
        quad_mask=jnp.mean(qm, axis=(1, 3)),
        neumann_edge_masks={},
        u_dirichlet=None,
        split=grid.split,
        zigzag_phase=grid.zigzag_phase % 2,
    )


def prolong(cu: jax.Array) -> jax.Array:
    """Bilinear lattice interpolation [nxc, nyc, C] -> [2nxc-1, 2nyc-1, C]
    (the P1 coarse-to-fine embedding up to the quad-diagonal choice;
    bilinear is split-agnostic and symmetric, which is what the SPD
    V-cycle wants)."""
    nxc, nyc, c = cu.shape
    # separable interleave (row pass then column pass) via stack+reshape:
    # pure data movement that XLA fuses, NOT a strided scatter — strided
    # ``.at[::2].set`` lowers to TPU scatters (~7x slower per row,
    # CLAUDE.md) and measured ~50 ms/PCG-iteration of pure overhead at
    # 922K elements.
    rows = jnp.stack([cu[:-1], 0.5 * (cu[:-1] + cu[1:])], axis=1)
    rows = jnp.concatenate(
        [rows.reshape(2 * (nxc - 1), nyc, c), cu[-1:]], axis=0)
    cols = jnp.stack([rows[:, :-1],
                      0.5 * (rows[:, :-1] + rows[:, 1:])], axis=2)
    return jnp.concatenate(
        [cols.reshape(2 * nxc - 1, 2 * (nyc - 1), c), rows[:, -1:]],
        axis=1)


def _restrict(r: jax.Array) -> jax.Array:
    """Full-weighting restriction = prolongation transpose (via
    ``jax.linear_transpose`` so the pair stays exactly adjoint)."""
    nx, ny, c = r.shape
    cu_shape = jax.ShapeDtypeStruct(((nx + 1) // 2, (ny + 1) // 2, c),
                                    r.dtype)
    (out,) = jax.linear_transpose(prolong, cu_shape)(r)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Level:
    """One multigrid level: its grid, sampled coords, guarded inverse
    diagonal, and the Chebyshev upper eigenvalue bound of D^{-1}K."""

    grid: StructuredGrid
    coords: jax.Array
    dinv: jax.Array
    lmax: jax.Array
    free: jax.Array      # [nx, ny, 2] float 1/0 — DOFs in the operator's
    # support (excludes Dirichlet nodes AND dead-quad/hole interiors,
    # both of which probe a zero diagonal)


def _level_grad(model, level: _Level):
    def dom(u):
        return model.domain_energy({"coords": level.coords, "u": u},
                                   level.grid)
    return jax.grad(dom)


def level_g0s(model, levels) -> tuple:
    """Per-level gradients at zero — the affine part of each level
    operator.  Loop-invariant: compute ONCE outside any iteration loop
    (XLA does not reliably hoist them out of a ``while_loop`` body)."""
    return tuple(_level_grad(model, lev)(jnp.zeros_like(lev.coords))
                 for lev in levels)


def _level_op(model, level: _Level, g0=None):
    """The level stiffness action v -> K_l v (two-point gradient
    difference of the quadratic domain energy; exact, reverse-mode
    only)."""
    g = _level_grad(model, level)
    if g0 is None:
        g0 = g(jnp.zeros_like(level.coords))

    def op(v):
        return g(v) - g0

    return op


@functools.partial(jax.jit, static_argnames=("model", "power_iters"))
def _setup_level(model, grid: StructuredGrid, coords: jax.Array,
                 power_iters: int) -> _Level:
    def dom(u):
        return model.domain_energy({"coords": coords, "u": u}, grid)
    g = jax.grad(dom)
    zero = jnp.zeros_like(coords)
    g0 = g(zero)

    def op(v):
        return g(v) - g0

    # exact diagonal by colored probing: (i%2, j%2, comp) is a proper
    # coloring of the stiffness sparsity graph (8-neighbourhood lattice
    # adjacency, cross-component coupling only between neighbours).
    # scan over the 8 colors, not an unrolled loop: one traced gradient
    # graph instead of eight (the unrolled form cost minutes of remote
    # compile per hierarchy at 922K).
    nx, ny = grid.nx, grid.ny
    ii = jnp.arange(nx)[:, None, None] % 2
    jj = jnp.arange(ny)[None, :, None] % 2
    kk = jnp.arange(2)[None, None, :]

    def probe(diag, color):
        ci, cj, ck = color >> 2, (color >> 1) & 1, color & 1
        z = ((ii == ci) & (jj == cj) & (kk == ck)).astype(coords.dtype)
        return diag + z * op(z), None

    diag, _ = jax.lax.scan(probe, jnp.zeros((nx, ny, 2), coords.dtype),
                           jnp.arange(8))
    dinv = jnp.where(diag > _TINY, 1.0 / jnp.maximum(diag, _TINY), 0.0)

    # lmax(D^{-1} K) via power iteration (deterministic start).  The
    # 30% headroom is NOT optional tuning: Chebyshev smoothing with an
    # UNDERestimated lmax amplifies the top of the spectrum — measured
    # as a stall-then-NaN V-cycle at 481x241 where 15 iterations from
    # this start converged to 2.34 while the true lmax is ~3.0 (other
    # lattice shapes converged fine).  Overestimating merely smooths a
    # slightly wider band.
    v0 = jnp.sin(jnp.arange(nx * ny * 2, dtype=coords.dtype)).reshape(
        nx, ny, 2) * jnp.where(diag > _TINY, 1.0, 0.0)

    def piter(v, _):
        w = dinv * op(v)
        nrm = jnp.sqrt(jnp.sum(w * w))
        return w / jnp.maximum(nrm, _TINY), nrm

    _, nrms = jax.lax.scan(piter, v0 / jnp.maximum(
        jnp.sqrt(jnp.sum(v0 * v0)), _TINY), length=power_iters)
    lmax = 1.3 * nrms[-1]

    # the preconditioner must never write outside the operator's range:
    # prolongation into a zero-stiffness DOF (Dirichlet node or hole
    # interior) would accumulate junk in x that the residual can never
    # correct (the energy ignores those DOFs, but the returned solution
    # must match plain CG there).
    free = (diag > _TINY).astype(coords.dtype)
    return _Level(grid=grid, coords=coords, dinv=dinv, lmax=lmax,
                  free=free)


@functools.partial(jax.jit, static_argnames=("model", "min_size",
                                             "max_levels", "power_iters"))
def _build_hierarchy(model, grid, coords, min_size, max_levels,
                     power_iters):
    # the whole build is ONE jitted program (all control flow is on
    # static lattice shapes): the eager per-level version cost ~3 s of
    # host dispatch per rebuild through the TPU tunnel, which dominated
    # r-adaptive outer loops that rebuild on every coords change.
    levels: List[_Level] = [_setup_level(model, grid, coords,
                                         power_iters)]
    g = grid
    while len(levels) < max_levels:
        gc = coarsen_grid(g)
        if gc is None or gc.nx < min_size or gc.ny < min_size:
            break
        coords = coords[::2, ::2]
        levels.append(_setup_level(model, gc, coords, power_iters))
        g = gc
    return tuple(levels)


def build_hierarchy(model, grid: StructuredGrid, coords: jax.Array,
                    min_size: int = 4, max_levels: int = 16,
                    power_iters: int = 30) -> Tuple[_Level, ...]:
    """Coarsen ``grid`` (with the given — possibly r-adapted — pinned
    node coordinates) while the quad lattice divides by 2 and stays at
    least ``min_size`` nodes per axis; set up diagonals and Chebyshev
    bounds per level.  Returns a tuple pytree: pass it straight into
    jitted solves."""
    return _build_hierarchy(model, grid, coords, int(min_size),
                            int(max_levels), int(power_iters))


# --------------------------------------------------------------- smoothing
def _cheb_smooth(op, lev: _Level, b, x, degree: int):
    """``degree`` steps of Chebyshev-Jacobi smoothing of K x = b,
    targeting [lmax/4, lmax] of D^{-1}K (fixed polynomial => linear and
    symmetric; safe inside an SPD preconditioner)."""
    lmax = lev.lmax
    lmin = lmax * 0.25
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    r = b - op(x)
    d = (lev.dinv * r) / theta
    x = x + d

    # scan, not an unrolled loop: one traced gradient graph instead of
    # ``degree`` of them (the unrolled coarse-level degree-24 smoother
    # dominated compile time — minutes per shape, on CPU and TPU alike)
    def body(carry, _):
        x, r, d, rho = carry
        rho_new = 1.0 / (2.0 * sigma - rho)
        r = r - op(d)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * (lev.dinv * r)
        return (x + d, r, d, rho_new), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (x, r, d, jnp.asarray(1.0) / sigma), length=degree - 1)
    return x


def vcycle(model, levels: Tuple[_Level, ...], b, nu: int = 3,
           coarse_degree: int = 24, _l: int = 0, g0s=None):
    """One V(nu, nu) cycle approximating K^{-1} b on the finest level.
    Linear and symmetric in ``b`` (Chebyshev smoothers, adjoint
    transfer pair, free-subspace masking) — a valid PCG preconditioner.
    Pass ``g0s = level_g0s(model, levels)`` when calling from inside an
    iteration loop so the affine parts aren't recomputed per call."""
    if g0s is None:
        g0s = level_g0s(model, levels)
    lev = levels[_l]
    op = _level_op(model, lev, g0s[_l])
    if _l == len(levels) - 1:
        return _cheb_smooth(op, lev, b, jnp.zeros_like(b), coarse_degree)
    x = _cheb_smooth(op, lev, b, jnp.zeros_like(b), nu)
    rc = _restrict(b - op(x))
    xc = vcycle(model, levels, rc, nu, coarse_degree, _l + 1, g0s)
    x = x + lev.free * prolong(xc)
    return _cheb_smooth(op, lev, b, x, nu)


# -------------------------------------------------------------------- PCG
@functools.partial(
    jax.jit, static_argnames=("model", "max_iters", "nu",
                              "coarse_degree"))
def _mg_pcg(model, levels, grid, params, max_iters, tol, nu,
            coarse_degree):
    # tol is a traced scalar (while_loop condition only): changing the
    # tolerance must not recompile the solver.
    u0 = params["u"]
    coords = levels[0].coords

    def total(u):
        return model({"coords": coords, "u": u}, grid)
    g0 = jax.grad(total)(u0)

    g0s = level_g0s(model, levels)          # affine parts, hoisted out
    fine_op = _level_op(model, levels[0], g0s[0])   # K of the full
    # energy (the traction term is linear in u, so domain-only K is
    # exact)

    r = -g0
    z = vcycle(model, levels, r, nu, coarse_degree, g0s=g0s)
    p = z
    x = jnp.zeros_like(u0)
    rz = jnp.sum(r * z)
    rr0 = jnp.sum(r * r)
    tiny = jnp.asarray(_TINY, rr0.dtype)
    hist0 = jnp.zeros((max_iters,), rr0.dtype)

    def cond(carry):
        i, _, _, _, _, rr = carry[:6]
        return (i < max_iters) & (rr > (tol * tol) * rr0)

    def body(carry):
        i, x, r, p, rz, rr, hist = carry
        Ap = fine_op(p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, tiny), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = vcycle(model, levels, r, nu, coarse_degree, g0s=g0s)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, tiny)
        p = z + beta * p
        rr = jnp.sum(r * r)
        hist = hist.at[i].set(jnp.sqrt(rr / jnp.maximum(rr0, tiny)))
        return (i + 1, x, r, p, rz_new, rr, hist)

    _, x, _, _, _, _, hist = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), x, r, p, rz, rr0, hist0))
    return {"coords": params["coords"], "u": u0 + x}, hist


def mg_pcg_solve(model, grid: StructuredGrid, params,
                 max_iters: int = 60, tol: float = 1e-6, nu: int = 3,
                 coarse_degree: int = 24,
                 levels: Optional[Tuple[_Level, ...]] = None
                 ) -> Tuple[dict, jax.Array]:
    """Solve the fixed-mesh displacement problem ``min_u E(u)`` on a
    ``StructuredGridP1`` model by V-cycle-preconditioned CG.

    Args:
      model: a ``StructuredGridP1`` (its ``total`` supplies the RHS, its
        ``domain_energy`` every level operator).
      grid: the fine ``StructuredGrid``.
      params: ``{"coords", "u"}`` — coordinates are frozen (pinned via
        the model's getter, so r-adapted meshes work); ``u`` is the
        initial guess.
      levels: pass a prebuilt ``build_hierarchy(...)`` to amortize setup
        over repeated solves (e.g. r-adaptive outer loops re-use the
        hierarchy topology but should rebuild on coords changes).

    Returns (solved params, per-iteration relative residual norms; zero
    for iterations never executed).
    """
    coords = model.coords(params, grid)
    if levels is None:
        levels = build_hierarchy(model, grid, coords)
    return _mg_pcg(model, levels, grid, params, int(max_iters),
                   float(tol), int(nu), int(coarse_degree))


@functools.lru_cache(maxsize=64)
def _model_loss(model):
    """Memoized ``model.total`` adapter (a fresh closure per driver call
    would recompile the coordinate-step scan on every call)."""
    def loss(p, g):
        return model(p, g)
    return loss


def radapt_mg_solve(model, grid: StructuredGrid, params,
                    outer_epochs: int = 10, mg_iters: int = 40,
                    mg_tol: float = 1e-6, coord_steps: int = 20,
                    coord_lr: float = 1e-7) -> Tuple[dict, jax.Array]:
    """r-adaptivity on the structured path with EXACT multigrid inner
    solves: each outer epoch (1) MG-PCG-solves the displacement system
    at the current node coordinates — rebuilding the hierarchy, since
    the level diagonals and spectra track the moved mesh — then
    (2) takes ``coord_steps`` Adam steps on the coordinates at the
    equilibrated displacements (the structured analog of
    ``solve/linear.py:radapt_cg_solve``).

    Returns (params, per-epoch energies at the equilibrated states).
    """
    from . import optimizers as _opt
    from .drivers import run_optimizer

    opt_c = _opt.freeze_groups(_opt.adam(coord_lr), ["u"])
    loss = _model_loss(model)   # memoized: jit keys on function identity

    energies = []
    for _ in range(outer_epochs):
        params, _ = mg_pcg_solve(model, grid, params,
                                 max_iters=mg_iters, tol=mg_tol)
        energies.append(model(params, grid))
        params, _ = run_optimizer(loss, params, opt_c, coord_steps,
                                  (grid,))
    return params, jnp.stack(energies)
