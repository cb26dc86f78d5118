"""Multi-chip geometric multigrid: fine level sharded over the device
mesh, coarse levels replicated.

The MG lattice is 2^k+1 nodes per axis, which never divides a device
count — so plain `NamedSharding` can't shard the hierarchy directly.
The fix mirrors the element-padding trick used everywhere else in
`parallel/`: `pad_lattice` prepends DEAD rows (quads deactivated, nodes
Dirichlet-pinned) until the row axis divides the device count, the fine
level runs row-sharded under GSPMD (the stencil slices of the
structured energy become ICI halo exchanges automatically — the same
proven pattern as `tests/test_structured_grid.py::test_lattice_row_sharding`),
and the V-cycle pads/unpads at the level-0/1 boundary: coarse levels
are tiny (≤ 1/4 the fine work), so they run replicated, which also
sidesteps coarse-grid-agglomeration entirely.

Zero-padding and row-slicing are adjoint, so the padded transfer pair
`pad∘prolong / restrict∘unpad` keeps the V-cycle a symmetric positive
definite preconditioner, and dead rows stay exactly zero through every
smoother (their probed diagonal is zero).

The reference has no distributed anything (SURVEY §5); this composes
the round-2 MG solver with the mandated element-DP capability.
"""

from __future__ import annotations

from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.structured_grid import StructuredGrid, pad_lattice
from ..solve import multigrid as mg

__all__ = ["mg_pcg_solve_sharded"]

_TINY = 1e-30


def _vcycle_padded(model, lev0, levels_rest, b, nu, coarse_degree, k,
                   g00, g0s_rest):
    """V-cycle whose finest level is the k-row-padded (sharded) lattice
    and whose coarser levels are the unpadded replicated hierarchy."""
    op = mg._level_op(model, lev0, g00)
    x = mg._cheb_smooth(op, lev0, b, jnp.zeros_like(b), nu)
    r = b - op(x)
    rc = mg._restrict(r[k:])
    xc = mg.vcycle(model, levels_rest, rc, nu, coarse_degree,
                   g0s=g0s_rest)
    corr = mg.prolong(xc)
    corr = jnp.concatenate(
        [jnp.zeros((k,) + corr.shape[1:], corr.dtype), corr], axis=0)
    x = x + lev0.free * corr
    return mg._cheb_smooth(op, lev0, b, x, nu)


@functools.partial(jax.jit, static_argnames=("model", "max_iters",
                                             "tol", "nu",
                                             "coarse_degree", "k"))
def _mg_pcg_padded(model, lev0, levels_rest, gridP, params, max_iters,
                   tol, nu, coarse_degree, k):
    u0 = params["u"]
    coords = lev0.coords

    def total(u):
        return model({"coords": coords, "u": u}, gridP)
    g0 = jax.grad(total)(u0)

    g00 = mg._level_grad(model, lev0)(jnp.zeros_like(coords))
    g0s_rest = mg.level_g0s(model, levels_rest)
    fine_op = mg._level_op(model, lev0, g00)

    def precond(r):
        return _vcycle_padded(model, lev0, levels_rest, r, nu,
                              coarse_degree, k, g00, g0s_rest)

    r = -g0
    z = precond(r)
    p = z
    x = jnp.zeros_like(u0)
    rs0 = jnp.sum(r * r)
    rz = jnp.sum(r * z)
    tiny = jnp.asarray(_TINY, rs0.dtype)
    hist0 = jnp.zeros((max_iters,), rs0.dtype)

    def cond(carry):
        i, _, _, _, _, rs = carry[:6]
        return (i < max_iters) & (rs > (tol * tol) * rs0)

    def body(carry):
        i, x, r, p, rz, rs, hist = carry
        Ap = fine_op(p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, tiny), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, tiny)
        p = z + beta * p
        rs = jnp.sum(r * r)
        hist = hist.at[i].set(jnp.sqrt(rs / jnp.maximum(rs0, tiny)))
        return (i + 1, x, r, p, rz_new, rs, hist)

    _, x, _, _, _, _, hist = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x, r, p, rz, rs0, hist0))
    return u0 + x, hist


def mg_pcg_solve_sharded(model, grid: StructuredGrid, params,
                         dmesh: Optional[Mesh] = None,
                         n_devices: Optional[int] = None,
                         max_iters: int = 60, tol: float = 1e-6,
                         nu: int = 3, coarse_degree: int = 24,
                         axis: str = "row"
                         ) -> Tuple[dict, jax.Array]:
    """Multigrid-PCG displacement solve with the FINE level row-sharded
    over a 1D device mesh (see module docstring).  Same semantics and
    returns as ``solve.multigrid.mg_pcg_solve``; the returned solution
    is unpadded and matches the single-device solve to float tolerance
    (tested on the 8-virtual-CPU mesh).
    """
    if dmesh is None:
        devs = jax.devices()
        n = int(n_devices or len(devs))
        dmesh = Mesh(np.asarray(devs[:n]), (axis,))
    n = int(np.prod(list(dmesh.shape.values())))

    coords = model.coords(params, grid)
    gridP, paramsP = pad_lattice(
        grid, {"coords": coords, "u": params["u"]}, n)
    k = gridP.nx - grid.nx

    row = NamedSharding(dmesh, P(axis))
    repl = NamedSharding(dmesh, P())

    def shard(x):
        if hasattr(x, "ndim") and x.ndim and x.shape[0] == gridP.nx:
            return jax.device_put(x, row)
        return jax.device_put(x, repl) if hasattr(x, "ndim") else x

    gridS = jax.tree.map(shard, gridP)
    paramsS = jax.tree.map(shard, paramsP)

    lev0 = mg._setup_level(model, gridS, paramsS["coords"], 30)
    gc = mg.coarsen_grid(grid)
    if gc is None:
        raise ValueError("lattice too small to coarsen — use the "
                         "single-device mg_pcg_solve")
    levels_rest = mg.build_hierarchy(model, gc, coords[::2, ::2])

    uP, hist = _mg_pcg_padded(model, lev0, levels_rest, gridS, paramsS,
                              int(max_iters), float(tol), int(nu),
                              int(coarse_degree), int(k))
    return {"coords": params["coords"], "u": uP[k:]}, hist
