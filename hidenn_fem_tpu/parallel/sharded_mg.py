"""Multi-chip geometric multigrid over the device mesh.

The MG lattice is 2^k+1 nodes per axis, which never divides a device
count — so plain `NamedSharding` can't shard the hierarchy directly.
The fix mirrors the element-padding trick used everywhere else in
`parallel/`: `pad_lattice` prepends DEAD rows (quads deactivated, nodes
Dirichlet-pinned) until the row axis divides the device count, and
levels run row-sharded under GSPMD (the stencil slices of the
structured energy become ICI halo exchanges automatically — the same
proven pattern as `tests/test_structured_grid.py::test_lattice_row_sharding`).

Two engines (A/B'd in tests/test_sharding.py + `count_collectives`):

* ``engine="all"`` (default): EVERY level with enough rows/device gets
  its own dead-row padding and runs sharded; only genuinely tiny levels
  replicate.  Distributes the coarse work and measured fewer
  collectives — see `mg_pcg_solve_sharded`'s docstring for the census.
* ``engine="replicated_coarse"`` (the round-2 design): only the fine
  level sharded, every coarse level replicated — simplest, but at D
  devices the redundant coarse work (~1/3 of fine) dominates per-device
  time once fine/D < 1/3.

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

from ..models.structured_grid import (StructuredGrid, pad_lattice,
                                      pad_lattice_side)
from ..solve import multigrid as mg

__all__ = ["mg_pcg_solve_sharded", "mg_pcg_solve_all_sharded",
           "build_sharded_hierarchy", "count_collectives"]

_TINY = 1e-30


def _unpad_rows(a: jax.Array, k: int) -> jax.Array:
    """Drop |k| dead rows: k > 0 = prepended (slice the front), k < 0 =
    appended (slice the back), 0 = no-op.  The sign convention threads
    ``pad_lattice_side`` through the static pad counts."""
    if k == 0:
        return a
    return a[k:] if k > 0 else a[:k]


def _pad0_rows(a: jax.Array, k: int) -> jax.Array:
    """Exact adjoint of ``_unpad_rows``: zero rows on the matching side
    (keeps the pad/unpad-wrapped transfer pair SPD)."""
    if k == 0:
        return a
    z = jnp.zeros((abs(k),) + a.shape[1:], a.dtype)
    return jnp.concatenate([z, a] if k > 0 else [a, z], axis=0)


def _vcycle_padded(model, lev0, levels_rest, b, nu, coarse_degree, k,
                   g00, g0s_rest):
    """V-cycle whose finest level is the k-row-padded (sharded) lattice
    and whose coarser levels are the unpadded replicated hierarchy."""
    op = mg._level_op(model, lev0, g00)
    x = mg._cheb_smooth(op, lev0, b, jnp.zeros_like(b), nu)
    r = b - op(x)
    rc = mg._restrict(_unpad_rows(r, k))
    xc = mg.vcycle(model, levels_rest, rc, nu, coarse_degree,
                   g0s=g0s_rest)
    corr = _pad0_rows(mg.prolong(xc), k)
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


# ------------------------------------------------- all-levels-sharded MG
#
# The replicated-coarse engine above wastes per-device time at scale:
# with the fine level sharded over D devices but every coarse level
# replicated, each device does fine/D + (coarse ~ fine/3) work — at D=8
# the redundant coarse work dominates.  This engine row-shards EVERY
# level that still has enough rows per device, by applying the same
# dead-row padding trick per level: each level's (unpadded) lattice is
# padded to a device-divisible row count, the level operator runs
# sharded under GSPMD (stencil slices become collective-permute halo
# exchanges — exactly what a hand-written shard_map/ppermute V-cycle
# would do, chosen over shard_map because GSPMD emits the same
# collectives from ~40 fewer lines and composes with the jitted PCG
# loop), and the transfer pair is pad/unpad-wrapped
# (``pad0 . prolong . unpad`` / its exact adjoint), which preserves the
# V-cycle's SPD-ness.  Levels below ``min_rows_per_dev`` rows/device
# stay replicated (a [17, ny] lattice is cheaper to recompute than to
# communicate).  A/B vs the replicated-coarse engine lives in
# ``tests/test_sharding.py`` (iterations must match) and
# ``count_collectives`` (comm-op census of the compiled HLO).


def build_sharded_hierarchy(model, grid: StructuredGrid,
                            coords: jax.Array, dmesh: Mesh,
                            axis: str = "row",
                            min_rows_per_dev: int = 4,
                            min_size: int = 4, max_levels: int = 16,
                            power_iters: int = 30):
    """Row-sharded MG hierarchy: per-level dead-row padding, every level
    with >= ``min_rows_per_dev`` rows/device sharded, smaller levels
    replicated.  Returns (levels tuple, pad-counts tuple)."""
    D = int(np.prod(list(dmesh.shape.values())))
    row = NamedSharding(dmesh, P(axis))
    repl = NamedSharding(dmesh, P())

    levels, ks = [], []
    g, c = grid, coords
    while True:
        shard_this = g.nx >= D * min_rows_per_dev
        if shard_this:
            gP, pP = pad_lattice(g, {"coords": c,
                                     "u": jnp.zeros_like(c)}, D)
            k = gP.nx - g.nx
            if pad_lattice_side(g) == "append":
                k = -k
            cP = pP["coords"]
            sh = row
        else:
            gP, cP, k, sh = g, c, 0, repl

        def place(x):
            if hasattr(x, "ndim") and x.ndim and x.shape[0] == gP.nx:
                return jax.device_put(x, sh)
            return jax.device_put(x, repl) if hasattr(x, "ndim") else x

        gS = jax.tree.map(place, gP)
        cS = place(cP)
        levels.append(mg._setup_level(model, gS, cS, power_iters))
        ks.append(k)

        gc = mg.coarsen_grid(g)
        if (gc is None or gc.nx < min_size or gc.ny < min_size
                or len(levels) >= max_levels):
            break
        c = c[::2, ::2]
        g = gc
    return tuple(levels), tuple(ks)


def _vcycle_all_sharded(model, levels, ks, b, nu, coarse_degree, g0s,
                        _l=0):
    lev = levels[_l]
    op = mg._level_op(model, lev, g0s[_l])
    if _l == len(levels) - 1:
        return mg._cheb_smooth(op, lev, b, jnp.zeros_like(b),
                               coarse_degree)
    x = mg._cheb_smooth(op, lev, b, jnp.zeros_like(b), nu)
    rc = _pad0_rows(mg._restrict(_unpad_rows(b - op(x), ks[_l])),
                    ks[_l + 1])
    xc = _vcycle_all_sharded(model, levels, ks, rc, nu, coarse_degree,
                             g0s, _l + 1)
    corr = _pad0_rows(mg.prolong(_unpad_rows(xc, ks[_l + 1])), ks[_l])
    x = x + lev.free * corr
    return mg._cheb_smooth(op, lev, b, x, nu)


@functools.partial(jax.jit, static_argnames=("model", "max_iters", "nu",
                                             "coarse_degree", "ks"))
def _mg_pcg_all_sharded(model, levels, ks, gridP, params, max_iters,
                        tol, nu, coarse_degree):
    u0 = params["u"]
    coords = levels[0].coords

    def total(u):
        return model({"coords": coords, "u": u}, gridP)
    g0 = jax.grad(total)(u0)

    g0s = mg.level_g0s(model, levels)
    fine_op = mg._level_op(model, levels[0], g0s[0])

    def precond(r):
        return _vcycle_all_sharded(model, levels, ks, r, nu,
                                   coarse_degree, g0s)

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


def mg_pcg_solve_all_sharded(model, grid: StructuredGrid, params,
                             dmesh: Optional[Mesh] = None,
                             n_devices: Optional[int] = None,
                             max_iters: int = 60, tol: float = 1e-6,
                             nu: int = 3, coarse_degree: int = 24,
                             min_rows_per_dev: int = 4,
                             axis: str = "row"
                             ) -> Tuple[dict, jax.Array]:
    """Multigrid-PCG with EVERY sufficiently large level row-sharded
    (see the all-levels-sharded section comment).  Same semantics and
    returns as ``mg_pcg_solve_sharded``."""
    if dmesh is None:
        devs = jax.devices()
        n = int(n_devices or len(devs))
        dmesh = Mesh(np.asarray(devs[:n]), (axis,))
    D = int(np.prod(list(dmesh.shape.values())))

    coords = model.coords(params, grid)
    levels, ks = build_sharded_hierarchy(
        model, grid, coords, dmesh, axis=axis,
        min_rows_per_dev=min_rows_per_dev)

    # the fine PCG state must match level 0 exactly: padded+sharded iff
    # the hierarchy decided to shard it (ks[0] != 0), else the original
    # replicated lattice (a tiny fine level is a legal configuration —
    # the dryrun's 17x9 lattice on 8 devices, for example)
    k0 = ks[0]
    row = NamedSharding(dmesh, P(axis))
    repl = NamedSharding(dmesh, P())
    if k0 != 0:
        gridP, paramsP = pad_lattice(
            grid, {"coords": coords, "u": params["u"]}, D)
    else:
        gridP, paramsP = grid, {"coords": coords, "u": params["u"]}

    def place(x):
        if hasattr(x, "ndim") and x.ndim and x.shape[0] == gridP.nx:
            return jax.device_put(x, row if k0 != 0 else repl)
        return jax.device_put(x, repl) if hasattr(x, "ndim") else x

    gridS = jax.tree.map(place, gridP)
    paramsS = jax.tree.map(place, paramsP)

    uP, hist = _mg_pcg_all_sharded(model, levels, ks, gridS, paramsS,
                                   int(max_iters), float(tol), int(nu),
                                   int(coarse_degree))
    return {"coords": params["coords"], "u": _unpad_rows(uP, k0)}, hist


def count_collectives(model, grid: StructuredGrid, params,
                      n_devices: int = 8, engine: str = "all",
                      max_iters: int = 4) -> dict:
    """Comm-op census of a compiled sharded-MG solve: occurrences of
    each collective HLO in the optimized module (the A/B evidence for
    replicated-coarse vs all-levels-sharded; op counts, not bytes —
    enough to see which design moves less data per cycle)."""
    devs = jax.devices()
    dmesh = Mesh(np.asarray(devs[:n_devices]), ("row",))
    row = NamedSharding(dmesh, P("row"))
    repl = NamedSharding(dmesh, P())
    coords = model.coords(params, grid)
    gridP, paramsP = pad_lattice(
        grid, {"coords": coords, "u": params["u"]}, n_devices)

    def place(x):
        if hasattr(x, "ndim") and x.ndim and x.shape[0] == gridP.nx:
            return jax.device_put(x, row)
        return jax.device_put(x, repl) if hasattr(x, "ndim") else x

    gridS = jax.tree.map(place, gridP)
    paramsS = jax.tree.map(place, paramsP)

    if engine == "all":
        levels, ks = build_sharded_hierarchy(model, grid, coords, dmesh)
        lowered = _mg_pcg_all_sharded.lower(
            model, levels, ks, gridS, paramsS, max_iters, 1e-6, 3, 24)
    elif engine == "replicated_coarse":
        k = gridP.nx - grid.nx
        if pad_lattice_side(grid) == "append":
            k = -k
        lev0 = mg._setup_level(model, gridS, paramsS["coords"], 30)
        gc = mg.coarsen_grid(grid)
        levels_rest = mg.build_hierarchy(model, gc, coords[::2, ::2])
        levels_rest = jax.tree.map(
            lambda x: jax.device_put(x, repl) if hasattr(x, "ndim")
            else x, levels_rest)
        lowered = _mg_pcg_padded.lower(
            model, lev0, levels_rest, gridS, paramsS, max_iters, 1e-6,
            3, 24, k)
    else:
        raise ValueError(f"unknown engine {engine!r}")
    txt = lowered.compile().as_text()
    out = {}
    for op in ("collective-permute", "all-reduce", "all-gather",
               "all-to-all", "reduce-scatter"):
        out[op] = txt.count(f" {op}")
    return out


def mg_pcg_solve_sharded(model, grid: StructuredGrid, params,
                         dmesh: Optional[Mesh] = None,
                         n_devices: Optional[int] = None,
                         max_iters: int = 60, tol: float = 1e-6,
                         nu: int = 3, coarse_degree: int = 24,
                         axis: str = "row", engine: str = "all",
                         min_rows_per_dev: int = 4
                         ) -> Tuple[dict, jax.Array]:
    """Multigrid-PCG displacement solve row-sharded over a 1D device
    mesh (see module docstring).  Same semantics and returns as
    ``solve.multigrid.mg_pcg_solve``; the returned solution is unpadded
    and matches the single-device solve to float tolerance (tested on
    the 8-virtual-CPU mesh).

    ``engine="all"`` (default) shards every sufficiently large level
    (``mg_pcg_solve_all_sharded``) — it distributes the coarse-level
    compute the original design replicated AND compiles to fewer
    collectives (census on the 8-device mesh, 65x33, 4 PCG iters:
    500 collective-permutes + 12 all-gathers vs 624 + 8 for
    ``engine="replicated_coarse"``; measure your own shape with
    ``count_collectives``).  The replicated-coarse engine is kept for
    A/B and for very small lattices.
    """
    if engine == "all":
        return mg_pcg_solve_all_sharded(
            model, grid, params, dmesh=dmesh, n_devices=n_devices,
            max_iters=max_iters, tol=tol, nu=nu,
            coarse_degree=coarse_degree, axis=axis,
            min_rows_per_dev=min_rows_per_dev)
    if engine != "replicated_coarse":
        raise ValueError(f"unknown engine {engine!r}")
    if dmesh is None:
        devs = jax.devices()
        n = int(n_devices or len(devs))
        dmesh = Mesh(np.asarray(devs[:n]), (axis,))
    n = int(np.prod(list(dmesh.shape.values())))

    coords = model.coords(params, grid)
    gridP, paramsP = pad_lattice(
        grid, {"coords": coords, "u": params["u"]}, n)
    k = gridP.nx - grid.nx
    if pad_lattice_side(grid) == "append":
        k = -k

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
    return {"coords": params["coords"], "u": _unpad_rows(uP, k)}, hist
