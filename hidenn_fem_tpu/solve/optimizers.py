"""Optimizer constructors (optax) for HiDeNN solves.

Replaces the reference's ``torch.optim`` usage:

* plain Adam loops (``examples/example1.py:31``, ``example2.py:37``,
  ``example3.py:89``),
* two-group Adam with a smaller learning rate on nodal coordinates
  (``examples/example4.py:54-57``),
* LBFGS with the closure pattern (``examples/example4.py:68-80``; torch
  defaults lr=1, max_iter=20, history_size=100).

Everything returns a plain ``optax.GradientTransformation`` so the scan
based drivers in ``drivers.py`` can run whole solves inside one ``jit``.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

__all__ = ["adam", "adam_per_group", "lbfgs", "freeze_groups",
           "scale_by_compact_lbfgs"]

# Constructors are memoized: optax transformations are pytrees of fresh
# closure objects, so building one per solve call would hand the jitted
# drivers (which treat the optimizer as a static argument) a different
# cache key every time — recompiling the whole solve on every invocation
# (measured: a 200-iteration 922K-element LBFGS solve paid ~40s of remote
# recompile per call instead of running at the 37ms/iter steady state).


@functools.lru_cache(maxsize=None)
def adam(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(learning_rate)


def adam_per_group(group_lrs: Dict[str, float]) -> optax.GradientTransformation:
    """Adam with a separate learning rate per top-level parameter key.

    ``adam_per_group({"u": 1e-4, "coords": 1e-5})`` reproduces the
    reference's two-group configuration (``examples/example4.py:54-57``)
    without parameter-group plumbing: labels are the top-level pytree keys.
    """
    return _adam_per_group(tuple(sorted(group_lrs.items())))


@functools.lru_cache(maxsize=None)
def _adam_per_group(group_lrs_items) -> optax.GradientTransformation:
    def label_fn(params):
        return {k: k for k in params}

    return optax.multi_transform(
        {k: optax.adam(lr) for k, lr in group_lrs_items}, label_fn)


class CompactLBFGSState(NamedTuple):
    """State of ``scale_by_compact_lbfgs`` (flat [P]-vector history)."""

    count: jax.Array        # int32: update calls so far
    prev_flat: jax.Array    # [P] previous flat params
    prev_grad: jax.Array    # [P] previous flat gradient
    SY: jax.Array           # [2m, P]: rows 0..m-1 = s_i, m..2m-1 = y_i
    STY: jax.Array          # [m, m]: s_i . y_j
    YTY: jax.Array          # [m, m]: y_i . y_j
    gamma: jax.Array        # last accepted identity scale


def scale_by_compact_lbfgs(memory_size: int = 100,
                           scale_init_precond: bool = True
                           ) -> optax.GradientTransformation:
    """L-BFGS direction via the compact representation — the TPU-fast
    equivalent of ``optax.scale_by_lbfgs``.

    The classic two-loop recursion is a ``scan`` of 2*m sequential
    pytree dot/axpy steps; at memory 100 its kernel overheads cost
    0.6-6 ms/iteration on this machine's v5e — dominating every small and
    medium solve (the round-1 2.24 s plate solve was mostly this).  The
    compact representation (Byrd, Nocedal & Schnabel 1994, Thm 2.2)
    computes the SAME H_k g product as dense linear algebra:

        H g = gamma g + [S  gamma Y] M [S^T g; gamma Y^T g],
        M   = [[R^{-T} (D + gamma Y^T Y) R^{-1},  -R^{-T}],
               [-R^{-1},                           0     ]],

    with R = triu(S^T Y), D = diag(S^T Y).  Everything large is two
    batched [2m, P] matmuls (one computing S^Tg, Y^Tg and the S^Ty, Y^Ts,
    Y^Ty bookkeeping columns in a single pass; one for the final
    combination) plus two m-by-m triangular solves — ~8 kernels total, and
    the same O(4mP) HBM traffic as the two-loop.  S^T Y and Y^T Y are
    maintained incrementally (one row+column per update).

    Semantics replicate ``optax.scale_by_lbfgs`` (the (s, y) pair is
    pushed at slot (count-1) % m and zeroed on the first call; gamma is
    s.y/y.y of the newest pair, or the capped reciprocal gradient norm on
    the first call) with ONE deliberate difference: torch LBFGS's
    curvature guard (``ys > 1e-10``, the configuration the measured
    baseline ran with).  A pair failing it — e.g. the negative-curvature
    pair produced by the fixed-step method's early spike on the plate —
    is stored as zeros (inert: its R diagonal is patched to 1, matching a
    two-loop rho = 0) and gamma keeps its last accepted value.  optax's
    two-loop instead keeps such pairs with rho = 1/(s.y) < 0; the
    sequential rank-1 recursion happens to absorb that in f32, but the
    compact form's triangular solve amplifies it into NaN (observed on
    the example-4 plate) — the guard is both the stable and the
    torch-parity choice.
    """
    m = memory_size
    if m < 1:
        raise ValueError("memory_size must be >= 1")

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        p = flat.size
        z = jnp.zeros((p,), flat.dtype)
        return CompactLBFGSState(
            count=jnp.zeros((), jnp.int32),
            prev_flat=z, prev_grad=z,
            SY=jnp.zeros((2 * m, p), flat.dtype),
            STY=jnp.zeros((m, m), flat.dtype),
            YTY=jnp.zeros((m, m), flat.dtype),
            gamma=jnp.ones((), flat.dtype),
        )

    def update_fn(updates, state, params=None, **extra_args):
        del extra_args  # value/grad/value_fn of the linesearch protocol
        # curvature dot products and the m-by-m solves must NOT run at the
        # TPU's default bf16 matmul precision (1e-3 relative error turns
        # R^{-1} into garbage and the solve diverges — observed as NaN on
        # the example-4 plate while CPU f32 was fine)
        with jax.default_matmul_precision("highest"):
            return _update(updates, state, params)

    def _update(updates, state, params):
        g, _ = ravel_pytree(updates)
        x, unravel = ravel_pytree(params)
        c = state.count
        slot = (c - 1) % m

        first = c == 0
        s = jnp.where(first, 0.0, x - state.prev_flat)
        y = jnp.where(first, 0.0, g - state.prev_grad)
        # torch's curvature guard: reject non-positive-curvature pairs
        # (they also destabilize the triangular solves in f32)
        accept = jnp.vdot(s, y) > 1e-10
        s = jnp.where(accept, s, 0.0)
        y = jnp.where(accept, y, 0.0)
        SY = state.SY.at[slot].set(s).at[m + slot].set(y)

        # one pass over the history: columns are (.y, .s, .g) products
        B = SY @ jnp.stack([y, s, g], axis=1)              # [2m, 3]
        s_dot_y, u = B[:m, 0], B[:m, 2]                    # S.y, S.g
        y_dot_y, y_dot_s, v = B[m:, 0], B[m:, 1], B[m:, 2]
        STY = state.STY.at[:, slot].set(s_dot_y).at[slot, :].set(y_dot_s)
        YTY = state.YTY.at[:, slot].set(y_dot_y).at[slot, :].set(y_dot_y)

        sy = jnp.vdot(s, y)
        yy = jnp.vdot(y, y)
        if scale_init_precond:
            gnorm = jnp.linalg.norm(g)
            gamma0 = jnp.minimum(1.0, 1.0 / jnp.where(gnorm > 0, gnorm,
                                                      1.0))
            # NOTE the predicate is `c == 0`, deliberately: under this
            # machine's axon TPU backend, a scan body whose select
            # predicate is `count > 0` on the to-be-incremented carry
            # reads the *post-increment* value (minimal repro in
            # tests/test_solve_strategies.py::test_scan_count_predicate;
            # `count == 0` compiles correctly).  With `c > 0` the first
            # step skipped gamma0, took an un-scaled 6.5e7-norm step on
            # the plate, and NaN'd the whole solve.
            gamma = jnp.where(
                c == 0,
                gamma0,
                jnp.where(accept & (yy > 0.0),
                          sy / jnp.where(yy > 0, yy, 1.0),
                          state.gamma))
        else:
            gamma = jnp.ones((), g.dtype)

        # chronological (oldest-first) view of the circular buffer
        order = (c + jnp.arange(m)) % m
        A = STY[order][:, order]
        YY = YTY[order][:, order]
        d = jnp.diagonal(A)
        R = jnp.triu(A)
        # inert rows for empty / zero-curvature pairs (rho = 0 analog)
        safe = jnp.where(d == 0.0, 1.0, d)
        R = R.at[jnp.arange(m), jnp.arange(m)].set(safe)
        u_o = u[order]
        v_o = v[order]
        w1 = jax.scipy.linalg.solve_triangular(R, u_o, lower=False)
        t = d * w1 + gamma * (YY @ w1) - gamma * v_o
        w2 = jax.scipy.linalg.solve_triangular(R.T, t, lower=True)

        coef = jnp.zeros((2 * m,), g.dtype)
        coef = coef.at[order].set(w2).at[m + order].set(-gamma * w1)
        hg = gamma * g + coef @ SY                          # one pass
        return unravel(hg), CompactLBFGSState(
            count=c + 1, prev_flat=x, prev_grad=g,
            SY=SY, STY=STY, YTY=YTY, gamma=gamma)

    return optax.GradientTransformation(init_fn, update_fn)


@functools.lru_cache(maxsize=None)
def lbfgs(memory_size: int = 100, max_linesearch_steps: int = 20,
          linesearch: str = "none", learning_rate: float = 1.0,
          mode: str = "compact"
          ) -> optax.GradientTransformation:
    """LBFGS, matching the reference's flagship solve.

    The reference's plate solve depends on LBFGS numerics (Adam
    demonstrably fails to capture the stress concentration, reference
    ``README.md:264-268``).  torch's LBFGS default — the configuration
    the baseline was measured with — uses a FIXED step lr=1 and NO line
    search (``examples/example4.py:68``); ``linesearch="none"`` mirrors
    that and is the default here.  It converges to the same plateau and
    runs ~6x faster on TPU than the zoom search, whose scalar-heavy
    while_loop costs ~20 ms/iteration of kernel overheads (measured).
    ``linesearch="zoom"`` selects the strong-Wolfe globalization for
    problems that need it.  ``memory_size`` default matches torch's
    ``history_size=100``.

    ``mode="compact"`` (default) computes the identical direction via
    the compact representation (``scale_by_compact_lbfgs`` — batched
    matmuls, ~8 kernels/iter); ``mode="scan"`` is optax's two-loop
    recursion (2*memory_size sequential scan steps/iter).
    """
    if mode not in ("compact", "scan"):
        raise ValueError(f"unknown mode {mode!r}")
    if linesearch == "zoom":
        return optax.lbfgs(
            memory_size=memory_size,
            linesearch=optax.scale_by_zoom_linesearch(
                max_linesearch_steps=max_linesearch_steps),
        )
    if linesearch == "none":
        if mode == "compact":
            return optax.chain(
                scale_by_compact_lbfgs(memory_size=memory_size),
                optax.scale_by_learning_rate(learning_rate),
            )
        return optax.lbfgs(learning_rate=learning_rate,
                           memory_size=memory_size, linesearch=None)
    raise ValueError(f"unknown linesearch {linesearch!r}")


def freeze_groups(inner: optax.GradientTransformation, frozen_keys
                  ) -> optax.GradientTransformation:
    """Wrap an optimizer so the given top-level keys receive zero updates.

    First-class version of the reference's alternating freeze scheme
    (``examples/example4.py:83-109`` toggles ``requires_grad``).
    """
    frozen = set(frozen_keys)

    def label_fn(params):
        return {k: ("frozen" if k in frozen else "active") for k in params}

    return optax.multi_transform(
        {"active": inner, "frozen": optax.set_to_zero()}, label_fn)
