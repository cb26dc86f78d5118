"""Tracing / profiling helpers (SURVEY.md §5: the reference has none).

Thin wrappers over ``jax.profiler`` trace annotations plus robust wall
timing for this framework's two realities:

* production runs: whole solves are one on-device scan; per-step cost is
  measured by *slope timing* (two scan lengths, difference — immune to
  fixed dispatch/transfer overheads, which can be multi-ms on tunneled
  devices);
* interactive runs: ``annotate`` scopes show up in any captured
  ``jax.profiler`` trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["annotate", "trace_to", "slope_time_scan", "sync_time"]


@contextlib.contextmanager
def annotate(name: str):
    """Named scope visible in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync_time(fn: Callable, *args, repeats: int = 3) -> float:
    """Best-of wall time of ``fn(*args)`` with device sync (seconds)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        # force a scalar fetch: on asynchronous/tunneled backends,
        # block_until_ready alone can return before execution completes
        leaf = jax.tree.leaves(out)[0]
        _ = leaf.ravel()[0].item() if hasattr(leaf, "ravel") else leaf
        best = min(best, time.perf_counter() - t0)
    return best


def slope_time_scan(step_fn: Callable, init, n1: int = 50, n2: int = 550,
                    repeats: int = 3, args: tuple = ()) -> float:
    """True per-iteration device time of ``step_fn`` via slope timing.

    Builds two jitted programs scanning ``step_fn`` n1 and n2 times and
    returns (t2 - t1) / (n2 - n1): fixed per-call costs (dispatch, compile
    cache lookup, host<->device transfer latency) cancel exactly.

    ``step_fn(carry, *args) -> (carry, scalar)``; the final scalar is
    fetched to defeat lazy/async execution.

    Pass loop-INVARIANT data (meshes, tables) via ``args``, NOT inside
    the carry: they become operands of the jitted program that the scan
    body closes over — exactly the production drivers' shape
    (``solve/drivers.py`` ``loss_args``).  Measured on v5e: invariant
    arrays threaded through the scan carry instead get copied every
    iteration (~15 µs/step for a 6.4K-element mesh's tables, ~ms at
    922K), silently inflating per-step numbers.
    """

    def make(iters):
        @jax.jit
        def run(c, *a):
            def body(cc, _):
                cc, val = step_fn(cc, *a)
                return cc, val
            _, vals = jax.lax.scan(body, c, length=iters)
            return vals[-1]
        return run

    r1, r2 = make(n1), make(n2)
    float(r1(init, *args))
    float(r2(init, *args))

    def t(r):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(r(init, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(r2) - t(r1)) / (n2 - n1)
