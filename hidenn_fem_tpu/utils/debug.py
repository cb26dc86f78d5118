"""Numerical-sanity utilities (SURVEY.md §5 race/sanitizer analog).

The reference's closest analog to sanitizers is its epsilon clamps and the
NaN asserts in ``test_gradients`` (``src/utils.py:83-96``).  JAX-native
equivalents: the global nan-debug flag, a finite-check assert over pytrees,
and a gradient smoke check mirroring the reference helper.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["enable_nan_debugging", "assert_all_finite", "check_gradients"]


def enable_nan_debugging(enable: bool = True) -> None:
    """Trap NaN production inside jitted code (``jax_debug_nans``)."""
    jax.config.update("jax_debug_nans", enable)


def assert_all_finite(pytree: Any, name: str = "pytree") -> None:
    """Raise if any leaf contains NaN/Inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(pytree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{key}")


def check_gradients(loss_fn: Callable, params, verbose: bool = True
                    ) -> dict:
    """One value_and_grad pass; asserts finite loss and gradients for every
    parameter group and returns their norms.

    The reference's only 'test' (``src/utils.py:83-96`` ``test_gradients``)
    as a reusable, assertion-backed utility.
    """
    value, grads = jax.value_and_grad(loss_fn)(params)
    if not bool(jnp.isfinite(value)):
        raise FloatingPointError(f"loss is non-finite: {value}")
    assert_all_finite(grads, "grads")
    norms = {k: float(jnp.sqrt(sum(jnp.sum(x * x)
                                   for x in jax.tree.leaves(v))))
             for k, v in grads.items()}
    if verbose:
        print("Gradient magnitudes:")
        for k, v in norms.items():
            print(f"  {k}: {v:.6e}")
    return norms
