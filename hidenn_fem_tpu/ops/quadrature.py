"""Gaussian quadrature tables (host-precomputed, device-resident).

Capability parity with the reference's quadrature layer
(``/root/reference/src/utils.py:4-81``), rebuilt for JAX:

* ``interval_gauss_points(order)`` — Gauss–Legendre on the *unit interval*
  [0, 1].  The reference's docstring claims [0, 1] but actually returns the
  raw [-1, 1] rule (reference ``src/utils.py:5-11``, quirk E3 in SURVEY.md);
  we default to the mathematically correct [0, 1] rule and expose the raw
  rule as ``interval_gauss_points_m11`` for the legacy-compat path.
* ``triangle_gauss_points(order)`` — symmetric rules on the reference unit
  triangle (0,0)-(1,0)-(0,1), orders {1, 3, 4, 6, 7} as in the reference
  (``src/utils.py:13-81``), weights pre-scaled by the triangle area 1/2.

All tables are computed in float64 on the host and cast once; they are tiny
constants that XLA folds into the compiled executable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "interval_gauss_points",
    "interval_gauss_points_m11",
    "gauss_legendre_points_weights",
    "triangle_gauss_points",
    "TRIANGLE_RULE_DEGREE",
]

# polynomial degree integrated exactly by each supported triangle rule
TRIANGLE_RULE_DEGREE = {1: 1, 3: 2, 4: 3, 6: 4, 7: 5}


@functools.lru_cache(maxsize=None)
def _leggauss(order: int):
    x, w = np.polynomial.legendre.leggauss(order)
    return x, w


def interval_gauss_points(order: int = 1, dtype=jnp.float32):
    """Gauss–Legendre points/weights on [0, 1] (weights sum to 1)."""
    x, w = _leggauss(order)
    x01 = 0.5 * (x + 1.0)
    w01 = 0.5 * w
    return jnp.asarray(x01, dtype=dtype), jnp.asarray(w01, dtype=dtype)


def interval_gauss_points_m11(order: int = 1, dtype=jnp.float32):
    """Raw Gauss–Legendre points/weights on [-1, 1] (weights sum to 2).

    This is what the reference's ``interval_gauss_points`` actually returns
    (``src/utils.py:8``); kept for bit-compat paths (legacy edge quadrature,
    1D bar element maps that do their own affine transform).
    """
    x, w = _leggauss(order)
    return jnp.asarray(x, dtype=dtype), jnp.asarray(w, dtype=dtype)


# Migration alias: the reference's example3 imports this name, which does
# not exist in the reference's own utils (quirk E2, ``examples/example3.py:5``
# vs ``src/utils.py:4``).  The call site's intended semantics are the raw
# [-1, 1] rule with a caller-side affine map.
gauss_legendre_points_weights = interval_gauss_points_m11


def _triangle_rule_f64(order: int):
    """Barycentric-symmetric quadrature rules on the unit reference triangle.

    Standard published rules (centroid / interior-3-point / Dunavant family),
    same order keys as the reference (``src/utils.py:20-79``).  Points are
    (r, s) with the triangle {r>=0, s>=0, r+s<=1}; weights include the 1/2
    reference-triangle area so that sum(w) == area == 0.5.
    """
    if order == 1:
        pts = np.array([[1.0 / 3.0, 1.0 / 3.0]])
        w = np.array([1.0])
    elif order == 3:
        a = 1.0 / 6.0
        b = 2.0 / 3.0
        pts = np.array([[a, a], [b, a], [a, b]])
        w = np.array([1.0, 1.0, 1.0]) / 3.0
    elif order == 4:
        pts = np.array(
            [
                [1.0 / 3.0, 1.0 / 3.0],
                [0.6, 0.2],
                [0.2, 0.6],
                [0.2, 0.2],
            ]
        )
        w = np.array([-27.0, 25.0, 25.0, 25.0]) / 48.0
    elif order == 6:
        a = 0.445948490915965
        b = 0.091576213509771
        wa = 0.223381589678011
        wb = 0.109951743655322
        pts = np.array(
            [
                [a, a],
                [1.0 - 2.0 * a, a],
                [a, 1.0 - 2.0 * a],
                [b, b],
                [1.0 - 2.0 * b, b],
                [b, 1.0 - 2.0 * b],
            ]
        )
        w = np.array([wa, wa, wa, wb, wb, wb])
    elif order == 7:
        a = 0.470142064105115
        b = 0.101286507323456
        wa = 0.132394152788506
        wb = 0.125939180544827
        pts = np.array(
            [
                [1.0 / 3.0, 1.0 / 3.0],
                [1.0 - 2.0 * a, a],
                [a, 1.0 - 2.0 * a],
                [a, a],
                [1.0 - 2.0 * b, b],
                [b, 1.0 - 2.0 * b],
                [b, b],
            ]
        )
        w = np.array([0.225, wa, wa, wa, wb, wb, wb])
    else:
        raise NotImplementedError(
            f"triangle quadrature order {order} not supported; "
            f"supported orders: {sorted(TRIANGLE_RULE_DEGREE)}"
        )
    # scale normalized weights (sum=1) by the reference-triangle area 1/2
    return pts, 0.5 * w


def triangle_gauss_points(order: int = 1, dtype=jnp.float32):
    """Quadrature (points[n,2], weights[n]) on the unit reference triangle."""
    pts, w = _triangle_rule_f64(order)
    return jnp.asarray(pts, dtype=dtype), jnp.asarray(w, dtype=dtype)


def triangle_weight_sum(order: int = 1) -> float:
    """Host-side (Python float) sum of the triangle rule weights — always
    the reference-triangle area 0.5; provided so jitted code can consume
    it as a static scalar without staging the weight table."""
    _, w = _triangle_rule_f64(order)
    return float(np.sum(w))
