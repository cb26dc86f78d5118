"""Quadrature exactness tests (SURVEY.md §4: rule of order n integrates
polynomials up to its degree guarantee).

Exact monomial integrals over the unit reference triangle:
    ∫∫ x^p y^q dA = p! q! / (p + q + 2)!
"""

import math

import numpy as np
import pytest

from hidenn_fem_tpu.ops import quadrature as quad


def tri_monomial_exact(p, q):
    return math.factorial(p) * math.factorial(q) / math.factorial(p + q + 2)


@pytest.mark.parametrize("order", sorted(quad.TRIANGLE_RULE_DEGREE))
def test_triangle_rule_exactness(order):
    deg = quad.TRIANGLE_RULE_DEGREE[order]
    pts, w = quad.triangle_gauss_points(order)
    pts = np.asarray(pts, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    assert np.isclose(w.sum(), 0.5, atol=1e-7)  # area of reference triangle
    for p in range(deg + 1):
        for q in range(deg + 1 - p):
            approx = np.sum(w * pts[:, 0] ** p * pts[:, 1] ** q)
            assert np.isclose(approx, tri_monomial_exact(p, q), atol=1e-7), \
                (order, p, q)


@pytest.mark.parametrize("order", [1, 2, 3, 5, 8])
def test_interval_rule_unit(order):
    x, w = quad.interval_gauss_points(order)
    x = np.asarray(x, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    assert np.all((x >= 0) & (x <= 1))
    # degree of exactness 2*order - 1 on [0, 1]
    for p in range(2 * order):
        assert np.isclose(np.sum(w * x ** p), 1.0 / (p + 1), atol=1e-7), \
            (order, p)


@pytest.mark.parametrize("order", [1, 2, 4])
def test_interval_rule_m11_legacy(order):
    """The raw [-1,1] rule kept for reference-compat paths sums to 2."""
    x, w = quad.interval_gauss_points_m11(order)
    assert np.isclose(np.asarray(w).sum(), 2.0, atol=1e-6)
    for p in range(2 * order):
        exact = 0.0 if p % 2 else 2.0 / (p + 1)
        assert np.isclose(np.sum(np.asarray(w) * np.asarray(x) ** p), exact,
                          atol=1e-6)


def test_unsupported_triangle_order_raises():
    with pytest.raises(NotImplementedError):
        quad.triangle_gauss_points(5)
