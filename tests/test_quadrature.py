"""Quadrature-rule tests.

Same oracle as the reference (``/root/reference/tests/quadrature_rule.cpp``):
an n-point Gauss-Legendre rule must integrate polynomials of degree 2n-1
exactly, and an n-point Gauss-Lobatto rule degree 2n-3, verified by
integrating a Chebyshev-polynomial combination with known integral over
[-1, 1] to 1e-10 absolute accuracy.
"""

import numpy as np
import pytest

from cuddhelmholtz_tpu.utils.quadrature import QuadratureRule

TOL = 1e-10


def chebyshev_combo(degree: int, x: np.ndarray) -> np.ndarray:
    """A full-degree polynomial: sum of Chebyshev T_0..T_degree."""
    total = np.zeros_like(x)
    for k in range(degree + 1):
        total += np.cos(k * np.arccos(np.clip(x, -1.0, 1.0)))
    return total


def chebyshev_combo_integral(degree: int) -> float:
    """Exact integral over [-1,1]: int T_k = 0 for odd k, 2/(1-k^2) for even."""
    total = 0.0
    for k in range(degree + 1):
        if k % 2 == 0:
            total += 2.0 / (1.0 - k * k) if k != 1 else 0.0
    return total


@pytest.mark.parametrize("n", range(1, 16))
def test_gauss_legendre_exactness(n):
    rule = QuadratureRule(n, QuadratureRule.GaussLegendre)
    degree = 2 * n - 1
    approx = np.dot(rule.w, chebyshev_combo(degree, rule.x))
    assert abs(approx - chebyshev_combo_integral(degree)) < TOL


@pytest.mark.parametrize("n", range(2, 16))
def test_gauss_lobatto_exactness(n):
    rule = QuadratureRule(n, QuadratureRule.GaussLobatto)
    degree = 2 * n - 3
    approx = np.dot(rule.w, chebyshev_combo(degree, rule.x))
    assert abs(approx - chebyshev_combo_integral(degree)) < TOL


def test_lobatto_includes_endpoints():
    for n in range(2, 12):
        rule = QuadratureRule(n, QuadratureRule.GaussLobatto)
        assert rule.x[0] == -1.0 and rule.x[-1] == 1.0
        assert np.all(np.diff(rule.x) > 0)


def test_weights_sum_to_two():
    for n in range(2, 14):
        for kind in (QuadratureRule.GaussLegendre, QuadratureRule.GaussLobatto):
            rule = QuadratureRule(n, kind)
            assert abs(rule.w.sum() - 2.0) < TOL
            assert np.all(rule.w > 0)


def test_name_cache_key():
    assert QuadratureRule(4, QuadratureRule.GaussLegendre).name == "legendre00004"
    assert QuadratureRule(12, QuadratureRule.GaussLobatto).name == "lobatto00012"
