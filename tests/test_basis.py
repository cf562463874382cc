"""Nodal-basis tests.

Same oracle as the reference (``/root/reference/tests/basis.cpp``): the
degree n-1 Lagrange basis on GLL nodes must reproduce the Legendre polynomial
P_{n-1} and its derivative exactly (1e-10) on a 10-point uniform grid.
"""

import numpy as np
import pytest

from cuddhelmholtz_tpu.utils.basis import Basis
from cuddhelmholtz_tpu.utils.jacobi import jacobi_p, jacobi_p_derivative

TOL = 1e-10
GRID = np.linspace(-1.0, 1.0, 10)


@pytest.mark.parametrize("n", range(2, 15))
def test_interpolates_legendre(n):
    basis = Basis(n)
    nodal = jacobi_p(n - 1, 0.0, 0.0, basis.nodes)
    P = basis.eval(GRID)
    exact = jacobi_p(n - 1, 0.0, 0.0, GRID)
    assert np.max(np.abs(P @ nodal - exact)) < TOL


@pytest.mark.parametrize("n", range(2, 15))
def test_differentiates_legendre(n):
    basis = Basis(n)
    nodal = jacobi_p(n - 1, 0.0, 0.0, basis.nodes)
    D = basis.deriv(GRID)
    exact = jacobi_p_derivative(1, n - 1, 0.0, 0.0, GRID)
    assert np.max(np.abs(D @ nodal - exact)) < TOL


@pytest.mark.parametrize("n", range(2, 12))
def test_eval_at_nodes_is_identity(n):
    basis = Basis(n)
    P = basis.eval(basis.nodes)
    assert np.max(np.abs(P - np.eye(n))) < TOL


@pytest.mark.parametrize("n", range(2, 10))
def test_mass_matrix_exact(n):
    """M_ij = int l_i l_j computed by dense quadrature agrees with Basis."""
    from cuddhelmholtz_tpu.utils.quadrature import QuadratureRule

    basis = Basis(n)
    q = QuadratureRule(2 * n, QuadratureRule.GaussLegendre)
    P = basis.eval(q.x)
    M_ref = (P * q.w[:, None]).T @ P
    assert np.max(np.abs(basis.mass_matrix - M_ref)) < TOL


@pytest.mark.parametrize("n", range(2, 10))
def test_derivative_matrix_annihilates_constants(n):
    basis = Basis(n)
    ones = np.ones(n)
    assert np.max(np.abs(basis.derivative_matrix @ ones)) < 1e-12
