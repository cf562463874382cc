"""Implicitly differentiated linear solves (the adjoint method, in one line).

A capability the CUDA reference cannot offer: because every operator here is
a pure jittable function of its (coefficient) data, a Helmholtz solve can be
differentiated with ``jax.grad`` — gradients of any scalar functional of the
solution with respect to the wave-speed field, the right-hand side, or the
frequency, at the cost of ONE extra (adjoint) solve, independent of the
number of parameters.  This is the workhorse of full-waveform inversion and
optimal-design loops on top of the forward solver.

Implementation: ``jax.lax.custom_linear_solve`` around the library's own
GMRES.  JAX's implicit-function rule turns reverse-mode differentiation of
``x = A(theta)^{-1} b`` into

    lambda = A(theta)^{-T} x_bar          (one adjoint solve)
    theta_bar = -lambda^T (dA/dtheta) x   (a VJP through the matvec)
    b_bar = lambda

so the GMRES iteration itself is never differentiated through (no O(iters)
memory, no unrolled while_loop).  The coupled Helmholtz system is symmetric
(the sign flip in the second block, ``models/helmholtz.py``), so the adjoint
solve reuses the forward solver verbatim.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax import lax

from .gmres import gmres


def implicit_solve(
    matvec: Callable,
    b: jax.Array,
    *,
    symmetric: bool = False,
    m: int = 30,
    maxit: int = 200,
    tol: float = 1e-10,
    precond: Callable | None = None,
    solve: Callable | None = None,
    transpose_solve: Callable | None = None,
) -> jax.Array:
    """Solve ``A x = b`` differentiably: gradients flow to ``b`` AND to any
    arrays closed over by ``matvec`` (coefficients, frequency, ...) via the
    adjoint method — one extra linear solve per reverse pass.

    ``matvec`` must be a pure, traceable function of one vector.  By default
    both the forward and the adjoint systems are solved with the library's
    fully-jitted ``gmres`` at (m, maxit, tol); pass ``solve`` /
    ``transpose_solve`` with signature ``(matvec, rhs) -> x`` to substitute
    any solver (e.g. an FGMRES+DDH composite for large problems).  For
    ``symmetric=True`` (the coupled Helmholtz operator is symmetric) the
    adjoint solve reuses ``solve``.

    Returns only ``x`` (``lax.custom_linear_solve`` fixes the output pytree);
    run ``gmres`` directly when iteration statistics are needed.
    """
    if solve is None:

        def solve(mv, rhs):
            return gmres(mv, rhs, m=m, maxit=maxit, tol=tol, precond=precond).x

    if transpose_solve is None:
        # custom_linear_solve hands the transpose solve a matvec computing
        # A^T y, so the same Krylov solver applies; with a left
        # preconditioner this adjoint solve is preconditioned by P (not P^T),
        # which only changes the iteration path, not the solution.
        transpose_solve = solve

    return lax.custom_linear_solve(
        matvec, b, solve, transpose_solve=transpose_solve, symmetric=symmetric
    )
