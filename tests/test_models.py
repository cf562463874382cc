"""Model-level tests: Poisson with lifting, coupled Helmholtz operator."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.models.helmholtz import (
    apply_helmholtz,
    helmholtz_rhs,
    make_helmholtz_op,
    project_coefficients,
)
from cuddhelmholtz_tpu.models.poisson import solve_poisson
from cuddhelmholtz_tpu.spaces.h1 import FaceSpace, H1Space
from cuddhelmholtz_tpu.utils.basis import Basis


def _setup(nx=8, deg=3):
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(deg + 1))
    fs = FaceSpace(fem, mesh.boundary_edges)
    return mesh, fem, fs


def test_poisson_harmonic_exact():
    """u = x^2 - y^2 is harmonic and in the FE space: recovered to solver tol."""
    mesh, fem, fs = _setup(nx=6, deg=3)

    def g(xy):
        return xy[..., 0] ** 2 - xy[..., 1] ** 2

    u, out = solve_poisson(
        fem, fs, lambda xy: jnp.zeros(xy.shape[:-1]), g, m=30, maxit=20, tol=1e-10
    )
    exact = g(fem.coords)
    err = np.linalg.norm(u - exact) / np.linalg.norm(exact)
    assert bool(out.success)
    assert err < 1e-8, err


def test_poisson_manufactured_convergence():
    """u = sin(pi x) sin(pi y): spectral accuracy at moderate p."""
    mesh, fem, fs = _setup(nx=8, deg=5)

    def f(xy):
        return (
            2.0
            * np.pi**2
            * jnp.sin(np.pi * xy[..., 0])
            * jnp.sin(np.pi * xy[..., 1])
        )

    def g(xy):
        return jnp.zeros(xy.shape[:-1])

    u, out = solve_poisson(fem, fs, f, g, m=50, maxit=40, tol=1e-12)
    exact = np.sin(np.pi * fem.coords[:, 0]) * np.sin(np.pi * fem.coords[:, 1])
    err = np.max(np.abs(np.asarray(u) - exact))
    assert err < 1e-6, err


@pytest.fixture(scope="module")
def helmholtz_setup():
    mesh, fem, fs = _setup(nx=8, deg=3)

    def a_fn(xy):
        r = xy[..., 0] ** 2 + xy[..., 1] ** 2
        return jnp.where(r < 0.0625, 0.2, 1.0)

    a2, af = project_coefficients(fem, fs, a_fn)
    omega = 2 * np.pi * 0.8
    op = make_helmholtz_op(omega, a2, af, fem, fs)
    return fem, fs, op


def test_helmholtz_operator_symmetric(helmholtz_setup):
    """The sign-flipped coupled system is symmetric (Helmholtz.hpp:55)."""
    fem, fs, op = helmholtz_setup
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal(2 * fem.ndof))
    W = jnp.asarray(rng.standard_normal(2 * fem.ndof))
    a = float(jnp.vdot(apply_helmholtz(op, U), W))
    b = float(jnp.vdot(U, apply_helmholtz(op, W)))
    assert abs(a - b) < 1e-8 * max(1.0, abs(a))


def test_helmholtz_gmres_converges(helmholtz_setup):
    from cuddhelmholtz_tpu.solvers.gmres import gmres

    fem, fs, op = helmholtz_setup

    def f(xy):
        s = op.omega**2
        r = (xy[..., 0] + 0.5) ** 2 + xy[..., 1] ** 2
        return s / np.pi * jnp.exp(-s * r)

    b = helmholtz_rhs(fem, f)
    out = gmres(lambda U: apply_helmholtz(op, U), b, m=150, maxit=100, tol=1e-6)
    assert bool(out.success)
    # residual history decreases overall
    hist = np.asarray(out.res_norm)
    k = int(out.n_hist)
    assert hist[k - 1] < hist[0]
