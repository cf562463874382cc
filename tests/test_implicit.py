"""Implicit differentiation of linear solves (solvers/implicit.py).

Oracles: (1) the adjoint identity grad_b 0.5||x||^2 = A^{-T} x for a known
operator; (2) central finite differences of the FWI misfit with respect to
the nodal wave speed and omega on a small Helmholtz problem; (3) the
traceable coefficient-update operators reproduce the host-collocated ones
bit-for-bit (fp64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.models.helmholtz import (
    apply_helmholtz,
    helmholtz_op_with_coeff,
    make_helmholtz_op,
    make_helmholtz_template,
)
from cuddhelmholtz_tpu.models.inverse import (
    invert_wavespeed,
    misfit,
    solve_helmholtz_diff,
)
from cuddhelmholtz_tpu.ops.face_mass import (
    face_mass_op_with_coeff,
    make_face_mass_op,
)
from cuddhelmholtz_tpu.ops.mass import (
    make_mass_op,
    mass_op_with_coeff,
    variable_coeff_n_quad,
)
from cuddhelmholtz_tpu.solvers.implicit import implicit_solve
from cuddhelmholtz_tpu.spaces.h1 import FaceSpace, H1Space
from cuddhelmholtz_tpu.utils.basis import Basis


def _toeplitz_matvec(d):
    """Nonsymmetric tridiagonal Toeplitz (the reference's GMRES fixture,
    tests/gmres.cpp:7-37) with a traced diagonal d."""

    def mv(x):
        lower = jnp.concatenate([jnp.zeros(1, x.dtype), x[:-1]])
        upper = jnp.concatenate([x[1:], jnp.zeros(1, x.dtype)])
        return d * x - 1.0 * lower + 0.5 * upper

    return mv


def _small_helmholtz(nx=4, deg=2):
    mesh = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
    fem = H1Space(mesh, Basis(deg + 1))
    fs = FaceSpace(fem, mesh.boundary_edges)
    return mesh, fem, fs


def test_coeff_update_matches_host_collocation():
    _, fem, fs = _small_helmholtz()
    rng = np.random.default_rng(3)
    a = 1.0 + 0.3 * rng.standard_normal(fem.ndof)

    nq = variable_coeff_n_quad(fem)
    base = make_mass_op(fem, n_quad=nq)
    ref = make_mass_op(fem, coeff=a)
    upd = mass_op_with_coeff(base, jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(upd.wdetj), np.asarray(ref.wdetj), rtol=1e-14)

    af = a[fs.proj]
    fbase = make_face_mass_op(fs, n_quad=nq)
    fref = make_face_mass_op(fs, coeff=af)
    fupd = face_mass_op_with_coeff(fbase, jnp.asarray(af))
    np.testing.assert_allclose(np.asarray(fupd.wds), np.asarray(fref.wds), rtol=1e-14)


def test_helmholtz_op_with_coeff_matches_make():
    _, fem, fs = _small_helmholtz()
    rng = np.random.default_rng(4)
    a = 1.0 + 0.2 * rng.standard_normal(fem.ndof)
    omega = 3.1

    tmpl = make_helmholtz_template(fem, fs)
    op_t = helmholtz_op_with_coeff(tmpl, omega, jnp.asarray(a * a), jnp.asarray(a[fs.proj]))
    op_r = make_helmholtz_op(omega, a * a, a[fs.proj], fem, fs)

    U = rng.standard_normal(2 * fem.ndof)
    y_t = np.asarray(apply_helmholtz(op_t, jnp.asarray(U)))
    y_r = np.asarray(apply_helmholtz(op_r, jnp.asarray(U)))
    np.testing.assert_allclose(y_t, y_r, rtol=1e-12, atol=1e-12)


def test_adjoint_gradient_wrt_rhs():
    """grad_b 0.5||x(b)||^2 == A^{-T} x for the Toeplitz fixture."""
    n = 40
    rng = np.random.default_rng(0)
    d = jnp.asarray(2.5 + 0.1 * rng.standard_normal(n))
    b = jnp.asarray(rng.standard_normal(n))
    mv = _toeplitz_matvec(d)

    def loss(b):
        x = implicit_solve(mv, b, m=20, maxit=50, tol=1e-12)
        return 0.5 * jnp.sum(x * x)
    g = jax.grad(loss)(b)

    # reference: x = A^{-1} b, g_ref = A^{-T} x via a dense solve
    A = np.asarray(jax.jacfwd(mv)(jnp.zeros(n)))
    x = np.linalg.solve(A, np.asarray(b))
    g_ref = np.linalg.solve(A.T, x)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-8, atol=1e-10)


def test_gradient_wrt_matvec_params():
    """Gradients flow to arrays closed over by the matvec (the diagonal)."""
    n = 30
    rng = np.random.default_rng(1)
    d0 = 3.0 + 0.1 * rng.standard_normal(n)
    b = jnp.asarray(rng.standard_normal(n))

    def loss(d):
        x = implicit_solve(_toeplitz_matvec(d), b, m=15, maxit=50, tol=1e-12)
        return jnp.sum(x**3)

    g = np.asarray(jax.grad(loss)(jnp.asarray(d0)))

    eps = 1e-6
    for i in [0, n // 2, n - 1]:
        dp, dm = d0.copy(), d0.copy()
        dp[i] += eps
        dm[i] -= eps
        fd = (float(loss(jnp.asarray(dp))) - float(loss(jnp.asarray(dm)))) / (2 * eps)
        assert abs(g[i] - fd) < 1e-5 * max(1.0, abs(fd))


@pytest.fixture(scope="module")
def fwi_setup():
    _, fem, fs = _small_helmholtz(nx=4, deg=2)
    rng = np.random.default_rng(7)
    omega = 2.0
    tmpl = make_helmholtz_template(fem, fs)
    b = jnp.asarray(rng.standard_normal(2 * fem.ndof)) * 0.1
    a_true = 1.0 + 0.1 * np.cos(np.pi * fem.coords[:, 0]) * np.cos(np.pi * fem.coords[:, 1])
    obs = solve_helmholtz_diff(tmpl, omega, jnp.asarray(a_true), b, tol=1e-12)
    return fem, fs, tmpl, omega, b, obs


def test_fwi_gradient_vs_finite_differences(fwi_setup):
    fem, fs, tmpl, omega, b, obs = fwi_setup
    rng = np.random.default_rng(8)
    a0 = np.ones(fem.ndof)

    f = lambda a: misfit(tmpl, omega, a, b, obs, tol=1e-12)
    val, g = jax.value_and_grad(f)(jnp.asarray(a0))
    g = np.asarray(g)
    assert np.isfinite(val) and val > 0

    # directional finite differences along random directions
    eps = 1e-6
    for seed in range(3):
        v = np.random.default_rng(seed).standard_normal(fem.ndof)
        v /= np.linalg.norm(v)
        fp = float(f(jnp.asarray(a0 + eps * v)))
        fm = float(f(jnp.asarray(a0 - eps * v)))
        fd = (fp - fm) / (2 * eps)
        ad = float(g @ v)
        assert abs(ad - fd) < 2e-5 * max(1.0, abs(fd)), (seed, ad, fd)


def test_fwi_gradient_wrt_omega(fwi_setup):
    fem, fs, tmpl, omega, b, obs = fwi_setup
    a0 = jnp.ones(fem.ndof)

    f = lambda w: misfit(tmpl, w, a0, b, obs, tol=1e-12)
    g = float(jax.grad(f)(jnp.asarray(omega)))
    eps = 1e-6
    fd = (float(f(jnp.asarray(omega + eps))) - float(f(jnp.asarray(omega - eps)))) / (2 * eps)
    assert abs(g - fd) < 1e-5 * max(1.0, abs(fd))


def test_ddh_solve_hook_matches_default_path():
    """solve_helmholtz_diff with the FGMRES+DDH hook returns the same
    solution and adjoint gradient as the default GMRES path: a
    preconditioner (even a frozen, fp32, iterative one) never changes the
    converged answer, only the iteration path."""
    from cuddhelmholtz_tpu.models.inverse import ddh_solve_hook
    from cuddhelmholtz_tpu.ops.functional import linear_functional
    from cuddhelmholtz_tpu.ops.mass import (
        apply_diag_inv_mass,
        make_diag_inv_mass_op,
    )
    from cuddhelmholtz_tpu.solvers.ddh import DDH

    nx, deg = 8, 3
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
    fem = H1Space(mesh, Basis(deg + 1))
    fs = FaceSpace(fem, mesh.boundary_edges)
    tmpl = make_helmholtz_template(fem, fs)

    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.standard_normal(2 * fem.ndof)) * 0.1
    a0 = jnp.ones(fem.ndof)

    # DDH frozen at a slightly WRONG coefficient (as in an inversion loop):
    # preconditioner quality affects only the iteration count, not the answer
    mi = make_diag_inv_mass_op(fem)
    a_frozen = np.asarray(
        apply_diag_inv_mass(mi, linear_functional(fem, lambda xy: 1.05))
    )
    ddh = DDH(omega, a_frozen, fem, nx=nx, ny=nx)
    ddh.precompute_transfer()
    hook = ddh_solve_hook(ddh, m=30, maxit=50, tol=1e-11)

    U_ref = solve_helmholtz_diff(tmpl, omega, a0, b, tol=1e-11)
    U_ddh = solve_helmholtz_diff(tmpl, omega, a0, b, solve=hook)
    np.testing.assert_allclose(
        np.asarray(U_ddh), np.asarray(U_ref), rtol=0, atol=1e-6
    )

    obs = 0.9 * U_ref
    g_ref = jax.grad(lambda a: misfit(tmpl, omega, a, b, obs, tol=1e-11))(a0)
    g_ddh = jax.grad(
        lambda a: misfit(tmpl, omega, a, b, obs, solve=hook)
    )(a0)
    np.testing.assert_allclose(
        np.asarray(g_ddh), np.asarray(g_ref), rtol=0, atol=1e-6
    )


def test_invert_wavespeed_descends(fwi_setup):
    fem, fs, tmpl, omega, b, obs = fwi_setup
    a, hist = invert_wavespeed(
        fem,
        fs,
        omega,
        b,
        obs,
        np.ones(fem.ndof),
        steps=5,
        step_size=0.5,
        solve_kwargs={"tol": 1e-10},
    )
    hist = np.asarray(hist)
    assert hist[-1] < hist[0] * 0.9  # monotone-ish descent on a smooth misfit
    assert np.all(np.isfinite(np.asarray(a)))
