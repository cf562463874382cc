"""Two-level DDH coarse space (solvers/coarse.py).

Beyond-reference capability: the reference DDH is strictly one-level
(``/root/reference/source/DDH.cpp:111-321``).  The Galerkin coarse matrix is
assembled EXACTLY from the per-subdomain transfer stack (the own-slot B1
scatter is collision-free), which these tests pin against a brute-force
``Z^T A Z`` through the production action.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.models.helmholtz import helmholtz_rhs
from cuddhelmholtz_tpu.ops.functional import linear_functional
from cuddhelmholtz_tpu.ops.mass import apply_diag_inv_mass, make_diag_inv_mass_op
from cuddhelmholtz_tpu.solvers.coarse import (
    build_coarse_space,
    build_coarse_space_sparse,
    coarse_apply,
    superdomain_labels,
)
from cuddhelmholtz_tpu.solvers.ddh import DDH
from cuddhelmholtz_tpu.solvers.gmres import fgmres, gmres
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis

RIDGE = 1e-8


@pytest.fixture(scope="module")
def coarse_setup():
    # nx=8 keeps the CPU transfer precompute fast at the REAL time-step
    # count (nt_override would break the leapfrog CFL limit -> NaN)
    nx, deg = 8, 3
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(deg + 1))

    def alpha(xy):
        r = xy[..., 0] ** 2 + xy[..., 1] ** 2
        return jnp.where(r < 0.0625, 0.2, 1.0)

    b_a = linear_functional(fem, alpha)
    mi = make_diag_inv_mass_op(fem)
    a_nodal = np.asarray(apply_diag_inv_mass(mi, b_a))
    ddh = DDH(omega, a_nodal, fem, nx=nx, ny=nx)
    ddh.precompute_transfer()
    cs = build_coarse_space(ddh, n_dir=2, domains_per_super=1, ridge=RIDGE)
    return fem, omega, ddh, cs


def _dense_Z(ddh, cs):
    V = np.asarray(cs.V, np.float64)
    sd = np.asarray(cs.sd)
    nm = V.shape[2]
    nS = cs.Einv.shape[0] // (2 * nm)
    ndom, pf = V.shape[:2]
    n_own, n_lambda = ddh.n_own, ddh.n_lambda
    Z = np.zeros((2 * n_lambda, 2 * nS * nm))
    for side in (0, 1):
        for s in range(nS):
            for j in range(nm):
                col = side * nS * nm + s * nm + j
                z = np.zeros((ndom, pf))
                z[sd == s] = V[sd == s, :, j]
                Z[side * n_lambda : side * n_lambda + n_own, col] = z.reshape(-1)
    return Z


def test_superdomain_labels_balanced():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((64, 2))
    lab = superdomain_labels(pts, 8)
    counts = np.bincount(lab)
    assert len(counts) == 8 and counts.min() == counts.max() == 8


def test_coarse_matrix_matches_brute_force(coarse_setup):
    """Assembled E == Z^T (I - U) Z computed through the production action."""
    fem, omega, ddh, cs = coarse_setup
    Z = _dense_Z(ddh, cs)
    nc = Z.shape[1]
    E_brute = np.zeros((nc, nc))
    for J in range(nc):
        w = np.asarray(ddh.action(jnp.asarray(Z[:, J], jnp.float32)), np.float64)
        E_brute[:, J] = Z.T @ w
    d = 1.0 / np.asarray(cs.dscale, np.float64)
    En = np.linalg.inv(np.asarray(cs.Einv, np.float64))
    En[np.arange(nc), np.arange(nc)] -= RIDGE
    E_asm = En * d[:, None] * d[None, :]
    err = np.abs(E_asm - E_brute).max() / np.abs(E_brute).max()
    assert err < 1e-5, err  # fp32 transfer data; assembly itself is exact


def test_coarse_apply_matches_dense(coarse_setup):
    """Device coarse_apply == dense Z E^{-1} Z^T v."""
    fem, omega, ddh, cs = coarse_setup
    Z = _dense_Z(ddh, cs)
    d = 1.0 / np.asarray(cs.dscale, np.float64)
    Einv = np.asarray(cs.Einv, np.float64)
    rng = np.random.default_rng(5)
    v = rng.standard_normal(2 * ddh.n_lambda)
    want = Z @ (((Einv @ (Z.T @ v / d)) / d))
    got = np.asarray(coarse_apply(cs, ddh.params, jnp.asarray(v, jnp.float32), ddh.n_own))
    err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-12)
    assert err < 1e-4, err


def test_two_level_solver_converges(coarse_setup):
    """Both correction modes converge to the one-level solution, and the
    solver() plumbing (coarse=...) produces the same trajectories."""
    fem, omega, ddh, cs = coarse_setup

    def f(xy):
        r = (xy[..., 0] + 0.5) ** 2 + xy[..., 1] ** 2
        return jnp.exp(-(omega**2) * r)

    b = jnp.asarray(helmholtz_rhs(fem, f), jnp.float32)
    Y = ddh.rhs(b)
    out0 = gmres(ddh.action, Y, m=20, maxit=100, tol=1e-4)
    assert bool(out0.success)
    x0 = np.asarray(out0.x)

    ddh.coarse_space = cs
    for mode in ("additive", "multiplicative"):

        def P(v, mode=mode):
            q = coarse_apply(cs, ddh.params, v, ddh.n_own)
            if mode == "multiplicative":
                return q + v - ddh.action(q)
            return v + q

        out = fgmres(ddh.action, Y, P, m=20, maxit=100, tol=1e-4)
        assert bool(out.success)
        # same linear system: solutions agree to solver tolerance
        rel = np.linalg.norm(np.asarray(out.x) - x0) / np.linalg.norm(x0)
        assert rel < 5e-3, (mode, rel)
        # the coarse correction must not significantly slow convergence
        assert int(out.num_iter) <= int(out0.num_iter) + 3

        solve = ddh.solver(20, 100, 1e-4, coarse=mode)
        out_s, U = solve(b)
        assert bool(out_s.success)
        assert int(out_s.num_iter) == int(out.num_iter)

    with pytest.raises(ValueError):
        ddh.solver(20, 100, 1e-4, coarse="bogus")
    ddh.coarse_space = None
    with pytest.raises(ValueError):
        ddh.solver(20, 100, 1e-4, coarse="additive")


def _sparse_dense_E(cs_sp):
    """Reconstruct the dense normalised coarse matrix from the block-sparse
    form, in the dense path's (side, superdomain, mode) ordering."""
    nbr = np.asarray(cs_sp.nbr)
    nS, K = nbr.shape
    nm = np.asarray(cs_sp.V).shape[2]
    # undo the matmul layout [r, (t j), (k s l)] -> [r, k, t, s, j, l]
    Eb = np.asarray(cs_sp.Eb, np.float64).reshape(nS, 2, nm, K, 2, nm)
    Eb = np.transpose(Eb, (0, 3, 1, 4, 2, 5))
    nc = 2 * nS * nm
    E = np.zeros((nc, nc))
    for r in range(nS):
        for k in range(K):
            c = nbr[r, k]
            if c < 0:
                continue
            for t in (0, 1):
                for s in (0, 1):
                    E[
                        (t * nS + r) * nm : (t * nS + r) * nm + nm,
                        (s * nS + c) * nm : (s * nS + c) * nm + nm,
                    ] += Eb[r, k, t, s]
    return E


def test_sparse_assembly_matches_dense(coarse_setup):
    """The block-sparse assembly is the SAME exact Galerkin matrix as the
    dense path -- storage changed, algebra did not."""
    fem, omega, ddh, cs = coarse_setup
    cs_sp = build_coarse_space_sparse(ddh, n_dir=2, domains_per_super=1, ridge=RIDGE,
                                      ortho=False)
    nc = cs.Einv.shape[0]
    En_dense = np.linalg.inv(np.asarray(cs.Einv, np.float64))
    En_sparse = _sparse_dense_E(cs_sp)
    err = np.abs(En_sparse - En_dense).max() / np.abs(En_dense).max()
    # dense path inverts in fp32; reconstruction noise only
    assert err < 1e-4, err
    # the scalings agree ((2, nS, nm) vs flat (side, super, mode))
    np.testing.assert_allclose(
        np.asarray(cs_sp.dscale).reshape(-1),
        np.asarray(cs.dscale),
        rtol=1e-6,
    )


def test_sparse_coarse_apply_matches_dense(coarse_setup):
    """With a tight inner solve the iterative correction reproduces the
    dense-inverse correction."""
    fem, omega, ddh, cs = coarse_setup
    cs_sp = build_coarse_space_sparse(ddh, n_dir=2, domains_per_super=1, ridge=RIDGE,
                                      ortho=False)
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal(2 * ddh.n_lambda), jnp.float32)
    want = np.asarray(coarse_apply(cs, ddh.params, v, ddh.n_own))
    got = np.asarray(
        coarse_apply(
            cs_sp, ddh.params, v, ddh.n_own,
            solve_m=60, solve_maxit=6, solve_tol=1e-8,
        )
    )
    err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-12)
    assert err < 1e-3, err


def test_two_level_sparse_solver_converges(coarse_setup):
    """The iterative coarse solve works as the outer FGMRES correction and
    does not degrade convergence vs one-level."""
    fem, omega, ddh, cs = coarse_setup

    def f(xy):
        r = (xy[..., 0] + 0.5) ** 2 + xy[..., 1] ** 2
        return jnp.exp(-(omega**2) * r)

    b = jnp.asarray(helmholtz_rhs(fem, f), jnp.float32)
    Y = ddh.rhs(b)
    out0 = gmres(ddh.action, Y, m=20, maxit=100, tol=1e-4)
    assert bool(out0.success)

    old_cs, old_meta = ddh.coarse_space, getattr(ddh, "_coarse_meta", None)
    try:
        ddh.make_coarse(n_dir=2, domains_per_super=1, ridge=RIDGE,
                        method="iterative")
        solve = ddh.solver(20, 100, 1e-4, coarse="multiplicative")
        out, U = solve(b)
        assert bool(out.success)
        rel = np.linalg.norm(np.asarray(out.x) - np.asarray(out0.x)) / np.linalg.norm(
            np.asarray(out0.x)
        )
        assert rel < 5e-3, rel
        assert int(out.num_iter) <= int(out0.num_iter) + 3
    finally:
        ddh.coarse_space, ddh._coarse_meta = old_cs, old_meta


def test_sparse_ortho_correction_matches_dense(coarse_setup):
    """The ortho transform is an exact (invertible) basis change when no
    directions are dropped, so the correction operator must be IDENTICAL to
    the dense-inverse one.  Regression test for the cross-superdomain row
    factor: the dual target's basis value must be transformed by the DUAL
    superdomain's W, not the own one's (a 28%-of-norm assembly error when
    sdd != sd)."""
    fem, omega, ddh, cs = coarse_setup
    # dps=4 ensures plenty of cross-superdomain dual pairs at nx=8 (4 supers)
    cs_d = build_coarse_space(ddh, n_dir=2, domains_per_super=4, ridge=RIDGE)
    cs_o = build_coarse_space_sparse(ddh, n_dir=2, domains_per_super=4,
                                     ridge=RIDGE, ortho=True)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(2 * ddh.n_lambda), jnp.float32)
    qd = np.asarray(coarse_apply(cs_d, ddh.params, v, ddh.n_own))
    qo = np.asarray(coarse_apply(cs_o, ddh.params, v, ddh.n_own,
                                 solve_m=60, solve_maxit=6, solve_tol=1e-9))
    err = np.linalg.norm(qo - qd) / max(np.linalg.norm(qd), 1e-12)
    assert err < 1e-4, err


def test_sparse_ortho_gram_identity(coarse_setup):
    """ortho=True: within each superdomain the surviving mode columns are
    orthonormal (local Gram == identity on kept directions), which is what
    keeps the block-Jacobi coarse solve stable at skeleton resolution."""
    fem, omega, ddh, cs = coarse_setup
    cs_o = build_coarse_space_sparse(ddh, n_dir=2, domains_per_super=1,
                                     ridge=RIDGE, ortho=True)
    V = np.asarray(cs_o.V, np.float64)
    sd = np.asarray(cs_o.sd)
    nS = int(sd.max()) + 1
    nm = V.shape[2]
    G = np.zeros((nS, nm, nm))
    np.add.at(G, sd, np.einsum("dkj,dkl->djl", V, V))
    for s in range(nS):
        dg = np.diag(G[s])
        kept = dg > 0.5
        # kept directions: orthonormal (V is stored fp32); dropped: zero
        assert np.allclose(G[s][np.ix_(kept, kept)], np.eye(kept.sum()), atol=1e-5)
        assert np.allclose(G[s][~kept], 0.0, atol=1e-12)
    # and the space still works as a correction
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal(2 * ddh.n_lambda), jnp.float32)
    q = np.asarray(coarse_apply(cs_o, ddh.params, v, ddh.n_own,
                                solve_m=40, solve_maxit=2, solve_tol=1e-6))
    assert np.isfinite(q).all()


def test_sparse_coarse_cache_roundtrip(tmp_path):
    """Iterative-method coarse spaces persist through the setup disk cache."""
    nx = 8
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(4))
    a = np.ones(fem.ndof)
    cache = str(tmp_path)

    ddh1 = DDH(omega, a, fem, nx=nx, ny=nx)
    ddh1.prepare(cache_dir=cache, want_io=False)
    cs1 = ddh1.make_coarse(n_dir=2, domains_per_super=1, ridge=RIDGE,
                           method="iterative")

    ddh2 = DDH(omega, a, fem, nx=nx, ny=nx)
    stats = ddh2.prepare(cache_dir=cache, want_io=False)
    assert stats["cache_hit"]
    from cuddhelmholtz_tpu.solvers.coarse import SparseCoarseSpace

    assert isinstance(ddh2.coarse_space, SparseCoarseSpace)
    np.testing.assert_array_equal(
        np.asarray(ddh2.coarse_space.Eb), np.asarray(cs1.Eb)
    )
    cs2 = ddh2.make_coarse(n_dir=2, domains_per_super=1, ridge=RIDGE,
                           method="iterative")
    assert cs2 is ddh2.coarse_space


def test_coarse_space_cache_roundtrip(tmp_path):
    """make_coarse results persist through the setup disk cache: a second
    DDH with the same config loads the coarse space from disk
    (bit-identical) and make_coarse with matching parameters returns it
    without rebuilding."""
    nx = 8
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(4))
    a = np.ones(fem.ndof)
    cache = str(tmp_path)

    ddh1 = DDH(omega, a, fem, nx=nx, ny=nx)
    ddh1.prepare(cache_dir=cache, want_io=False)
    cs1 = ddh1.make_coarse(n_dir=2, domains_per_super=1, ridge=RIDGE)

    ddh2 = DDH(omega, a, fem, nx=nx, ny=nx)
    stats = ddh2.prepare(cache_dir=cache, want_io=False)
    assert stats["cache_hit"]
    assert ddh2.coarse_space is not None
    np.testing.assert_array_equal(
        np.asarray(ddh2.coarse_space.Einv), np.asarray(cs1.Einv)
    )
    # matching parameters: returned without rebuilding (same object)
    cs2 = ddh2.make_coarse(n_dir=2, domains_per_super=1, ridge=RIDGE)
    assert cs2 is ddh2.coarse_space
    # different parameters: rebuilt
    cs3 = ddh2.make_coarse(n_dir=1, domains_per_super=1, ridge=RIDGE)
    assert cs3.Einv.shape[0] < cs1.Einv.shape[0]


def test_run_ddh_coarse_option():
    """The two-level correction is reachable through the example driver."""
    from cuddhelmholtz_tpu.examples.drivers import run_ddh

    r = run_ddh(nx=8, deg=3, m=20, maxit=100, tol=1e-4, transfer=True,
                coarse="multiplicative", coarse_n_dir=2,
                coarse_domains_per_super=1)
    assert r.success
    assert r.res_norm[-1] / r.res_norm[0] < 1e-4 * 1.01

    with pytest.raises(ValueError):
        run_ddh(nx=8, transfer=False, coarse="additive")
