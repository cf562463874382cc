"""GMRES tests (reference oracle: ``tests/gmres.cpp``).

Manufactured solution with a nonsymmetric tridiagonal Toeplitz operator:
y = A x_rand, solve A x = y with GMRES(5), maxit 100, rel tol 1e-10.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.solvers.gmres import gmres


def toeplitz_matvec(x):
    """Nonsymmetric tridiagonal Toeplitz: diag -3, sub 1.0, super 1.5."""
    y = -3.0 * x
    y = y.at[1:].add(1.0 * x[:-1])
    y = y.at[:-1].add(1.5 * x[1:])
    return y


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-10), (jnp.float32, 1e-5)])
def test_gmres_manufactured(dtype, tol):
    n = 512
    rng = np.random.default_rng(42)
    x_true = jnp.asarray(rng.standard_normal(n), dtype=dtype)
    b = toeplitz_matvec(x_true)
    out = gmres(toeplitz_matvec, b, m=5, maxit=100, tol=tol)
    assert bool(out.success)
    res = np.linalg.norm(toeplitz_matvec(out.x) - b) / np.linalg.norm(b)
    assert res < tol * 1.01


def test_gmres_exact_in_n_steps():
    """Full GMRES(n) converges in one restart for a small dense system."""
    n = 24
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((n, n)) + 4.0 * np.eye(n))
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    out = gmres(lambda v: A @ v, b, m=n, maxit=2, tol=1e-12)
    assert bool(out.success)
    assert np.linalg.norm(out.x - x_true) < 1e-8


def test_gmres_preconditioned():
    """Jacobi-preconditioned solve of a scaled SPD system."""
    n = 200
    rng = np.random.default_rng(7)
    d = jnp.asarray(10.0 ** rng.uniform(0, 2, n))
    matvec = lambda v: d * v + 0.1 * toeplitz_matvec(v)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = matvec(x_true)
    pre = lambda v: v / d
    out_p = gmres(matvec, b, m=30, maxit=50, tol=1e-10, precond=pre)
    assert bool(out_p.success)
    assert np.linalg.norm(out_p.x - x_true) / np.linalg.norm(x_true) < 1e-7


def test_gmres_zero_initial_residual():
    n = 50
    b = jnp.zeros(n).at[0].set(1.0)
    x0 = b / 2.0
    out = gmres(lambda v: 2.0 * v, b, x0, m=5, maxit=10, tol=1e-12)
    assert bool(out.success)
    assert int(out.num_iter) == 0
    assert int(out.num_matvec) == 1


def test_gmres_history_monotone_tail():
    n = 300
    rng = np.random.default_rng(1)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = toeplitz_matvec(x_true)
    out = gmres(toeplitz_matvec, b, m=10, maxit=60, tol=1e-10)
    hist = np.asarray(out.res_norm)
    k = int(out.n_hist)
    assert np.isfinite(hist[:k]).all()
    assert np.isnan(hist[k:]).all()
    assert hist[k - 1] < 1e-10 * np.linalg.norm(np.asarray(b)) * 1.01


def test_gmres_jit_compatible():
    n = 128
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def solve(b):
        return gmres(toeplitz_matvec, b, m=8, maxit=50, tol=1e-9)

    out = solve(b)
    assert bool(out.success)


def test_gmres_host_matches_jitted():
    from cuddhelmholtz_tpu.solvers.gmres import gmres_host

    n = 400
    rng = np.random.default_rng(11)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = toeplitz_matvec(x_true)
    out = gmres(toeplitz_matvec, b, m=8, maxit=60, tol=1e-10)
    out_h, times = gmres_host(toeplitz_matvec, b, m=8, maxit=60, tol=1e-10)
    assert bool(out_h.success)
    assert int(out_h.num_iter) == int(out.num_iter)
    h1 = np.asarray(out.res_norm)[: int(out.n_hist)]
    h2 = np.asarray(out_h.res_norm)[: int(out_h.n_hist)]
    assert np.allclose(h1, h2, rtol=1e-10)
    assert len(times) == int(out_h.n_hist)


def test_gmres_host_wall_clock_cutoff():
    from cuddhelmholtz_tpu.solvers.gmres import gmres_host

    n = 400
    rng = np.random.default_rng(12)
    b = jnp.asarray(rng.standard_normal(n))
    out_h, times = gmres_host(toeplitz_matvec, b, m=2, maxit=10_000, tol=1e-30,
                              max_seconds=0.05)
    assert not bool(out_h.success)
    assert int(out_h.num_iter) < 10_000


def test_gmres_single_pass_cgs():
    """reorth=False (single-pass CGS, the reference's traffic profile) still
    solves the manufactured Toeplitz system."""
    import jax.numpy as jnp
    import numpy as np

    from cuddhelmholtz_tpu.solvers.gmres import gmres

    n = 512
    rng = np.random.default_rng(7)
    x_true = jnp.asarray(rng.standard_normal(n))

    def matvec(v):
        return 2.0 * v - 0.4 * jnp.roll(v, 1) + 0.3 * jnp.roll(v, -1)

    b = matvec(x_true)
    out = gmres(matvec, b, m=5, maxit=100, tol=1e-10, reorth=False)
    assert bool(out.success)
    err = float(jnp.linalg.norm(out.x - x_true) / jnp.linalg.norm(x_true))
    assert err < 1e-8


def test_gmres_unrolled_matches_loop():
    """unroll=True (static-k sliced orthogonalisation) reproduces the looped
    trajectory on the Toeplitz system."""
    import jax.numpy as jnp
    import numpy as np

    from cuddhelmholtz_tpu.solvers.gmres import gmres

    n = 512
    rng = np.random.default_rng(8)
    x_true = jnp.asarray(rng.standard_normal(n))

    def matvec(v):
        return 2.0 * v - 0.4 * jnp.roll(v, 1) + 0.3 * jnp.roll(v, -1)

    b = matvec(x_true)
    out_l = gmres(matvec, b, m=6, maxit=40, tol=1e-10)
    out_u = gmres(matvec, b, m=6, maxit=40, tol=1e-10, unroll=True)
    assert bool(out_u.success)
    assert int(out_u.num_iter) == int(out_l.num_iter)
    h_l = np.asarray(out_l.res_norm)[: int(out_l.n_hist)]
    h_u = np.asarray(out_u.res_norm)[: int(out_u.n_hist)]
    assert np.allclose(h_l, h_u, rtol=1e-6)


def test_checkpoint_resume(tmp_path):
    """Saving the iterate mid-solve and resuming via x0 continues the solve
    (aux subsystem beyond the reference, SURVEY.md section 5)."""
    import jax.numpy as jnp
    import numpy as np

    from cuddhelmholtz_tpu.solvers.gmres import gmres
    from cuddhelmholtz_tpu.utils.checkpoint import (
        load_solver_state,
        save_solver_state,
    )

    n = 512
    rng = np.random.default_rng(9)
    x_true = jnp.asarray(rng.standard_normal(n))

    def matvec(v):
        return 2.0 * v - 0.4 * jnp.roll(v, 1) + 0.3 * jnp.roll(v, -1)

    b = matvec(x_true)
    partial = gmres(matvec, b, m=5, maxit=3, tol=1e-12)
    assert not bool(partial.success)
    path = str(tmp_path / "ckpt.npz")
    save_solver_state(
        path, partial.x, res_norm=partial.res_norm, omega=1.5, tag=7
    )
    state = load_solver_state(path)
    assert float(state["omega"]) == 1.5 and int(state["tag"]) == 7

    resumed = gmres(matvec, b, x0=jnp.asarray(state["x"]), m=5, maxit=100, tol=1e-10)
    assert bool(resumed.success)
    err = float(jnp.linalg.norm(resumed.x - x_true) / jnp.linalg.norm(x_true))
    assert err < 1e-8
    # resume starts from the checkpointed residual level
    h0 = float(np.asarray(resumed.res_norm)[0])
    hp = float(np.asarray(partial.res_norm)[int(partial.n_hist) - 1])
    assert abs(h0 - hp) < 1e-5 * max(1.0, hp)


def test_gmres_restart_budget_matches_host():
    """Non-converged gmres and gmres_host run the same maxit-1 restarts
    (the reference's `for (it = 1; it < maxit; ++it)`, gmres.cpp:146)."""
    from cuddhelmholtz_tpu.solvers.gmres import gmres_host

    n = 400
    rng = np.random.default_rng(13)
    b = jnp.asarray(rng.standard_normal(n))
    out = gmres(toeplitz_matvec, b, m=2, maxit=5, tol=1e-30)
    out_h, _ = gmres_host(toeplitz_matvec, b, m=2, maxit=5, tol=1e-30)
    assert not bool(out.success) and not bool(out_h.success)
    assert int(out.num_iter) == 4
    assert int(out_h.num_iter) == 4
    assert int(out.num_matvec) == int(out_h.num_matvec)


def test_gmres_zero_rhs_succeeds_immediately():
    """b = 0 (tol*||b|| = 0): both entry points succeed with x = 0 and no
    restarts instead of spinning to the iteration cap."""
    from cuddhelmholtz_tpu.solvers.gmres import gmres_host

    b = jnp.zeros(64)
    out = gmres(toeplitz_matvec, b, m=4, maxit=8, tol=1e-10)
    assert bool(out.success) and int(out.num_iter) == 0
    assert np.all(np.asarray(out.x) == 0.0)
    out_h, _ = gmres_host(toeplitz_matvec, b, m=4, maxit=8, tol=1e-10)
    assert bool(out_h.success) and int(out_h.num_iter) == 0


def test_lgmres_k0_matches_gmres():
    """lgmres with k=0 is plain restarted GMRES, trajectory-exact."""
    from cuddhelmholtz_tpu.solvers.gmres import lgmres

    n = 400
    rng = np.random.default_rng(21)
    b = jnp.asarray(rng.standard_normal(n))
    out_g = gmres(toeplitz_matvec, b, m=8, maxit=30, tol=1e-10)
    out_l = lgmres(toeplitz_matvec, b, m=8, k=0, maxit=30, tol=1e-10)
    h_g = np.asarray(out_g.res_norm)[: int(out_g.n_hist)]
    h_l = np.asarray(out_l.res_norm)[: int(out_l.n_hist)]
    assert int(out_l.num_iter) == int(out_g.num_iter)
    assert np.allclose(h_g, h_l, rtol=1e-12)


def test_lgmres_breaks_restart_stagnation():
    """On an indefinite shifted Laplacian where restarted GMRES stagnates,
    LGMRES(m, k) beats GMRES(m+k) by orders of magnitude at the same
    per-restart matvec budget (Baker/Jessup/Manteuffel behaviour)."""
    from cuddhelmholtz_tpu.solvers.gmres import lgmres

    n = 400
    rng = np.random.default_rng(22)

    def mv(x):
        y = (2.0 - 0.8) * x
        y = y.at[1:].add(-x[:-1])
        return y.at[:-1].add(-x[1:])

    x_true = jnp.asarray(rng.standard_normal(n))
    b = mv(x_true)
    out_g = gmres(mv, b, m=11, maxit=200, tol=1e-8)
    out_l = lgmres(mv, b, m=8, k=3, maxit=200, tol=1e-8)
    assert int(out_l.num_matvec) <= int(out_g.num_matvec)
    h_g = np.asarray(out_g.res_norm)[: int(out_g.n_hist)]
    h_l = np.asarray(out_l.res_norm)[: int(out_l.n_hist)]
    assert h_l[-1] < 1e-2 * h_g[-1]
    err = float(jnp.linalg.norm(out_l.x - x_true) / jnp.linalg.norm(x_true))
    assert err < 1e-3


def test_fgmres_fixed_precond_matches_right_preconditioning():
    """With a FIXED diagonal preconditioner FGMRES solves the system to the
    same tolerance as plain GMRES (flexible reduces to right-preconditioned)."""
    from cuddhelmholtz_tpu.solvers.gmres import fgmres

    n = 200
    rng = np.random.default_rng(31)
    d = jnp.asarray(10.0 ** rng.uniform(0, 2, n))
    matvec = lambda v: d * v + 0.1 * toeplitz_matvec(v)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = matvec(x_true)
    out = fgmres(matvec, b, lambda v: v / d, m=30, maxit=50, tol=1e-10)
    assert bool(out.success)
    # success is measured on the TRUE residual (right preconditioning)
    res = np.linalg.norm(np.asarray(matvec(out.x) - b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-10 * 1.01
    assert np.linalg.norm(out.x - x_true) / np.linalg.norm(x_true) < 1e-7


def test_fgmres_with_inner_krylov_precond():
    """An inner GMRES as the (varying) preconditioner: the classic FGMRES
    use case; plain gmres(precond=...) would be incorrect here."""
    from cuddhelmholtz_tpu.solvers.gmres import fgmres

    n = 300
    rng = np.random.default_rng(32)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = toeplitz_matvec(x_true)

    def inner(v):
        return gmres(toeplitz_matvec, v, m=4, maxit=2, tol=0.0).x

    out = fgmres(toeplitz_matvec, b, inner, m=6, maxit=20, tol=1e-10)
    assert bool(out.success)
    assert int(out.num_iter) <= 4  # far fewer restarts than unpreconditioned
    assert np.linalg.norm(out.x - x_true) / np.linalg.norm(x_true) < 1e-8


def test_block_gmres_manufactured():
    """Block GMRES on K manufactured rhs's of the Toeplitz oracle: every
    source converges to its per-source tolerance on the TRUE residual, and
    the shared m*K space never needs more restarts than GMRES(m) alone
    (the big wins appear on operators with outlier spectra, e.g. the DDH
    lambda systems -- block Krylov deflates up to K-1 outliers per step;
    a normal Toeplitz operator with random rhs's is the neutral case)."""
    from cuddhelmholtz_tpu.solvers.gmres import block_gmres

    n, K = 512, 4
    rng = np.random.default_rng(7)
    X_true = jnp.asarray(rng.standard_normal((K, n)))
    mv = jax.vmap(toeplitz_matvec)
    B = mv(X_true)
    out = jax.jit(
        lambda B: block_gmres(mv, B, m=5, maxit=100, tol=1e-8)
    )(B)
    assert bool(np.all(np.asarray(out.success)))
    R = np.asarray(B - mv(out.x))
    rel = np.linalg.norm(R, axis=1) / np.linalg.norm(np.asarray(B), axis=1)
    assert rel.max() < 1e-8 * 1.01, rel
    solo = gmres(toeplitz_matvec, B[0], m=5, maxit=100, tol=1e-8)
    assert int(out.num_iter) <= int(solo.num_iter)
    # matvec accounting: K per block step (+K initial, +K final per restart)
    assert int(out.num_matvec) % K == 0
    # history: per-source columns, first row = initial residual norms
    h0 = np.asarray(out.res_norm[0])
    np.testing.assert_allclose(
        h0, np.linalg.norm(np.asarray(B), axis=1), rtol=1e-6
    )


def test_block_gmres_survives_converged_lane():
    """A lane whose rhs makes it converge almost immediately (rank-deficient
    residual blocks) must not poison the others: the eigh-whitened block QR
    clips near-null directions instead of NaN-ing like plain CholQR."""
    from cuddhelmholtz_tpu.solvers.gmres import block_gmres

    n = 256
    rng = np.random.default_rng(5)
    mv = jax.vmap(toeplitz_matvec)
    # lane 0: trivial scaled basis vector (converges in ~1 restart);
    # lane 1: duplicate of lane 2 (exactly dependent block columns);
    # lane 2: generic
    b2 = toeplitz_matvec(jnp.asarray(rng.standard_normal(n)))
    B = jnp.stack([1e3 * jnp.zeros(n).at[0].set(1.0), b2, b2])
    out = block_gmres(mv, B, m=5, maxit=100, tol=1e-8)
    assert bool(np.all(np.asarray(out.success)))
    R = np.asarray(B - mv(out.x))
    rel = np.linalg.norm(R, axis=1) / np.linalg.norm(np.asarray(B), axis=1)
    assert np.all(np.isfinite(np.asarray(out.x)))
    assert rel.max() < 1e-8 * 1.01, rel


def test_gmres_deferred_matches_standard():
    """gmres(deferred=True) — per-restart normal-equations LS instead of
    per-step Givens — converges to the same quality with the same restart
    count on the Toeplitz oracle, in all ortho variants."""
    from cuddhelmholtz_tpu.solvers.gmres import gmres as _g

    n = 512
    rng = np.random.default_rng(42)
    b = toeplitz_matvec(jnp.asarray(rng.standard_normal(n)))
    std = _g(toeplitz_matvec, b, m=20, maxit=50, tol=1e-8)
    assert bool(std.success)
    for kw in ({"deferred": True},
               {"deferred": True, "unroll": True, "reorth": False}):
        o = _g(toeplitz_matvec, b, m=20, maxit=50, tol=1e-8, **kw)
        assert bool(o.success), kw
        res = float(
            jnp.linalg.norm(b - toeplitz_matvec(o.x)) / jnp.linalg.norm(b)
        )
        assert res < 1e-8 * 1.01, (kw, res)
        assert int(o.num_iter) == int(std.num_iter), kw


def test_fgmres_deferred_matches_standard():
    """deferred=True (per-restart normal-equations LS, no per-step Givens)
    reaches the same solution quality as the standard path and agrees on
    restart counts when exits land on restart boundaries."""
    from cuddhelmholtz_tpu.solvers.gmres import fgmres

    n = 300
    rng = np.random.default_rng(32)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = toeplitz_matvec(x_true)

    def inner(v):
        return gmres(toeplitz_matvec, v, m=4, maxit=2, tol=0.0).x

    std = fgmres(toeplitz_matvec, b, inner, m=6, maxit=20, tol=1e-8)
    dfr = fgmres(toeplitz_matvec, b, inner, m=6, maxit=20, tol=1e-8,
                 deferred=True)
    assert bool(dfr.success)
    res = np.linalg.norm(toeplitz_matvec(dfr.x) - b) / np.linalg.norm(b)
    assert res < 1e-8 * 1.01
    # deferred runs full restarts: restart count can only match or beat the
    # standard path's (its space per restart is never truncated early)
    assert int(dfr.num_iter) <= int(std.num_iter)


def test_gmres_vmapped_matches_solo():
    """``jax.vmap(gmres)`` (the multi-RHS batched solve used by
    run_ddh_multi_source) keeps per-lane trajectories: each right-hand side
    gets its own Krylov space, early exit, matvec count, and residual
    history, identical to solving it alone."""
    n, K = 512, 3
    rng = np.random.default_rng(11)
    # different difficulty per lane so early-exit points differ
    # (measured solo matvec counts: 56 / 38 / 46)
    bs = jnp.stack(
        [
            toeplitz_matvec(jnp.asarray(rng.standard_normal(n))),
            1e3 * toeplitz_matvec(jnp.zeros(n).at[0].set(1.0)),
            toeplitz_matvec(jnp.asarray(np.sin(np.linspace(0, np.pi, n)))),
        ]
    )
    solve = lambda b: gmres(toeplitz_matvec, b, m=7, maxit=100, tol=1e-10)
    outs = jax.jit(jax.vmap(solve))(bs)
    assert bool(np.all(np.asarray(outs.success)))
    nmv = np.asarray(outs.num_matvec)
    for k in range(K):
        solo = solve(bs[k])
        assert int(solo.num_matvec) == int(nmv[k])
        assert int(solo.n_hist) == int(outs.n_hist[k])
        np.testing.assert_allclose(
            np.asarray(outs.x[k]), np.asarray(solo.x), rtol=1e-6, atol=1e-10
        )
        h_b = np.asarray(outs.res_norm[k])[: int(outs.n_hist[k])]
        h_s = np.asarray(solo.res_norm)[: int(solo.n_hist)]
        np.testing.assert_allclose(h_b, h_s, rtol=1e-6)
    assert len(set(nmv.tolist())) > 1  # lanes genuinely exited at different points
