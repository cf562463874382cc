"""End-to-end driver tests reproducing the reference example configs
(reduced sizes where the full config is too slow for CI)."""

import os

import numpy as np
import pytest

from cuddhelmholtz_tpu.examples.drivers import run_ddh, run_helmholtz, run_poisson
from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.spaces.ensemble import coordinate_bisection_labels


def test_poisson_reference_config(tmp_path):
    """The exact Poisson.cpp config: 15x15, deg 3, GMRES(20) tol 1e-6."""
    res = run_poisson(nx=15, deg=3, m=20, maxit=20, tol=1e-6, out_dir=str(tmp_path))
    assert res.success
    assert res.num_iter <= 20
    # boundary condition: u = g on x = +-1
    xy = res.coords
    right = np.abs(xy[:, 0] - 1) < 1e-12
    g_right = 1.0 - xy[right, 1] ** 2
    assert np.max(np.abs(res.solution[right] - g_right)) < 1e-6
    # output files in the reference binary format
    sol = np.fromfile(tmp_path / "poisson.0000")
    # xy.0000 is the (2, ndof) array in column-major order: x,y interleaved
    xyf = np.fromfile(tmp_path / "xy.0000").reshape(-1, 2)
    assert sol.shape[0] == res.solution.shape[0]
    assert np.allclose(sol, res.solution)
    assert np.allclose(xyf, res.coords)


def test_helmholtz_reduced_config(tmp_path):
    """Reduced Helmholtz.cpp config (nx=12): coupled solve converges and the
    residual history is dumped in the reference's text format
    (Helmholtz.cpp:165-171)."""
    res = run_helmholtz(nx=12, deg=3, m=200, maxit=100, tol=1e-6, out_dir=str(tmp_path))
    assert res.success
    assert res.extra["ndof"] == (12 * 3 + 1) ** 2
    n = res.extra["ndof"]
    U = res.solution[:n] + 1j * res.solution[n:]
    assert np.isfinite(U).all() and np.abs(U).max() > 0
    hist = np.loadtxt(tmp_path / "h_12_3.txt")  # columns: res_norm time
    hist = np.atleast_2d(hist)
    np.testing.assert_allclose(hist[:, 0], res.res_norm, rtol=1e-9)


def test_ddh_structured_reduced():
    """Reduced DDH.cpp config (nx=16, 16 subdomains)."""
    res = run_ddh(nx=16, deg=3, m=20, maxit=60, tol=1e-3)
    assert res.success
    assert res.extra["n_domains"] == 16
    hist = res.res_norm
    assert hist[-1] < 1e-3 * np.linalg.norm(hist[0]) * 10  # decreasing history
    assert np.isfinite(res.solution).all()


def test_ddh_unstructured_bisection():
    """DDH on the unstructured square via coordinate bisection -- a config
    the reference cannot run (BASELINE.json config 4)."""
    mesh = load_unstructured_square()
    labels, ndom = coordinate_bisection_labels(mesh, 4)
    res = run_ddh(nx=6, deg=3, m=20, maxit=60, tol=1e-3, mesh=mesh, element_labels=labels)
    assert res.extra["n_domains"] == ndom
    assert np.isfinite(res.solution).all()
    hist = res.res_norm
    assert hist[-1] < hist[0]


def test_run_config_dispatch():
    """BASELINE_CONFIGS run (downsized) through the run_config dispatcher.

    The solvers themselves are proven elsewhere (test_ddh_*, test_models);
    this checks the dispatcher + override plumbing, so the DDH runs use tiny
    budgets (wh_maxit=1, few restarts) and only sanity-check outputs.
    """
    import numpy as np

    from cuddhelmholtz_tpu.config import BASELINE_CONFIGS
    from cuddhelmholtz_tpu.examples.drivers import run_config

    by_name = {c.name: c for c in BASELINE_CONFIGS}
    r = run_config(by_name["poisson_structured"], nx=8)
    assert r.success
    r = run_config(by_name["ddh_structured"], nx=16, wh_maxit=1, maxit=3, tol=1e-3)
    assert np.isfinite(r.res_norm).all() and r.num_matvec > 0
    r = run_config(
        by_name["ddh_unstructured_square"], n_domains=4, wh_maxit=1, maxit=3
    )
    assert np.isfinite(r.res_norm).all() and r.num_matvec > 0


def test_helmholtz_ddh_composite_solve():
    """FGMRES + DDH preconditioning drives the TRUE coupled Helmholtz
    residual to 1e-6 (beyond the reference: its DDH example stops at the
    lambda system, its Helmholtz example stagnates unpreconditioned)."""
    from cuddhelmholtz_tpu.examples.drivers import run_helmholtz_ddh

    res = run_helmholtz_ddh(nx=8, deg=3, m=10, maxit=30, tol=1e-6,
                            inner_maxit=2, wh_maxit=2, transfer=True)
    assert res.success
    rel = res.res_norm[-1] / res.res_norm[0]
    assert rel < 1e-6 * 1.01
    # mixed-precision refinement path: the res_norm history is the TRUE
    # fp64 outer residual at refinement boundaries, and the driver records
    # the refinement structure and the warm/compile timing split
    assert res.extra["refine"] is True
    assert 1 <= res.extra["refine_steps"] <= 6
    assert len(res.res_norm) == res.extra["refine_steps"] + 1
    assert "warm_seconds" in res.extra and "compile_seconds" in res.extra
    assert len(res.extra["inner_histories"]) == res.extra["refine_steps"]


def test_helmholtz_ddh_stagnation_contract():
    """Forcing an unreachable tolerance (below the fp32 inner-solve floor)
    trips the refinement stagnation guard: the record must say so explicitly
    (success=False, stagnated=True) with a well-formed history, instead of
    failing silently inside bench extras (VERDICT r04 #8)."""
    from cuddhelmholtz_tpu.examples.drivers import run_helmholtz_ddh

    res = run_helmholtz_ddh(nx=8, deg=3, m=10, maxit=30, tol=1e-16,
                            inner_maxit=2, wh_maxit=2, transfer=True,
                            measure_warm=False)
    assert not res.success
    assert res.extra["stagnated"] is True
    # the history stays auditable: one TRUE fp64 residual per refine step
    assert len(res.res_norm) == res.extra["refine_steps"] + 1
    assert len(res.extra["inner_histories"]) == res.extra["refine_steps"]
    # it stagnated near the fp32 floor, not at the initial residual
    assert res.res_norm[-1] / res.res_norm[0] < 1e-4


def test_run_config_helmholtz_ddh_dispatch():
    """The composite solve is reachable through the named-config CLI path."""
    from cuddhelmholtz_tpu.config import BASELINE_CONFIGS
    from cuddhelmholtz_tpu.examples.drivers import run_config

    by_name = {c.name: c for c in BASELINE_CONFIGS}
    res = run_config(by_name["helmholtz_ddh_1e6"], nx=8, m=10, maxit=30)
    assert res.success


def test_helmholtz_ddh_unstructured_cross_validation():
    """The BASELINE target metric: DDH-preconditioned FGMRES to 1e-6 on the
    unstructured square.  Cross-validated against the generic-path
    unpreconditioned solve of the SAME discrete system — the two solutions
    must agree to solver tolerance."""
    from cuddhelmholtz_tpu.config import BASELINE_CONFIGS
    from cuddhelmholtz_tpu.examples.drivers import run_config, run_helmholtz

    by_name = {c.name: c for c in BASELINE_CONFIGS}
    cfg = by_name["helmholtz_ddh_unstructured_1e6"]
    res = run_config(cfg, m=15, maxit=40)
    assert res.success, np.asarray(res.res_norm)
    rel = res.res_norm[-1] / res.res_norm[0]
    assert rel < 1e-6 * 1.01

    # deterministic oracle: dense direct solve of the SAME discrete operator
    # (unpreconditioned restarted GMRES stagnates on Helmholtz, so it cannot
    # provide a 1e-8 reference)
    import jax.numpy as jnp

    from cuddhelmholtz_tpu.models.helmholtz import (
        apply_helmholtz,
        helmholtz_rhs,
        make_helmholtz_op,
        project_coefficients,
    )
    from cuddhelmholtz_tpu.examples.drivers import point_sources, wave_speed_coeff
    from cuddhelmholtz_tpu.spaces.h1 import FaceSpace, H1Space
    from cuddhelmholtz_tpu.utils.basis import Basis

    mesh = load_unstructured_square()
    fem = H1Space(mesh, Basis(cfg.deg + 1))
    fs = FaceSpace(fem, mesh.boundary_edges)
    omega = cfg.omega
    a2, af = project_coefficients(fem, fs, wave_speed_coeff, dtype=jnp.float64)
    op = make_helmholtz_op(omega, a2, af, fem, fs, dtype=jnp.float64)
    b = np.asarray(
        helmholtz_rhs(fem, lambda xy: point_sources(xy, omega), dtype=jnp.float64)
    )
    n2 = 2 * fem.ndof
    import jax

    cols = jax.vmap(lambda e: apply_helmholtz(op, e))(jnp.eye(n2))
    A = np.asarray(cols).T
    x_direct = np.linalg.solve(A, b)
    err = np.linalg.norm(res.solution - x_direct) / np.linalg.norm(x_direct)
    assert err < 1e-5, err
    # record the target metric: iters-to-1e-6
    assert res.num_iter < 40


def test_ddh_multi_source_batched(tmp_path):
    """Batched multi-RHS substructured solve (TPU-native capability with no
    reference analog): every source converges, lane trajectories match solo
    solves of the same forcing."""
    import jax.numpy as jnp

    from cuddhelmholtz_tpu.examples.drivers import run_ddh_multi_source
    from cuddhelmholtz_tpu.models.helmholtz import helmholtz_rhs
    from cuddhelmholtz_tpu.solvers.gmres import gmres

    res = run_ddh_multi_source(
        nx=8, deg=3, m=20, maxit=60, tol=1e-3, n_sources=2, transfer=False,
        out_dir=str(tmp_path), method="vmap",
    )
    assert res.success
    assert res.solution.shape[0] == 2
    assert len(res.extra["histories"]) == 2
    # lane 0 matches a solo solve of the same ring source
    ddh = res.extra["ddh"]
    fem_coords = res.coords
    omega = res.extra["omega"]
    s = omega * omega

    def f(xy):
        r = (xy[..., 0] - 0.5) ** 2 + xy[..., 1] ** 2  # k=0 ring source
        return s / np.pi * jnp.exp(-s * r)

    from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
    from cuddhelmholtz_tpu.spaces.h1 import H1Space
    from cuddhelmholtz_tpu.utils.basis import Basis

    fem = H1Space(Mesh2D.uniform_rect(8, -1, 1, 8, -1, 1), Basis(4))
    b0 = helmholtz_rhs(fem, f)
    Y = ddh.rhs(b0)
    solo = gmres(ddh.action, Y, m=20, maxit=60, tol=1e-3)
    U0 = np.asarray(ddh.postprocess(solo.x, b0))
    assert int(solo.num_matvec) == res.extra["per_source_matvecs"][0]
    rel = np.linalg.norm(res.solution[0] - U0) / np.linalg.norm(U0)
    assert rel < 1e-5, rel
    # per-source artifacts written
    assert (tmp_path / "ddh_src00.0000").exists()
    assert (tmp_path / "ddh_src01_8_3.txt").exists()


def test_ddh_multi_source_block_converges_per_lane():
    """Block-Krylov multi-source (the default production path): every lane's
    TRUE residual meets the tolerance, solutions match the per-lane vmap
    solve, and the shared space converges in no more restarts than the
    slowest lock-step lane."""
    from cuddhelmholtz_tpu.examples.drivers import run_ddh_multi_source

    kw = dict(nx=8, deg=3, m=20, maxit=60, tol=1e-3, n_sources=3,
              transfer=False)
    blk = run_ddh_multi_source(method="block", **kw)
    ref = run_ddh_multi_source(method="vmap", **kw)
    assert blk.success and ref.success
    ddh = blk.extra["ddh"]
    import jax.numpy as jnp

    for k in range(3):
        # verify per-lane convergence on the true lambda-system residual
        hist = blk.extra["histories"][k]
        assert hist[-1] <= 1e-3 * hist[0] * (1 + 1e-6), (k, hist)
        rel = np.linalg.norm(blk.solution[k] - ref.solution[k]) / np.linalg.norm(
            ref.solution[k]
        )
        assert rel < 5e-3, (k, rel)
    # shared m*K space per restart: never more restarts than the slowest
    # lock-step lane (usually far fewer)
    assert blk.num_iter <= max(ref.extra["per_source_restarts"])


def test_permuted_kron_matvec32_matches_generic():
    """The refinement inner solves' structured fast path (kron operator on
    grid numbering + permutation gathers) computes the same coupled
    Helmholtz action as the generic element-batched fp32 operator."""
    import jax.numpy as jnp

    from cuddhelmholtz_tpu.examples.drivers import _make_matvec32, wave_speed_coeff
    from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
    from cuddhelmholtz_tpu.models.helmholtz import (
        apply_helmholtz,
        make_helmholtz_op,
        project_coefficients,
    )
    from cuddhelmholtz_tpu.spaces.h1 import FaceSpace, H1Space
    from cuddhelmholtz_tpu.utils.basis import Basis

    nx, deg = 12, 3
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(deg + 1))
    fs = FaceSpace(fem, mesh.boundary_edges)
    a2, af = project_coefficients(fem, fs, wave_speed_coeff, dtype=jnp.float64)
    op = make_helmholtz_op(
        omega, np.asarray(a2, np.float32), np.asarray(af, np.float32),
        fem, fs, dtype=jnp.float32,
    )
    mv_fast = _make_matvec32(omega, a2, af, fem, fs, mesh, nx)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal(2 * fem.ndof), jnp.float32)
    y0 = np.asarray(apply_helmholtz(op, U))
    y1 = np.asarray(mv_fast(U))
    err = np.linalg.norm(y1 - y0) / np.linalg.norm(y0)
    assert err < 1e-4, err
