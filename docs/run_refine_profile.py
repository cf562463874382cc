"""Component-level timing of the composite 1e-6 refine solve (nx=128).

Reproduces the structured grid-native pipeline of
``run_helmholtz_ddh(refine=True)`` and attributes the per-outer-step cost.
Isolated jit calls through the axon tunnel carry ~30 ms of dispatch
latency (a bare 148k-norm "times" at 36 ms), so every component is timed
as K composed applications inside ONE jit (lax.fori_loop) and divided by
K; the K=0 variant of the same loop measures the dispatch floor to
subtract.

Run:  CUDDH_X64=1 python docs/run_refine_profile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CUDDH_X64", "1")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


if __name__ == "__main__":
    import jax
    from jax import lax
    import jax.numpy as jnp
    import numpy as np

    from cuddhelmholtz_tpu.examples.drivers import (
        _setup_scope, _want_io_maps, point_sources, wave_speed_coeff,
    )
    from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
    from cuddhelmholtz_tpu.models.helmholtz import (
        apply_helmholtz, helmholtz_rhs, make_helmholtz_op, project_coefficients,
    )
    from cuddhelmholtz_tpu.ops.functional import linear_functional
    from cuddhelmholtz_tpu.ops.mass import apply_diag_inv_mass, make_diag_inv_mass_op
    from cuddhelmholtz_tpu.ops.structured import GridH1Space
    from cuddhelmholtz_tpu.solvers.ddh import DDH
    from cuddhelmholtz_tpu.solvers.gmres import fgmres, gmres
    from cuddhelmholtz_tpu.spaces.h1 import FaceSpace
    from cuddhelmholtz_tpu.utils.basis import Basis

    nx, deg, m, tol = 128, 3, 20, 1e-6
    inner_m, inner_maxit = 20, 3
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
    fem = GridH1Space(mesh, Basis(deg + 1), nx, nx)
    fs = FaceSpace(fem, mesh.boundary_edges)
    with _setup_scope():
        a2, af = project_coefficients(fem, fs, wave_speed_coeff, dtype=jnp.float64)
        b_a = linear_functional(fem, wave_speed_coeff)
        mi = make_diag_inv_mass_op(fem)
        a_nodal = np.asarray(apply_diag_inv_mass(mi, b_a))
        b = np.asarray(
            helmholtz_rhs(fem, lambda xy: point_sources(xy, omega), dtype=jnp.float64)
        )
    op = make_helmholtz_op(omega, a2, af, fem, fs, dtype=jnp.float64)
    b = jnp.asarray(b)
    ddh = DDH(omega, a_nodal, fem, nx=nx, ny=nx, wh_maxit=5)
    ddh.prepare(want_io=_want_io_maps())

    op32 = make_helmholtz_op(
        omega, np.asarray(a2, np.float32), np.asarray(af, np.float32),
        fem, fs, dtype=jnp.float32,
    )
    matvec32 = lambda U: apply_helmholtz(op32, U, kron_precision="highest")
    matvec64 = lambda U: apply_helmholtz(op, U)
    igo = {"reorth": False, "unroll": True}

    def P(v):
        v32 = v.astype(jnp.float32)
        Y = ddh.rhs(v32)
        out = gmres(ddh.action, Y, m=inner_m, maxit=inner_maxit, tol=0.0, **igo)
        return ddh.postprocess(out.x, v32).astype(v.dtype)

    def P_nosolve(v):
        # rhs + postprocess only: the io-map cost of one P application
        v32 = v.astype(jnp.float32)
        Y = ddh.rhs(v32)
        return ddh.postprocess(Y, v32).astype(v.dtype)

    b32 = b.astype(jnp.float32)

    def k_loop(f, K):
        # K composed applications inside one jit; normalisation keeps the
        # iterates finite without adding host syncs
        def body(i, v):
            w = f(v)
            return w / jnp.maximum(jnp.float32(1e-30), jnp.max(jnp.abs(w)))

        return jax.jit(lambda v: lax.fori_loop(0, K, body, v))

    def measure(f, v, K, reps=5):
        g = k_loop(f, K)
        r = g(v)
        r.block_until_ready()
        ts = []
        for i in range(reps):
            vi = v * (1.0 + 1e-7 * (i + 1))
            vi.block_until_ready()
            t0 = time.perf_counter()
            float(jnp.sum(g(vi)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    res = {}
    # dispatch floor: K=0 loop (same jit/launch structure, no work)
    res["dispatch_ms"] = 1e3 * measure(lambda v: v, b32, 0)

    K = 100
    t_mv32 = measure(matvec32, b32, K)
    res["matvec32_ms"] = 1e3 * (t_mv32 - res["dispatch_ms"] / 1e3) / K
    t_mv64 = measure(matvec64, b, 20)
    res["matvec64_ms"] = 1e3 * (t_mv64 - res["dispatch_ms"] / 1e3) / 20

    # lambda action (one transfer matvec on the trace system)
    y0 = ddh.rhs(b32)
    t_act = measure(ddh.action, y0, 200)
    res["lambda_action_ms"] = 1e3 * (t_act - res["dispatch_ms"] / 1e3) / 200

    # io maps alone (rhs + postprocess), then the full P (3x20 budget)
    t_io = measure(P_nosolve, b32, 50)
    res["P_iomaps_ms"] = 1e3 * (t_io - res["dispatch_ms"] / 1e3) / 50
    t_P = measure(P, b32, 20)
    res["P_apply_ms"] = 1e3 * (t_P - res["dispatch_ms"] / 1e3) / 20
    res["P_lambda_solve_ms"] = res["P_apply_ms"] - res["P_iomaps_ms"]

    # outer-step remainder: time the inner fgmres at the driver's actual
    # step-1 tolerance (2e-5, the max() clamp) as the ground truth
    T_cap = None
    if ddh.use_transfer and ddh.route is None and ddh._T_u is not None:
        T_cap = ddh.T
    dstate = (ddh.params, T_cap, ddh.route, ddh.io)

    def _inner_fn(r, tl, st):
        old = (ddh.params, ddh._T_dev, ddh.route, ddh.io)
        ddh.params, ddh._T_dev, ddh.route, ddh.io = st
        try:
            return fgmres(matvec32, r, P, m=m, maxit=100, tol=tl, deferred=True)
        finally:
            ddh.params, ddh._T_dev, ddh.route, ddh.io = old

    _inner_jit = jax.jit(_inner_fn)
    tl1 = jnp.float32(2e-5)
    out = _inner_jit(b32, tl1, dstate)
    jax.block_until_ready(out.x)
    ts = []
    for i in range(3):
        bi = b32 * (1.0 + 1e-7 * (i + 1))
        bi.block_until_ready()
        t0 = time.perf_counter()
        oi = _inner_jit(bi, tl1, dstate)
        float(jnp.sum(oi.x))
        ts.append(time.perf_counter() - t0)
    res["inner_solve_s"] = float(np.median(ts))
    res["inner_restarts"] = int(out.num_iter)
    res["inner_matvecs"] = int(out.num_matvec)
    res["inner_ms_per_outer_step"] = 1e3 * res["inner_solve_s"] / max(
        1, int(out.num_matvec)
    )
    res["outer_step_budget_ms"] = res["P_apply_ms"] + res["matvec32_ms"]
    res["outer_ortho_etc_ms"] = (
        res["inner_ms_per_outer_step"] - res["outer_step_budget_ms"]
    )

    log(json.dumps(res, indent=2))
    print(json.dumps(res))
