"""Decompose the io-map (rhs+postprocess) cost of one DDH P application.

K-composed-loop timing (see run_refine_profile.py for the methodology) of
each io sub-piece at the composite flagship config (nx=128): _forcing,
the grouped einsums at each precision, _b1_scatter, _read_traces and
_scatter_solution -- to attribute the measured ~9 ms of io cost per
preconditioner application.

Run:  CUDDH_X64=1 python docs/run_io_profile.py
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
    from cuddhelmholtz_tpu.models.helmholtz import helmholtz_rhs
    from cuddhelmholtz_tpu.ops.functional import linear_functional
    from cuddhelmholtz_tpu.ops.mass import apply_diag_inv_mass, make_diag_inv_mass_op
    from cuddhelmholtz_tpu.ops.structured import GridH1Space
    from cuddhelmholtz_tpu.solvers import ddh as D
    from cuddhelmholtz_tpu.solvers.ddh import DDH
    from cuddhelmholtz_tpu.spaces.h1 import FaceSpace
    from cuddhelmholtz_tpu.utils.basis import Basis

    nx, deg = 128, 3
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
    fem = GridH1Space(mesh, Basis(deg + 1), nx, nx)
    with _setup_scope():
        b_a = linear_functional(fem, wave_speed_coeff)
        mi = make_diag_inv_mass_op(fem)
        a_nodal = np.asarray(apply_diag_inv_mass(mi, b_a))
        b = np.asarray(
            helmholtz_rhs(fem, lambda xy: point_sources(xy, omega), dtype=jnp.float64)
        )
    ddh = DDH(omega, a_nodal, fem, nx=nx, ny=nx, wh_maxit=5)
    ddh.prepare(want_io=_want_io_maps())
    params, io = ddh.params, ddh.io
    g_ndof, n_lambda, n_own = ddh.g_ndof, ddh.n_lambda, ddh.n_own
    f32 = jnp.asarray(b, jnp.float32)
    lam = jnp.asarray(
        np.random.default_rng(0).standard_normal(2 * ddh.size), jnp.float32
    )
    pf = params.Hf.shape[1]
    ndom, pad = params.gmask.shape
    log(f"ndom={ndom} pad={pad} pf={pf} n_lambda={n_lambda} g_ndof={g_ndof}")

    def k_loop_vec(f, K, proj):
        # f maps a global-sized vector to anything; proj maps it back to a
        # global-sized vector so the loop composes
        def body(i, v):
            w = proj(f(v))
            return w / jnp.maximum(jnp.float32(1e-30), jnp.max(jnp.abs(w)))

        return jax.jit(lambda v: lax.fori_loop(0, K, body, v))

    def measure(f, v, K, proj=lambda w: w, reps=5):
        g = k_loop_vec(f, K, proj)
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
    disp = measure(lambda v: v, f32, 0)
    res["dispatch_ms"] = 1e3 * disp
    K = 100

    def per(f, v, proj=lambda w: w, K=K):
        return 1e3 * (measure(f, v, K, proj) - disp) / K

    # 1. _forcing alone (forcing gather + weight)
    res["forcing_ms"] = per(
        lambda v: D._forcing(params, v, None, g_ndof)[0],
        f32,
        proj=lambda F: f32 * jnp.max(jnp.abs(F)),
    )

    # 2. full rhs at each precision
    for prec in ("highest", "default"):
        res[f"rhs_{prec}_ms"] = per(
            lambda v, p=prec: D.ddh_rhs_io(params, io, v, g_ndof, n_lambda, p),
            f32,
            proj=lambda y: f32 * jnp.max(jnp.abs(y)),
        )

    # 3. full postprocess at each precision (lam fixed, f varies)
    for prec in ("highest", "default"):
        res[f"post_{prec}_ms"] = per(
            lambda v, p=prec: D.ddh_postprocess_io(
                params, io, lam, v, g_ndof, n_own, p
            ),
            f32,
            proj=lambda y: f32 * jnp.max(jnp.abs(y[:g_ndof])),
        )

    # 4. _b1_scatter alone (input shaped (ndom, pf))
    upd = jnp.ones((ndom, pf), jnp.float32)
    res["b1_scatter_ms"] = per(
        lambda v: D._b1_scatter(params, v, v, n_lambda, jnp.float32),
        upd,
        proj=lambda y: upd * jnp.max(jnp.abs(y)),
    )

    # 5. _scatter_solution alone (input shaped (ndom, pad))
    uv = jnp.ones((ndom, pad), jnp.float32)
    res["scatter_solution_ms"] = per(
        lambda v: D._scatter_solution(params, v, v, g_ndof),
        uv,
        proj=lambda y: uv * jnp.max(jnp.abs(y[:g_ndof])),
    )

    # 6. _read_traces alone
    res["read_traces_ms"] = per(
        lambda v: D._read_traces(params, v, n_lambda, n_own)[0],
        lam,
        proj=lambda t: lam * jnp.max(jnp.abs(t)),
    )

    log(json.dumps(res, indent=2))
    print(json.dumps(res))
