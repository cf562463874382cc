"""Microbenchmark: the two-level coarse apply's inner-solver variants.

The coarse apply at skeleton resolution (nx=512/block-16: nc=294,912,
budget (20, 2, 3e-2)) runs ~21 inner GMRES steps per outer FGMRES matvec;
docs/PERF.md measured it ~22-25 ms -- all serialized small-kernel latency,
not FLOPs.  This times ``coarse_apply`` in isolation for each inner-solver
configuration (per-step Givens vs deferred least squares, CGS2 vs CGS1,
rolled vs unrolled) on perturbed fresh inputs so the tunnel cannot
short-circuit dispatch.

Run:  python docs/run_coarse_microbench.py [--nx 512] [--block 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=512)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--dps", type=int, default=1)
    ap.add_argument("--n-dir", type=int, default=4)
    ap.add_argument("--solve", default="20,2,3e-2")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cuddhelmholtz_tpu.examples.drivers import (
        _setup_scope, _want_io_maps, point_sources, wave_speed_coeff,
    )
    from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
    from cuddhelmholtz_tpu.ops.functional import linear_functional
    from cuddhelmholtz_tpu.ops.mass import apply_diag_inv_mass, make_diag_inv_mass_op
    from cuddhelmholtz_tpu.solvers.coarse import coarse_apply
    from cuddhelmholtz_tpu.solvers.ddh import DDH
    from cuddhelmholtz_tpu.spaces.h1 import H1Space
    from cuddhelmholtz_tpu.utils.basis import Basis

    nx = args.nx
    omega = 2 * np.pi * nx / 10
    mesh = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
    fem = H1Space(mesh, Basis(4))
    with _setup_scope():
        b_a = linear_functional(fem, wave_speed_coeff)
        mi = make_diag_inv_mass_op(fem)
        a_nodal = np.asarray(apply_diag_inv_mass(mi, b_a))
    ddh = DDH(omega, a_nodal, fem, nx=nx, ny=nx, block_size=args.block)
    ddh.prepare(want_io=_want_io_maps())
    sm, smx, stl = args.solve.split(",")
    sm, smx, stl = int(sm), int(smx), float(stl)
    ddh.make_coarse(
        n_dir=args.n_dir, domains_per_super=args.dps, method="iterative",
        solve_m=sm, solve_maxit=smx, solve_tol=stl,
    )
    cs, params, n_own = ddh.coarse_space, ddh.params, ddh.n_own
    n = 2 * ddh.size
    log(f"nc={2 * cs.nbr.shape[0] * cs.V.shape[2]} n_lambda={ddh.size}")

    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)

    variants = {
        "old_givens_cgs2": {"deferred": False, "unroll": False, "reorth": True},
        "deferred_cgs1": {"deferred": True, "unroll": False, "reorth": False},
        "deferred_cgs1_unroll": {"deferred": True, "unroll": True, "reorth": False},
    }
    out = {}
    for name, opts in variants.items():
        f = jax.jit(
            lambda cs, params, v, opts=opts: coarse_apply(
                cs, params, v, n_own, solve_m=sm, solve_maxit=smx,
                solve_tol=stl, solve_opts=opts,
            )
        )
        t0 = time.perf_counter()
        q = f(cs, params, v0)
        q.block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(args.reps):
            vi = v0 * (1.0 + 1e-6 * (i + 1))
            vi.block_until_ready()
            t0 = time.perf_counter()
            qi = f(cs, params, vi)
            float(jnp.sum(qi))  # scalar host sync
            times.append(time.perf_counter() - t0)
        out[name] = {
            "compile_s": compile_s,
            "ms_median": 1e3 * float(np.median(times)),
            "ms_min": 1e3 * float(np.min(times)),
            "q_norm": float(jnp.linalg.norm(q)),
        }
        log(name, out[name])
    print(json.dumps({"nx": nx, "block": args.block,
                      "solve": [sm, smx, stl], **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
