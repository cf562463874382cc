"""Sweep the composite solve's inner-preconditioner budget (VERDICT r04 #5).

The mixed-precision refinement driver (`run_helmholtz_ddh`) applies one
bounded inner DDH solve per outer FGMRES step: ``inner_maxit`` lambda-GMRES
restart budget at restart length ``inner_m``.  r04 hard-coded 3x20 without
ever measuring the outer/inner matvec trade; this sweep runs the matrix
{inner_maxit} x {inner_m} at the two recorded composite configs and prints
one JSON line per cell (warm seconds, refine steps, outer restarts/matvecs,
success) so PERF.md can record the Pareto point.

Run (x64 process required):
  CUDDH_X64=1 python docs/run_inner_sweep.py [--config helmholtz_ddh_1e6]
      [--inner-maxit 1,2,3,5] [--inner-m 10,20,40] [--out sweep.jsonl]

Repeat runs hit both the DDH setup cache and the persistent jit cache, so a
full matrix costs one compile per (inner_m, inner_maxit) shape the first
time and is compile-free afterwards.
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
    ap.add_argument("--config", default="helmholtz_ddh_1e6",
                    choices=["helmholtz_ddh_1e6", "helmholtz_ddh_unstructured_1e6"])
    ap.add_argument("--inner-maxit", default="1,2,3,5")
    ap.add_argument("--inner-m", default="10,20,40")
    ap.add_argument("--fast-inner", action="store_true",
                    help="inner lambda-GMRES with reorth=False, unroll=True "
                         "(the tiny-op/HBM savings measured for block_gmres)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from cuddhelmholtz_tpu.examples.drivers import run_helmholtz_ddh
    from cuddhelmholtz_tpu.mesh.io import load_unstructured_square

    unstructured = args.config == "helmholtz_ddh_unstructured_1e6"
    mesh = load_unstructured_square() if unstructured else None
    base = dict(nx=8 if unstructured else 128, deg=3, m=20, maxit=100,
                tol=1e-6, mesh=mesh, n_domains=8 if unstructured else None,
                measure_warm=True)
    if args.fast_inner:
        base["inner_gmres_opts"] = {"reorth": False, "unroll": True}

    recs = []
    for mi in [int(s) for s in args.inner_maxit.split(",")]:
        for im in [int(s) for s in args.inner_m.split(",")]:
            t0 = time.perf_counter()
            try:
                r = run_helmholtz_ddh(inner_maxit=mi, inner_m=im, **base)
                rec = {
                    "config": args.config,
                    "inner_maxit": mi,
                    "inner_m": im,
                    "fast_inner": bool(args.fast_inner),
                    "inner_matvec_budget": (mi - 1) * im,
                    "warm_seconds": r.extra.get("warm_seconds"),
                    "compile_seconds": r.extra.get("compile_seconds"),
                    "refine_steps": r.extra.get("refine_steps"),
                    "outer_restarts": int(r.num_iter),
                    "outer_matvecs": int(r.num_matvec),
                    "success": bool(r.success),
                    "stagnated": r.extra.get("stagnated"),
                    "final_rel_res": float(r.res_norm[-1] / r.res_norm[0]),
                    "total_seconds": time.perf_counter() - t0,
                }
            except Exception as e:  # record the failure, keep sweeping
                rec = {"config": args.config, "inner_maxit": mi, "inner_m": im,
                       "error": repr(e)[:200]}
            recs.append(rec)
            log(f"[{mi}x{im}] {rec}")
            print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for rec in recs:
                f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
