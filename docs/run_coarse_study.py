"""Two-level vs one-level DDH at the high-frequency walls (VERDICT r04 #1).

Reproduces the r05 headline result -- the block-sparse iterative coarse
space at skeleton resolution (1 subdomain per superdomain, 4 plane-wave
directions) collapses the one-level iteration wall -- as a recorded
artifact: nx=512/block-16 (one-level wall: 88 restarts) and
nx=1024/block-32 (one-level: 67 restarts), one JSON line per case.

Run:  python docs/run_coarse_study.py [--nx 512] [--block 16] [--out f.jsonl]
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
    ap.add_argument("--m", type=int, default=20)
    ap.add_argument("--maxit", type=int, default=200)
    ap.add_argument("--dps", type=int, default=1)
    ap.add_argument("--n-dir", type=int, default=4)
    ap.add_argument("--solve", default="20,2,3e-2",
                    help="coarse inner solve: m,maxit,tol")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from cuddhelmholtz_tpu.examples.drivers import run_ddh

    sm, smx, stl = args.solve.split(",")
    solve = (int(sm), int(smx), float(stl))
    recs = []

    def go(label, **kw):
        t0 = time.perf_counter()
        try:
            r = run_ddh(nx=args.nx, block_size=args.block, m=args.m,
                        maxit=args.maxit, transfer=True, measure_warm=True,
                        **kw)
            rec = {
                "case": label, "nx": args.nx, "block": args.block,
                "restarts": int(r.num_iter), "matvecs": int(r.num_matvec),
                "success": bool(r.success),
                "warm_seconds": r.extra.get("warm_seconds"),
                "compile_seconds": r.extra.get("compile_seconds"),
                "final_rel_res": float(r.res_norm[-1] / r.res_norm[0]),
                "n_lambda": r.extra.get("n_lambda"),
                "n_domains": r.extra.get("n_domains"),
                "total_seconds": time.perf_counter() - t0,
            }
            if kw.get("coarse"):
                ddh = r.extra["ddh"]
                cs = ddh.coarse_space
                rec["coarse"] = {
                    "method": "iterative", "n_dir": args.n_dir,
                    "dps": args.dps, "solve": list(solve),
                    "nc": int(2 * cs.nbr.shape[0] * cs.V.shape[2]),
                }
        except Exception as e:
            rec = {"case": label, "nx": args.nx, "error": repr(e)[:300]}
        recs.append(rec)
        log(rec)
        print(json.dumps(rec), flush=True)

    if not args.skip_baseline:
        go("one_level")
    go("two_level_mult", coarse="multiplicative", coarse_method="iterative",
       coarse_n_dir=args.n_dir, coarse_domains_per_super=args.dps,
       coarse_solve=solve)
    if args.out:
        with open(args.out, "w") as f:
            for rec in recs:
                f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
