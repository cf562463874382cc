"""Frequency sweep runner (BASELINE config 5): scale omega and n together.

Runs the DDH-preconditioned solve over a list of nx values (omega =
2*pi*nx/10, the reference drivers' scaling) and reports one JSON record per
config: iterations, matvecs, time, and stencil-equivalent throughput.

Usage:  python -m cuddhelmholtz_tpu.examples.sweep [--transfer] [nx ...]

``--transfer`` precomputes the per-subdomain trace-transfer matrices (the
production configuration at production matvec counts; setup pays ~2*pf
wave-cycle columns once).
"""

from __future__ import annotations

import json
import sys

import numpy as np

from .drivers import run_ddh


def sweep(nx_list=(32, 64, 128), deg=3, **kwargs):
    records = []
    for nx in nx_list:
        res = run_ddh(nx=nx, deg=deg, **kwargs)
        nb = deg + 1
        ddh = res.extra["ddh"]
        applies = res.num_matvec * ddh.wh_maxit * ddh.nt * 2
        nnz = int(ddh.efem.sizes.astype(np.int64).sum()) * (2 * nb - 1) ** 2
        rec = {
            "nx": nx,
            "omega": res.extra["omega"],
            "ndof": res.extra["ndof"],
            "n_domains": res.extra["n_domains"],
            "nt": res.extra["nt"],
            "iters": res.num_iter,
            "matvecs": res.num_matvec,
            "success": res.success,
            "final_rel_res": float(res.res_norm[-1] / res.res_norm[0]),
            "seconds": res.seconds,
            "nnz_per_s": applies * nnz / res.seconds,
            "setup_seconds": res.extra.get("setup_seconds"),
            "precompute": res.extra.get("precompute", {}),
        }
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    return records


if __name__ == "__main__":
    args = sys.argv[1:]
    transfer = "--transfer" in args
    block = 16
    rest = []
    it = iter(a for a in args if a != "--transfer")
    for a in it:
        if a == "--block":
            block = int(next(it))
        else:
            rest.append(int(a))
    nxs = tuple(rest) or (32, 64, 128)
    out = sweep(nxs, transfer=transfer, block_size=block)
    print(json.dumps(out))
