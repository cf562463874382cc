"""BASELINE config 2 driven to its reference budget.

Runs the unpreconditioned coupled-Helmholtz flagship exactly as the
reference driver ships it (``examples/Helmholtz.cpp:101-109``): 128x128
elements, deg 3, GMRES(200), maxit 10,000, tol 1e-6, wall budget 2 h —
via ``gmres_host(max_seconds=7200)``.  Writes the complete per-restart
residual/time history in the reference's text format to
``docs/artifacts/h_128_3.txt`` and a JSON summary next to it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from cuddhelmholtz_tpu.examples.drivers import run_helmholtz  # noqa: E402

out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
os.makedirs(out_dir, exist_ok=True)

t0 = time.time()
# fp32 is the documented TPU production policy (docs/DTYPES.md): fp64 is
# emulated on TPU, and fp32-vs-fp64 residual histories were verified
# identical on this config (docs/PERF.md, 2026-08-18).
res = run_helmholtz(
    nx=128, deg=3, m=200, maxit=10_000, tol=1e-6, dtype=jnp.float32,
    max_seconds=2 * 60 * 60, verbose=2, out_dir=out_dir,
)
summary = {
    "config": "helmholtz_128_deg3_gmres200_tol1e-6",
    "budget_seconds": 7200,
    "elapsed_seconds": time.time() - t0,
    "restarts": int(res.num_iter),
    "matvecs": int(res.num_matvec),
    "success": bool(res.success),
    "abs_res_first": float(res.res_norm[0]),
    "rel_res_final": float(res.res_norm[-1] / res.res_norm[0]),
}
with open(os.path.join(out_dir, "config2_budget.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary))
