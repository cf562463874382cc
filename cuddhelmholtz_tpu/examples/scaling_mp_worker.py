"""Multi-process scaling worker: times the Gloo-wired sharded DDH matvec.

Spawned by ``examples.scaling.capture_scaling`` via
``parallel.distributed.spawn_cpu_processes``.  Each process simulates
``devs_per_proc`` CPU devices, joins the ``jax.distributed`` cluster, builds
the same DDH problem, shards it over the 2-axis ``(dcn, ici)`` hybrid mesh
(process boundary = dcn), and times the sharded action.  Process 0 prints a
``SCALING_MP {json}`` line with the timing record.

CPU timings are not hardware-representative (BASELINE's >= 70% weak-scaling
bar needs >= 2 real hosts); the per-round artifact exists so the sharded
path's *shape* is demonstrably runnable and regressions in it are visible
(VERDICT r04 #6).
"""

import json
import os
import sys
import time

pid, n_procs, devs_per_proc, port = (int(a) for a in sys.argv[1:5])
nx = int(sys.argv[5]) if len(sys.argv) > 5 else 16
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs_per_proc}"
os.environ["CUDDH_COORDINATOR"] = f"localhost:{port}"
os.environ["CUDDH_NUM_PROCESSES"] = str(n_procs)
os.environ["CUDDH_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D  # noqa: E402
from cuddhelmholtz_tpu.parallel.distributed import (  # noqa: E402
    hybrid_device_mesh,
    initialize_from_env,
)
from cuddhelmholtz_tpu.parallel.sharding import ShardedDDH  # noqa: E402
from cuddhelmholtz_tpu.solvers.ddh import DDH  # noqa: E402
from cuddhelmholtz_tpu.spaces.h1 import H1Space  # noqa: E402
from cuddhelmholtz_tpu.utils.basis import Basis  # noqa: E402

assert initialize_from_env()
assert jax.process_count() == n_procs

deg = 3
omega = 2 * np.pi * nx / 10
mesh2d = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
fem = H1Space(mesh2d, Basis(deg + 1))
ddh = DDH(omega, np.ones(fem.ndof), fem, nx=nx, ny=nx)
ddh.precompute_transfer()

mesh = hybrid_device_mesh()
sddh = ShardedDDH(ddh, mesh, axis=("dcn", "ici"))
lam = jnp.zeros(sddh.size, jnp.float32).at[0].set(1.0)
sddh.action(lam).block_until_ready()  # compile
reps = 5
t0 = time.perf_counter()
for _ in range(reps):
    y = sddh.action(lam)
y.block_until_ready()
dt = (time.perf_counter() - t0) / reps

nb = deg + 1
nnz = (
    ddh.wh_maxit * ddh.nt * 2
    * int(ddh.efem.sizes.astype(np.int64).sum())
    * (2 * nb - 1) ** 2
)
if pid == 0:
    rec = {
        "processes": n_procs,
        "devs_per_proc": devs_per_proc,
        "nx": nx,
        "n_domains": ddh.n_domains,
        "matvec_seconds": dt,
        "nnz_per_s": nnz / dt,
    }
    print("SCALING_MP " + json.dumps(rec), flush=True)
print(f"proc {pid}: OK", flush=True)
