"""Multi-process worker: ShardedDDH across process boundaries (Gloo CPU).

Spawned by ``tests/test_multiprocess.py`` / ``__graft_entry__`` via
``cuddhelmholtz_tpu.parallel.distributed.spawn_cpu_processes``.  Each process
simulates ``devs_per_proc`` CPU devices, joins a ``jax.distributed`` cluster,
builds the same small DDH problem, shards it over the global 2-axis
``(dcn, ici)`` hybrid mesh (process boundary = dcn), and checks the sharded
action/rhs against the single-process reference computed locally.
"""

import os
import sys

pid, n_procs, devs_per_proc, port = (int(a) for a in sys.argv[1:5])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs_per_proc}"
os.environ["CUDDH_COORDINATOR"] = f"localhost:{port}"
os.environ["CUDDH_NUM_PROCESSES"] = str(n_procs)
os.environ["CUDDH_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuddhelmholtz_tpu.parallel.distributed import (  # noqa: E402
    hybrid_device_mesh,
    initialize_from_env,
)

assert initialize_from_env()
assert jax.process_count() == n_procs, jax.process_count()
assert len(jax.devices()) == n_procs * devs_per_proc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D  # noqa: E402
from cuddhelmholtz_tpu.parallel.sharding import ShardedDDH  # noqa: E402
from cuddhelmholtz_tpu.solvers.ddh import DDH  # noqa: E402
from cuddhelmholtz_tpu.spaces.h1 import H1Space  # noqa: E402
from cuddhelmholtz_tpu.utils.basis import Basis  # noqa: E402

nx, deg = 8, 3
omega = 2 * np.pi * nx / 2.5  # CFL-limited nt stays small (200)
mesh2d = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
fem = H1Space(mesh2d, Basis(deg + 1))
rng = np.random.default_rng(0)
a_nodal = 1.0 + 0.2 * rng.random(fem.ndof)
ddh = DDH(omega, a_nodal, fem, nx=nx, ny=nx, block_size=8, nt_override=40)

lam_np = rng.standard_normal(ddh.size).astype(np.float32)
f_np = rng.standard_normal(2 * fem.ndof).astype(np.float32)

# single-process reference on the default local device (identical in every
# process: same seed, same tables)
want_action = np.asarray(ddh.action(jnp.asarray(lam_np)))
want_rhs = np.asarray(ddh.rhs(jnp.asarray(f_np)))

mesh = hybrid_device_mesh()  # (dcn = processes, ici = local devices)
assert mesh.shape["dcn"] == n_procs and mesh.shape["ici"] == devs_per_proc
sddh = ShardedDDH(ddh, mesh, axis=("dcn", "ici"))

got_action = np.asarray(sddh.action(jnp.asarray(lam_np)))
got_rhs = np.asarray(sddh.rhs(jnp.asarray(f_np)))

err_a = np.linalg.norm(got_action - want_action) / np.linalg.norm(want_action)
err_r = np.linalg.norm(got_rhs - want_rhs) / np.linalg.norm(want_rhs)
print(f"proc {pid}: action rel {err_a:.2e}, rhs rel {err_r:.2e}", flush=True)
assert err_a < 1e-5, err_a
assert err_r < 1e-5, err_r
print(f"proc {pid}: MULTIPROCESS_OK", flush=True)
