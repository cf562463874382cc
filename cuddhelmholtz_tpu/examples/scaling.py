"""Scaling harness: DDH matvec throughput over a growing device mesh.

BASELINE.json's scaling protocol: operator-apply nnz/s at 1 chip / 1 host /
N >= 2 hosts with >= 70% weak-scaling efficiency.  This harness runs the
subdomain-sharded DDH apply (``parallel.ShardedDDH``) on meshes of
1, 2, 4, ... devices and reports per-mesh matvec time and efficiency.

* **Weak scaling** (default): the subdomain grid grows with the mesh
  (nx = base_nx * sqrt(n_devices) rounded to a subdomain multiple), so each
  device keeps ~constant work.
* **Strong scaling** (--strong): fixed problem, more devices.

On a real TPU pod slice this measures ICI-coupled throughput; on a single
chip or a simulated CPU mesh (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=N) it validates the sharded path and
demonstrates the protocol (CPU timings are not hardware-representative).

Usage:  python -m cuddhelmholtz_tpu.examples.scaling [--strong] [--transfer]
        [--global] [--cpu N] [base_nx]

``--transfer`` precomputes the per-subdomain trace-transfer matrices and
shards those, so each matvec is one small per-chip matmul + psum (the
production configuration; throughput is still reported in wave-cycle
stencil-equivalent nnz/s, matching bench.py's effective metric).
``--global`` measures the element-sharded coupled Helmholtz matvec
(``parallel.sharded_helmholtz_matvec``) instead of the DDH apply -- the
global-system half of BASELINE config 5.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def force_cpu_mesh(n_devices: int) -> None:
    """Rebuild the backend as an n-device simulated CPU platform (env-var
    overrides don't reach plain scripts when a TPU plugin owns the backend)."""
    import jax

    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
    except RuntimeError:
        pass  # backends already initialised
    if len(jax.devices()) < n_devices:
        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as _xb

        _xb.clear_backends()


def scaling_global(base_nx: int = 32, strong: bool = False, deg: int = 3, reps: int = 5):
    """Element-sharded coupled-Helmholtz matvec throughput over the mesh."""
    import jax
    import jax.numpy as jnp

    from ..mesh.mesh2d import Mesh2D
    from ..models.helmholtz import make_helmholtz_op, project_coefficients
    from ..parallel.sharding import device_mesh, sharded_helmholtz_matvec
    from ..spaces.h1 import FaceSpace, H1Space
    from ..utils.basis import Basis

    n_total = len(jax.devices())
    sizes = []
    n = 1
    while n <= n_total:
        sizes.append(n)
        n *= 2

    nb = deg + 1
    records = []
    base_per_dev = None
    for nd in sizes:
        nx = base_nx if strong else int(round(base_nx * np.sqrt(nd)))
        mesh2d = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
        fem = H1Space(mesh2d, Basis(nb))
        fs = FaceSpace(fem, mesh2d.boundary_edges)
        omega = 2 * np.pi * nx / 10

        def coeff(xy):
            r = xy[..., 0] ** 2 + xy[..., 1] ** 2
            return jnp.where(r < 0.0625, 0.2, 1.0)

        a2, af = project_coefficients(fem, fs, coeff, dtype=jnp.float32)
        op = make_helmholtz_op(omega, a2, af, fem, fs, dtype=jnp.float32, kron=False)
        matvec = jax.jit(sharded_helmholtz_matvec(op, device_mesh(nd)))
        U = jnp.zeros(2 * fem.ndof, jnp.float32).at[0].set(1.0)
        matvec(U).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            y = matvec(U)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        # stencil-equivalent nnz: 2 stiffness + 2 mass applies on ndof rows
        nnz = 4 * fem.ndof * (2 * nb - 1) ** 2
        per_dev = nnz / dt / nd
        if base_per_dev is None:
            base_per_dev = per_dev
        rec = {
            "devices": nd,
            "nx": nx,
            "ndof": fem.ndof,
            "matvec_seconds": dt,
            "nnz_per_s": nnz / dt,
            "nnz_per_s_per_device": per_dev,
            "efficiency_vs_1dev": per_dev / base_per_dev,
        }
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    return records


def scaling(
    base_nx: int = 32,
    strong: bool = False,
    deg: int = 3,
    reps: int = 3,
    transfer: bool = False,
):
    import jax
    import jax.numpy as jnp

    from ..mesh.mesh2d import Mesh2D
    from ..parallel.sharding import ShardedDDH, device_mesh
    from ..solvers.ddh import DDH
    from ..spaces.h1 import H1Space
    from ..utils.basis import Basis

    n_total = len(jax.devices())
    sizes = []
    n = 1
    while n <= n_total:
        sizes.append(n)
        n *= 2

    nb = deg + 1
    epd = 16 // nb  # elements per subdomain side (reference DDH_BLOCK_SIZE=16)
    records = []
    base_per_dev = None
    for nd in sizes:
        if strong:
            nx = base_nx
        else:
            # weak scaling: total subdomains ~ proportional to devices
            nx = int(round(base_nx * np.sqrt(nd) / epd)) * epd
        mesh2d = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
        fem = H1Space(mesh2d, Basis(nb))
        omega = 2 * np.pi * nx / 10
        ddh = DDH(omega, np.ones(fem.ndof), fem, nx=nx, ny=nx)
        if transfer:
            ddh.precompute_transfer()
        dmesh = device_mesh(nd)
        sddh = ShardedDDH(ddh, dmesh)
        lam = jnp.zeros(sddh.size, jnp.float32).at[0].set(1.0)
        sddh.action(lam).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            y = sddh.action(lam)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        nnz = (
            ddh.wh_maxit
            * ddh.nt
            * 2
            * int(ddh.efem.sizes.astype(np.int64).sum())
            * (2 * nb - 1) ** 2
        )
        per_dev = nnz / dt / nd
        if base_per_dev is None:
            base_per_dev = per_dev
        rec = {
            "devices": nd,
            "nx": nx,
            "n_domains": ddh.n_domains,
            "matvec_seconds": dt,
            "nnz_per_s": nnz / dt,
            "nnz_per_s_per_device": per_dev,
            "efficiency_vs_1dev": per_dev / base_per_dev,
        }
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    return records


def capture_scaling(out_path: str, base_nx: int = 16, timeout: float = 900.0) -> dict:
    """Run the weak-scaling protocol as a per-round artifact (VERDICT r04 #6).

    Two demonstrations, both CPU (not hardware-representative -- recorded so
    the sharded path's efficiency SHAPE is visible round over round and the
    BASELINE protocol is demonstrably runnable):

    * the 8-device simulated CPU mesh, weak mode, ``--transfer``;
    * the 2-process Gloo-wired hybrid ``(dcn, ici)`` mesh (2 devices each).

    Both run in subprocesses (backend isolation from a TPU-owning caller).
    Writes ``out_path`` and returns a summary dict.
    """
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    result: dict = {"protocol": "weak", "transfer": True, "base_nx": base_nx}

    try:
        p = subprocess.run(
            [
                sys.executable, "-m", "cuddhelmholtz_tpu.examples.scaling",
                "--transfer", "--cpu", "8", str(base_nx),
            ],
            capture_output=True, text=True, timeout=timeout, cwd=repo,
            env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"},
        )
        result["cpu_mesh"] = json.loads(p.stdout.strip().splitlines()[-1])
    except Exception as e:  # pragma: no cover - diagnostics only
        result["cpu_mesh"] = {"error": repr(e)[:200]}

    try:
        from ..parallel.distributed import spawn_cpu_processes

        worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scaling_mp_worker.py")
        outs = spawn_cpu_processes(worker, 2, 2, base_nx, timeout=timeout)
        ok = all(rc == 0 for rc, _ in outs)
        rec = {"ok": ok}
        for _, text in outs:
            for line in text.splitlines():
                if line.startswith("SCALING_MP "):
                    rec.update(json.loads(line[len("SCALING_MP "):]))
        if not ok:
            rec["tail"] = outs[0][1][-300:]
        result["gloo_2proc"] = rec
    except Exception as e:  # pragma: no cover - diagnostics only
        result["gloo_2proc"] = {"error": repr(e)[:200]}

    recs = result.get("cpu_mesh")
    if isinstance(recs, list) and recs:
        result["weak_efficiency_8dev"] = recs[-1].get("efficiency_vs_1dev")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    strong = "--strong" in args
    transfer = "--transfer" in args
    global_ = "--global" in args
    args = [a for a in args if a not in ("--strong", "--transfer", "--global")]
    if "--cpu" in args:
        i = args.index("--cpu")
        force_cpu_mesh(int(args[i + 1]))
        del args[i : i + 2]
    base_nx = int(args[0]) if args else 32
    if global_:
        out = scaling_global(base_nx=base_nx, strong=strong)
    else:
        out = scaling(base_nx=base_nx, strong=strong, transfer=transfer)
    print(json.dumps(out))
