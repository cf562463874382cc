"""Pallas TPU kernel for the DDH WaveHoltz cycle.

This is the hottest loop in the framework (reference: ``ddh_action``,
``/root/reference/source/DDH.cpp:111-321`` -- one CUDA block per subdomain
running 5 x nt x 2 inline stiffness applications in shared memory).

TPU design: subdomains are batched into blocks of ``DB`` rows; for each block
the state (p, q, u, v: (DB, pad) fp32) stays in VMEM across the *entire*
5 x nt time loop, so HBM traffic is one read of the forcing/coefficients and
one write of (u, v) per apply, while every time step runs
  z = p @ S        -- (DB, pad) x (pad, pad) fp32 matmul on the MXU
  elementwise leapfrog updates -- VPU
This makes the cycle compute-bound (the XLA scan fallback is HBM-bound:
state round-trips per step).

Per-domain stiffness matrices (unstructured partitions, heterogeneous
coefficients) run the same way through the GROUPED layout: rows ordered in
contiguous runs sharing one matrix, the grid blocking one run per program
with its (pad, pad) matrix selected by grid position and resident in VMEM
across the whole 5 x nt loop -- the matmuls keep the shared-S shape.  The
reference's single kernel serves any partition (``DDH.cpp:111-321``); the
DDH precomputes order their probe batches this way.  Measured steady-state
at the unstructured config (8 domains, nt=1717, 120 probe columns):
grouped Pallas 1.5 s vs XLA scan 5.3 s vs per-row batched dot ~8 s -- so
the grouped layout is the production path, the ungrouped per-row batched
``dot_general`` variant stays for interpret-mode CI, and ungrouped per-row
stacks use the XLA path on real TPUs.  (First compiles over the
remote-compile tunnel vary 10-300 s for identical programs, which is why
the DDH precompute results are disk-cached -- see ``DDH.prepare``.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WH_MAXIT = 5

# Fitted Mosaic scoped-VMEM budget (bytes).  The kernel keeps the (pad, pad)
# stiffness family (~22 B/elem: fp32 + bf16 splits + staging + the
# double-buffered input block) and ~14 effective live (rows, pad) fp32 row
# copies (state, forcing, stacked/split matmul operands, pipeline buffers)
# resident; the constants are fitted to Mosaic's scoped-vmem accounting
# (measured: DB=512 at pad=640 hits 22.3 MB of the 16 MB stack, DB=232 fits).
# A Mosaic version bump that shifts its accounting shows up as a compile
# failure, which the DDH precompute loops catch and step down from (halve
# the chunk, then fall back to the XLA scan) -- see ``solvers/ddh.py``.
VMEM_BUDGET = 14 << 20


def grouped_vmem_rows(pad: int, budget: int | None = None) -> int:
    """Max row-block size (multiple of 8) fitting the scoped-VMEM model.

    Single source of truth for the kernel's own admission check and the DDH
    precompute chunk caps (``DDH.precompute_transfer`` /
    ``precompute_io_maps``).  Returns 0 when even 8 rows do not fit (the
    caller must use the XLA path).
    """
    b = VMEM_BUDGET if budget is None else budget
    rows = (b - pad * pad * 22) // (pad * 4 * 14)
    return max(0, (rows // 8) * 8)


def _wave_kernel(nt, wh_maxit, precision, grouped, scal_ref, tab_ref, S_ref, F_ref, G_ref, Ha_ref, mi_ref, u_ref, v_ref):
    dt = scal_ref[0, 0]
    K0 = scal_ref[0, 1]
    half_dt = 0.5 * dt

    F = F_ref[...]
    G = G_ref[...]
    Ha = Ha_ref[...]
    mi = mi_ref[...]
    S = S_ref[...]
    if grouped:
        # grouped layout: this block's DB rows all use ONE matrix (the
        # (1, pad, pad) block selected by grid position) -- the matmuls then
        # keep the proven shared-S shape (large row blocks on the MXU)
        # instead of Mosaic's per-row batched dot (measured ~5x slower
        # steady-state)
        S = S[0]
    db = F.shape[0]
    batched = S.ndim == 3  # per-domain stiffness stack (DB, pad, pad)

    def _dot(P, M, prec):
        # precision must be explicit: in the bf16 split the operands are
        # already bf16 (DEFAULT is exact there) and Mosaic cannot lower the
        # package-wide HIGHEST default for bf16 lhs/rhs
        if batched:
            # P (DB, r, pad) x M (DB, pad, pad) -> (DB, r, pad), batched over
            # the subdomain axis
            return lax.dot_general(
                P,
                M,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return jnp.dot(P, M, preferred_element_type=jnp.float32, precision=prec)

    def _stack(p, ph):
        # stack along the matmul row axis: axis 0 (shared S) or 1 (batched)
        return jnp.concatenate(
            [p[:, None], ph[:, None]], axis=1
        ) if batched else jnp.concatenate([p, ph], axis=0)

    def _unstack2(Z):
        return (Z[:, 0], Z[:, 1]) if batched else (Z[:db], Z[db:])

    # Each step needs S @ p and S @ p_half; p_half = p - dt/2 q depends only
    # on the incoming state, so both products run as ONE stacked matmul.
    #
    # Precision: the MXU multiplies in bf16.  One pass ("default") leaves a
    # ~1e-3 relative noise floor over the 5 x nt x 2-step cycle, stalling the
    # lambda-GMRES above the reference's fp32 1e-4 tolerance.  Mosaic has no
    # HIGH lowering, so the 3-pass bf16 scheme (error-compensated split
    # a@b ~= a1@b1 + a2@b1 + a1@b2, fp32-grade here) is built manually; it is
    # 2x cheaper than HIGHEST (6 passes).
    if precision == lax.Precision.HIGH:
        S1 = S.astype(jnp.bfloat16)
        S2 = (S - S1.astype(jnp.float32)).astype(jnp.bfloat16)

        def matS_pair(p, ph):
            P = _stack(p, ph)
            P1 = P.astype(jnp.bfloat16)
            P2 = (P - P1.astype(jnp.float32)).astype(jnp.bfloat16)
            ax = 1 if batched else 0
            Za = _dot(jnp.concatenate([P1, P2], axis=ax), S1, lax.Precision.DEFAULT)
            Zb = _dot(P1, S2, lax.Precision.DEFAULT)
            if batched:
                Z = Za[:, :2] + Za[:, 2:] + Zb
            else:
                Z = Za[: 2 * db] + Za[2 * db :] + Zb
            return _unstack2(Z)

    else:

        def matS_pair(p, ph):
            return _unstack2(_dot(_stack(p, ph), S, precision))

    def step(t, carry):
        p, q, u, v = carry
        row = tab_ref[t]
        cs0, sn0, cs1, sn1, Kt = row[0], row[1], row[2], row[3], row[4]
        p_half = p - half_dt * q
        zp, zh = matS_pair(p, p_half)
        dq = (zp - Ha * q + cs0 * F + sn0 * G) * mi
        q_half = q + half_dt * dq
        p2 = p - dt * q_half
        dq2 = (zh - Ha * q_half + cs1 * F + sn1 * G) * mi
        q2 = q + dt * dq2
        return p2, q2, u + Kt * p2, v + Kt * q2

    # int32 loop bounds: under jax_enable_x64 plain Python bounds trace as
    # i64 counters, which Mosaic cannot legalize (failed 'func.return')
    i32 = jnp.int32

    def wh_iter(_, carry):
        u, v = carry
        p, q, u, v = lax.fori_loop(i32(0), i32(nt), step, (u, v, K0 * u, K0 * v))
        return u, v

    zero = jnp.zeros_like(F)
    u, v = lax.fori_loop(i32(0), i32(wh_maxit), wh_iter, (zero, zero))
    u_ref[...] = u
    v_ref[...] = v


def wave_cycle_pallas(
    params,
    F: jax.Array,
    G: jax.Array,
    wh_maxit: int = WH_MAXIT,
    block_domains: int = 512,
    precision: str = "high",
    interpret: bool = False,
    s_group_size: int | None = None,
):
    """Run the WaveHoltz cycle with subdomain state resident in VMEM.

    ``params`` is a ``DDHParams`` with a shared (pad, pad) stiffness or a
    per-domain (ndom, pad, pad) stack (unstructured partitions,
    heterogeneous coefficients).  The subdomain batch is padded to a
    multiple of ``block_domains``; padded rows have zero coefficients so
    their state stays identically zero.  In the per-domain case the grid
    blocks over subdomains and each block's stiffness stack is staged into
    VMEM once per apply; only a pad so large that a single matrix exceeds
    the VMEM budget falls back to the XLA scan.

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (device-independent) so CI on the CPU mesh covers the same code path the
    TPU executes, including the 3-pass bf16 split.
    """
    ndom, pad = F.shape
    per_domain = params.S.ndim == 3
    grouped = False
    if per_domain and s_group_size is not None:
        # grouped layout: rows come pre-ordered in contiguous runs of
        # ``s_group_size``, run g using params.S[g] -- each grid block then
        # works against ONE matrix (selected by grid position), keeping the
        # shared-S matmul shape.  This is the production per-domain path
        # (the precomputes order their probe batches this way).
        ok = (
            s_group_size > 0
            and s_group_size % 8 == 0
            and params.S.shape[0] * s_group_size == ndom
            # scoped-VMEM admission check (shared model: grouped_vmem_rows)
            and s_group_size <= grouped_vmem_rows(pad)
        )
        if not ok:
            from ...solvers.ddh import _wave_cycle_xla

            # the caller passed the DEDUPED (nu, pad, pad) stack with rows
            # ordered in runs of s_group_size; the XLA cycle needs per-row
            # matrices, so expand before falling back
            S_full = params.S
            if (
                s_group_size > 0
                and params.S.ndim == 3
                and params.S.shape[0] * s_group_size == ndom
            ):
                S_full = jnp.repeat(params.S, s_group_size, axis=0)
            return _wave_cycle_xla(
                params._replace(S=S_full), F, G, wh_maxit, precision
            )
        grouped = True
        DB = s_group_size
        n_pad = 0
    elif per_domain:
        # ungrouped per-row stacks: a batched in-kernel dot_general exists
        # (and is what interpret-mode CI pins), but Mosaic lowers it as
        # per-row matvecs (slower than the XLA scan steady-state, plus a
        # fresh Mosaic remote compile per shape) -- so on real TPUs the XLA
        # path is the right call unless the caller groups the rows.
        if not interpret:
            from ...solvers.ddh import _wave_cycle_xla

            return _wave_cycle_xla(params, F, G, wh_maxit, precision)
        s_budget = (1 << 23) // (pad * pad * 8)
        if params.S.shape[0] != ndom:
            from ...solvers.ddh import _wave_cycle_xla

            return _wave_cycle_xla(params, F, G, wh_maxit, precision)
        bd = min(block_domains, s_budget)
        if bd < ndom:
            bd = (bd // 8) * 8
            if bd == 0:
                from ...solvers.ddh import _wave_cycle_xla

                return _wave_cycle_xla(params, F, G, wh_maxit, precision)
        block_domains = bd
    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision

    nt = params.tables.shape[0]
    if not grouped:
        # cap DB by the shared scoped-VMEM model (see grouped_vmem_rows)
        vm_db = grouped_vmem_rows(pad)
        if vm_db >= 8:
            block_domains = min(block_domains, vm_db)
        DB = max(1 if per_domain else 8, min(block_domains, ndom))
        n_pad = (-ndom) % DB
    S = params.S
    if n_pad:
        z = jnp.zeros((n_pad, pad), dtype=F.dtype)
        F = jnp.concatenate([F, z])
        G = jnp.concatenate([G, z])
        Ha = jnp.concatenate([params.Ha, z])
        mi = jnp.concatenate([params.inv_mi, z])
        if per_domain:
            # padded rows multiply against S[0]; their zero coefficients keep
            # the state identically zero regardless
            S = jnp.concatenate([S, jnp.broadcast_to(S[:1], (n_pad, pad, pad))])
    else:
        Ha, mi = params.Ha, params.inv_mi
    ndom_p = ndom + n_pad

    scal = jnp.stack([params.dt, params.K0]).astype(jnp.float32).reshape(1, 2)

    grid = (ndom_p // DB,)
    # np.int32 zeros in the index maps: under jax_enable_x64 plain Python
    # ints trace as i64 block indices, which Mosaic cannot legalize
    import numpy as _np

    zero32 = _np.int32(0)
    row_spec = pl.BlockSpec((DB, pad), lambda i: (i, zero32), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(zero32 for _ in shape), memory_space=pltpu.VMEM
    )
    if grouped:
        s_spec = pl.BlockSpec(
            (1, pad, pad), lambda i: (i, zero32, zero32), memory_space=pltpu.VMEM
        )
    elif per_domain:
        s_spec = pl.BlockSpec(
            (DB, pad, pad), lambda i: (i, zero32, zero32), memory_space=pltpu.VMEM
        )
    else:
        s_spec = full(S.shape)

    flops = 2 * wh_maxit * nt * 2 * ndom_p * pad * pad
    u, v = pl.pallas_call(
        functools.partial(_wave_kernel, nt, wh_maxit, prec, grouped),
        grid=grid,
        in_specs=[
            # zero32, not (0, 0): plain Python ints trace as i64 block
            # indices under jax_enable_x64, which Mosaic cannot legalize
            pl.BlockSpec((1, 2), lambda i: (zero32, zero32), memory_space=pltpu.SMEM),
            full(params.tables.shape),
            s_spec,
            row_spec,
            row_spec,
            row_spec,
            row_spec,
        ],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((ndom_p, pad), F.dtype),
            jax.ShapeDtypeStruct((ndom_p, pad), F.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=8 * ndom_p * pad * 4 + (ndom_p * pad * pad * 4 if per_domain else 0),
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, params.tables, S, F, G, Ha, mi)
    return u[:ndom], v[:ndom]
