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
state round-trips per step).  Requires the shared-stiffness case (identical
subdomains, e.g. uniform meshes); ragged/per-domain-S cases use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WH_MAXIT = 5


def _wave_kernel(nt, wh_maxit, scal_ref, tab_ref, S_ref, F_ref, G_ref, Ha_ref, mi_ref, u_ref, v_ref):
    dt = scal_ref[0, 0]
    K0 = scal_ref[0, 1]
    half_dt = 0.5 * dt

    F = F_ref[...]
    G = G_ref[...]
    Ha = Ha_ref[...]
    mi = mi_ref[...]
    S = S_ref[...]

    def matS(p):
        return jnp.dot(p, S, preferred_element_type=jnp.float32)

    def step(t, carry):
        p, q, u, v = carry
        row = tab_ref[t]
        cs0, sn0, cs1, sn1, Kt = row[0], row[1], row[2], row[3], row[4]
        z = matS(p) - Ha * q
        dq = (z + cs0 * F + sn0 * G) * mi
        p_half = p - half_dt * q
        q_half = q + half_dt * dq
        p2 = p - dt * q_half
        z2 = matS(p_half) - Ha * q_half
        dq2 = (z2 + cs1 * F + sn1 * G) * mi
        q2 = q + dt * dq2
        return p2, q2, u + Kt * p2, v + Kt * q2

    def wh_iter(_, carry):
        u, v = carry
        p, q, u, v = lax.fori_loop(0, nt, step, (u, v, K0 * u, K0 * v))
        return u, v

    zero = jnp.zeros_like(F)
    u, v = lax.fori_loop(0, wh_maxit, wh_iter, (zero, zero))
    u_ref[...] = u
    v_ref[...] = v


def wave_cycle_pallas(
    params, F: jax.Array, G: jax.Array, wh_maxit: int = WH_MAXIT, block_domains: int = 512
):
    """Run the WaveHoltz cycle with subdomain state resident in VMEM.

    ``params`` is a ``DDHParams`` with a shared (pad, pad) stiffness.  The
    subdomain batch is padded to a multiple of ``block_domains``; padded rows
    have zero coefficients so their state stays identically zero.
    """
    if params.S.ndim != 2:
        from ...solvers.ddh import _wave_cycle_xla

        return _wave_cycle_xla(params, F, G, wh_maxit)

    ndom, pad = F.shape
    nt = params.tables.shape[0]
    DB = max(8, min(block_domains, ndom))
    n_pad = (-ndom) % DB
    if n_pad:
        z = jnp.zeros((n_pad, pad), dtype=F.dtype)
        F = jnp.concatenate([F, z])
        G = jnp.concatenate([G, z])
        Ha = jnp.concatenate([params.Ha, z])
        mi = jnp.concatenate([params.inv_mi, z])
    else:
        Ha, mi = params.Ha, params.inv_mi
    ndom_p = ndom + n_pad

    scal = jnp.stack([params.dt, params.K0]).astype(jnp.float32).reshape(1, 2)

    grid = (ndom_p // DB,)
    row_spec = pl.BlockSpec((DB, pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    flops = 2 * wh_maxit * nt * 2 * ndom_p * pad * pad
    u, v = pl.pallas_call(
        functools.partial(_wave_kernel, nt, wh_maxit),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full(params.tables.shape),
            full(params.S.shape),
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
            flops=flops, bytes_accessed=8 * ndom_p * pad * 4, transcendentals=0
        ),
    )(scal, params.tables, params.S, F, G, Ha, mi)
    return u[:ndom], v[:ndom]
