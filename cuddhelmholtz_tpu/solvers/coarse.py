"""Two-level DDH: a plane-wave coarse space on the interface (lambda) system.

One-level substructuring shows the classical frequency wall: restarts grow
18 -> 19 -> 88 over nx=128/256/512 at 16-DOF blocks (docs/PERF.md).  The
standard cure is a coarse space: project the residual onto a small set of
slowly-resolved interface modes, solve that coarse problem directly, and
correct.  This goes beyond the reference outright -- its DDH is strictly
one-level (``/root/reference/source/DDH.cpp:111-321``).

Design (TPU-first):

* Coarse columns are **plane waves localised to superdomains**: for each
  superdomain ``s`` (a cluster of subdomains from median bisection of their
  centroids), each side (lambda / mu), and each mode ``phi_j`` in
  ``{1} + {cos(omega e_r . x), sin(omega e_r . x)}`` over ``n_dir``
  equispaced directions, the column takes value ``phi_j(x)`` at every
  surviving trace unknown of ``s``'s subdomains and 0 elsewhere.  Plane
  waves are the natural coarse basis for Helmholtz traces (constants alone
  cannot represent oscillatory error at omega-scale).
* The Galerkin coarse matrix ``E = Z^T (I - U) Z`` is assembled **exactly**
  on the host from the already-precomputed per-subdomain transfer matrices
  (the identity-folded stack of ``_build_roll_route``): ``U``'s scatter is
  collision-free in the own-slot layout (all surviving B1 ids are
  distinct), so the assembly is a per-domain dense contraction plus a
  scatter-add over (superdomain, mode) pairs -- no probe solves.
* ``E`` is symmetrically diagonal-normalised, ridge-regularised, and
  inverted once; the device keeps ``Einv`` so each application is two
  small einsums + one (nc, nc) matmul (MXU) + two segment reductions.

The correction is used as a right preconditioner in FGMRES on the lambda
system (``DDH.solver(coarse=...)``): additive ``v + Z E^{-1} Z^T v`` (one
action per iteration) or multiplicative ``q + (v - A q)`` with
``q = Z E^{-1} Z^T v`` (two actions, stronger).

Two coarse-solve backends:

* **direct** (``CoarseSpace``): dense ``E`` assembled and inverted once.
  Simple, but the dense inverse caps ``nc`` at ~8-18k on this chip (XLA's
  blocked LU scoped-vmem-OOMs; host LAPACK needs minutes) -- far below the
  ~2 DOFs/wavelength skeleton resolution (~1e5 unknowns at nx=512) that
  r04's measurements showed a wave-capturing coarse space needs.
* **iterative** (``SparseCoarseSpace``): ``E`` kept **block-sparse over the
  superdomain adjacency graph**.  Plane-wave columns couple only
  cmap-adjacent superdomains, so each (row-super, col-super) pair stores one
  (2, 2, nm, nm) side-coupling block; the coarse solve is on-device GMRES
  with a block-Jacobi (per-superdomain 2nm x 2nm) preconditioner.  Storage
  and matvec are O(nS * degree * nm^2) -- skeleton-resolution spaces
  (nc ~ 1e5-3e5) fit with room to spare, and the matvec is a single padded
  gather + einsum (MXU-shaped).  Assembly uses the exact same per-domain
  algebra as the dense path (it is exact, not approximate); only the
  storage and the solve change.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CoarseSpace(NamedTuple):
    """Device data for the coarse correction (see module docstring).

    ``nm`` modes per (superdomain, side); ``nc = 2 * n_super * nm`` coarse
    unknowns ordered (side, superdomain, mode), lambda side first.
    """

    V: jax.Array  # (ndom, pf, nm) mode values at own trace slots (masked)
    sd: jax.Array  # (ndom,) int32 superdomain label per subdomain
    Einv: jax.Array  # (nc, nc) inverse of the normalised Galerkin matrix
    dscale: jax.Array  # (nc,) column normalisation 1/sqrt(diag Z^T Z)


def superdomain_labels(points: np.ndarray, n_super: int) -> np.ndarray:
    """Cluster points into ``n_super`` (a power of two) groups by recursive
    median bisection along the widest axis -- the same scheme as the
    element partitioner (``spaces/ensemble.coordinate_bisection_labels``),
    applied to subdomain centroids so it works for structured AND
    unstructured partitions."""
    n = points.shape[0]
    depth = max(0, int(round(np.log2(max(1, n_super)))))
    labels = np.zeros(n, dtype=np.int64)

    def split(idx: np.ndarray, lab: int, d: int) -> None:
        if d == 0 or idx.size <= 1:
            labels[idx] = lab
            return
        p = points[idx]
        ax = int(np.argmax(p.max(axis=0) - p.min(axis=0)))
        order = np.argsort(p[:, ax], kind="stable")
        half = idx.size // 2
        split(idx[order[:half]], 2 * lab, d - 1)
        split(idx[order[half:]], 2 * lab + 1, d - 1)

    split(np.arange(n), 0, depth)
    # compress labels (all 2^depth leaves are populated for n >= 2^depth)
    _, inv = np.unique(labels, return_inverse=True)
    return inv


def _mode_values(xy: np.ndarray, omega: float, n_dir: int) -> np.ndarray:
    """phi_j(x) for j = 0..nm-1: constant + cos/sin plane waves over
    ``n_dir`` equispaced directions in [0, pi)."""
    out = [np.ones(xy.shape[:-1])]
    for r in range(n_dir):
        th = np.pi * r / max(1, n_dir)
        ph = omega * (np.cos(th) * xy[..., 0] + np.sin(th) * xy[..., 1])
        out.append(np.cos(ph))
        out.append(np.sin(ph))
    return np.stack(out, axis=-1)


def _coarse_ingredients(ddh, n_dir: int, domains_per_super: int):
    """Shared setup for both coarse-space assemblies: mode columns ``V``,
    superdomain labels ``sd``, the identity-folded per-domain transfer stack
    ``A_u`` (grouped), and the dual-target superdomain table ``sdd``."""
    if ddh._T_u is None:
        raise ValueError("coarse space needs the transfer operator: run prepare()")
    fslot = ddh._fslot_np  # (ndom, pf)
    B0, B1 = ddh._B0_np, ddh._B1_np
    gI = ddh._gI_np
    ndom, pf = fslot.shape
    n_own = ddh.n_own
    omega = ddh.omega
    coords = np.asarray(ddh.space.coords)  # (ndof, 2)

    # mode values at the own trace slots, masked to surviving unknowns
    ok = (fslot >= 0) & (B0 >= 0)
    gdof = np.where(ok, np.take_along_axis(gI, np.maximum(fslot, 0), axis=1), 0)
    xy = coords[gdof]  # (ndom, pf, 2)
    V = _mode_values(xy, omega, n_dir) * ok[:, :, None]  # (ndom, pf, nm)

    # superdomains from subdomain centroids (mean of valid slot coords)
    cnt = np.maximum(ok.sum(axis=1), 1)
    cen = (xy * ok[:, :, None]).sum(axis=1) / cnt[:, None]
    n_super = max(1, ndom // max(1, domains_per_super))
    sd = superdomain_labels(cen, n_super)
    nS = int(sd.max()) + 1

    # identity-folded per-domain transfer stack (same fold as the roll
    # route): row i < pf gives y_l = -x_l - (T x)_l, else y_m = -x_m + (T x)_m
    T_u = np.asarray(ddh._T_u, dtype=np.float64)
    if not np.isfinite(T_u).all():
        raise ValueError(
            "transfer operator contains non-finite values (an unstable "
            "nt_override breaks the leapfrog CFL limit)"
        )
    A_u = np.concatenate([-T_u[:, :pf, :], T_u[:, pf:, :]], axis=1)
    A_u[:, np.arange(2 * pf), np.arange(2 * pf)] -= 1.0
    groups = ddh._T_groups

    tgt_ok = (B1 >= 0) & (B1 < n_own)
    dual_dom = np.where(tgt_ok, B1 // pf, 0)
    sdd = sd[dual_dom]  # (ndom, pf) superdomain of each dual target
    return V, sd, nS, A_u, groups, tgt_ok, sdd


def build_coarse_space(
    ddh,
    n_dir: int = 4,
    domains_per_super: int = 16,
    ridge: float = 1e-8,
    dtype=jnp.float32,
) -> CoarseSpace:
    """Assemble the coarse space for a DDH whose transfer operator has been
    precomputed (``ddh.prepare()`` / ``precompute_transfer``)."""
    V, sd, nS, A_u, groups, tgt_ok, sdd = _coarse_ingredients(
        ddh, n_dir, domains_per_super
    )
    ndom, pf, nm = V.shape
    nc = 2 * nS * nm

    # E = Z^T Z - Z^T U Z.  U's scatter (own-slot layout) is collision-free
    # -- every surviving B1 id is distinct -- so set == add and the Galerkin
    # matrix is exact.  Writes to the lost tail (B1 >= n_own) leave the
    # coarse space (Z is zero there): mask them out.
    E = np.zeros((nc, nc))

    # Z^T Z: block diagonal over (side, superdomain)
    VtV = np.einsum("dkj,dkl->djl", V, V)  # (ndom, nm, nm)
    blocks = np.zeros((nS, nm, nm))
    np.add.at(blocks, sd, VtV)
    jj, ll = np.meshgrid(np.arange(nm), np.arange(nm), indexing="ij")
    for side in (0, 1):
        base = side * nS * nm
        rows = base + (np.arange(nS)[:, None, None] * nm + jj[None])
        cols = base + (np.arange(nS)[:, None, None] * nm + ll[None])
        np.add.at(E, (rows.reshape(-1), cols.reshape(-1)), blocks.reshape(-1))

    # minus Z^T U Z, chunked over domains to bound the A_u[groups] expansion
    chunk = max(1, min(ndom, (1 << 27) // max(1, 4 * pf * pf * 8)))
    for d0 in range(0, ndom, chunk):
        d1 = min(ndom, d0 + chunk)
        A_c = A_u[groups[d0:d1]]  # (c, 2pf, 2pf)
        V_c = V[d0:d1]
        m_c = tgt_ok[d0:d1]
        sdd_c = sdd[d0:d1]
        sdo_c = sd[d0:d1]
        for t in (0, 1):  # target side (lambda / mu rows)
            for s in (0, 1):  # source side (lambda / mu columns)
                Ab = A_c[:, t * pf : (t + 1) * pf, s * pf : (s + 1) * pf]
                Y = np.einsum("dkc,dcj->dkj", Ab, V_c)  # (c, pf, nm)
                # E[(t, sdd, j'), (s, sdo, j)] -= V[d,k,j'] * Y[d,k,j]
                vals = (V_c[:, :, :, None] * Y[:, :, None, :]) * m_c[
                    :, :, None, None
                ]  # (c, pf, nm, nm)
                rows = (t * nS + sdd_c[:, :, None, None]) * nm + jj[None, None]
                cols = (s * nS + sdo_c[:, None, None, None]) * nm + ll[None, None]
                rows = np.broadcast_to(rows, vals.shape).reshape(-1)
                cols = np.broadcast_to(cols, vals.shape).reshape(-1)
                np.add.at(E, (rows, cols), -vals.reshape(-1))

    # symmetric diagonal normalisation + ridge, then one dense inverse.
    # Large coarse spaces invert on the accelerator (fp32 LU on the MXU;
    # host LAPACK on 2 cores needs ~minutes above nc ~ 8k)
    d = np.sqrt(np.abs(np.diag(E)))
    d = np.where(d > 1e-12 * max(d.max(), 1.0), d, 1.0)
    En = E / d[:, None] / d[None, :]
    En[np.arange(nc), np.arange(nc)] += ridge
    Einv = None
    if nc > 8192 and jax.default_backend() != "cpu":
        try:
            Einv = np.asarray(jnp.linalg.inv(jnp.asarray(En, jnp.float32)))
        except Exception:
            # XLA's blocked LU can exceed the scoped-vmem limit at large nc
            # on some chips; the host path is slow but always works
            Einv = None
    if Einv is None:
        Einv = np.linalg.inv(En)

    return CoarseSpace(
        V=jnp.asarray(V, dtype=dtype),
        sd=jnp.asarray(sd.astype(np.int32)),
        Einv=jnp.asarray(Einv, dtype=dtype),
        dscale=jnp.asarray(1.0 / d, dtype=dtype),
    )


class SparseCoarseSpace(NamedTuple):
    """Block-sparse coarse space solved iteratively on device.

    Rows/columns are grouped (side t/s in {lambda, mu}, superdomain, mode);
    only cmap-adjacent superdomain pairs carry a block.  ``nbr[r]`` lists the
    column superdomains coupled to row superdomain ``r`` (-1 padded to the
    max degree K); ``Eb[r, k]`` is the (2, 2, nm, nm) normalised coupling
    block (already includes the diagonal ridge).  ``Pinv`` is the inverse of
    each row's own (2nm, 2nm) diagonal block -- the block-Jacobi
    preconditioner of the coarse GMRES.
    """

    V: jax.Array  # (ndom, pf, nm) mode values at own trace slots (masked)
    sd: jax.Array  # (ndom,) int32 superdomain label per subdomain
    dscale: jax.Array  # (2, nS, nm) 1/sqrt(diag E) normalisation
    nbr: jax.Array  # (nS, K) int32 neighbour superdomains (-1 pad)
    # normalised blocks in BATCHED-MATMUL layout: Eb[r, (t, j), (k, s, l)]
    # so the matvec is one (nS, 2nm, K*2nm) @ (nS, K*2nm) contraction --
    # the robust MXU-shaped lowering (the 6-D einsum form compiled to a
    # slow/fragile kernel at nS ~ 16k)
    Eb: jax.Array  # (nS, 2*nm, K*2*nm)
    Pinv: jax.Array  # (nS, 2nm, 2nm) block-Jacobi inverse


def build_coarse_space_sparse(
    ddh,
    n_dir: int = 4,
    domains_per_super: int = 4,
    ridge: float = 1e-8,
    dtype=jnp.float32,
    ortho: bool = True,
    ortho_tol: float = 1e-8,
) -> SparseCoarseSpace:
    """Assemble the block-sparse coarse space (same exact Galerkin algebra
    as ``build_coarse_space``; only the storage changes).  Defaults target
    skeleton-scale spaces -- the dense builder's nc cap does not apply.

    ``ortho=True`` orthonormalises the mode columns within each superdomain
    (eigen-filter of the local Gram matrix; directions with relative
    eigenvalue below ``ortho_tol`` are dropped to zero columns).  At
    skeleton resolution (1 subdomain per superdomain) raw plane waves on a
    sub-wavelength trace patch are NEARLY LINEARLY DEPENDENT -- measured at
    nx=512/dps=1: near-singular diagonal blocks blow up the block-Jacobi
    preconditioner and the coarse GMRES diverges (rel 6e+1).  The filter
    makes Z^T Z the identity on surviving directions, which both fixes the
    conditioning and makes the dropped null directions inert (their rows/
    columns are pure ridge).  ``ortho=False`` keeps raw plane-wave columns
    (bit-comparable to ``build_coarse_space``)."""
    V, sd, nS, A_u, groups, tgt_ok, sdd = _coarse_ingredients(
        ddh, n_dir, domains_per_super
    )
    ndom, pf, nm = V.shape

    W = None
    if ortho:
        # local Gram per superdomain (this is the Z^T Z diagonal block)
        VtV0 = np.einsum("dkj,dkl->djl", V, V)
        G = np.zeros((nS, nm, nm))
        np.add.at(G, sd, VtV0)
        lam, Q = np.linalg.eigh(G)  # ascending eigenvalues
        keep = lam > ortho_tol * np.maximum(lam[:, -1:], 1e-300)
        inv_sqrt = np.where(keep, 1.0 / np.sqrt(np.where(keep, lam, 1.0)), 0.0)
        W = Q * inv_sqrt[:, None, :]  # (nS, nm, nm): columns scaled/zeroed
        V_raw = V
        V = np.einsum("dkj,djl->dkl", V, W[sd])

    # (row-super, col-super) pair inventory: every diagonal pair (Z^T Z and
    # ridge live there) plus each pair reached by a dual-trace target
    diag_pids = np.arange(nS, dtype=np.int64) * nS + np.arange(nS)
    off_pids = (sdd.astype(np.int64) * nS + sd[:, None])[tgt_ok]
    pair_ids = np.unique(np.concatenate([diag_pids, off_pids]))
    npair = len(pair_ids)
    rows_p = (pair_ids // nS).astype(np.int64)
    cols_p = (pair_ids % nS).astype(np.int64)
    diag_pidx = np.searchsorted(pair_ids, diag_pids)
    B = np.zeros((npair, 2, 2, nm, nm))

    # Z^T Z: block diagonal over (side, superdomain)
    VtV = np.einsum("dkj,dkl->djl", V, V)  # (ndom, nm, nm)
    blocks = np.zeros((nS, nm, nm))
    np.add.at(blocks, sd, VtV)
    B[diag_pidx, 0, 0] += blocks
    B[diag_pidx, 1, 1] += blocks

    # minus Z^T U Z: identical contraction to the dense path, scattered to
    # pair blocks.  Invalid (d, k) targets carry zero values; route them to
    # the own diagonal pair so every scatter index is in-inventory.
    #
    # Row factor subtlety: the row basis value is the ROW superdomain's
    # (= the DUAL target's superdomain sdd[d, k]) column evaluated at the
    # trace point.  For raw global modes that equals V[d, k] (dual and own
    # slots share the physical coordinate), but the ortho transform is
    # PER SUPERDOMAIN -- the row value must use the dual superdomain's W,
    # not the own one's (fixing a 28% assembly error measured vs the
    # brute-force Z^T A Z when sdd != sd).
    own_diag = (sd.astype(np.int64) * nS + sd)[:, None]
    pid_safe = np.where(tgt_ok, sdd.astype(np.int64) * nS + sd[:, None], own_diag)
    pidx_all = np.searchsorted(pair_ids, pid_safe)  # (ndom, pf)
    chunk = max(1, min(ndom, (1 << 27) // max(1, 4 * pf * pf * 8)))
    for d0 in range(0, ndom, chunk):
        d1 = min(ndom, d0 + chunk)
        A_c = A_u[groups[d0:d1]]  # (c, 2pf, 2pf)
        V_c = V[d0:d1]
        if W is None:
            Vrow_c = V_c
        else:
            Vrow_c = np.einsum("dkl,dklj->dkj", V_raw[d0:d1], W[sdd[d0:d1]])
        m_c = tgt_ok[d0:d1]
        pidx_c = pidx_all[d0:d1].reshape(-1)
        for t in (0, 1):  # target side (lambda / mu rows)
            for s in (0, 1):  # source side (lambda / mu columns)
                Ab = A_c[:, t * pf : (t + 1) * pf, s * pf : (s + 1) * pf]
                Y = np.einsum("dkc,dcj->dkj", Ab, V_c)  # (c, pf, nm)
                vals = (Vrow_c[:, :, :, None] * Y[:, :, None, :]) * m_c[
                    :, :, None, None
                ]  # (c, pf, nm, nm): [domain, slot, row mode j', col mode j]
                np.add.at(B[:, t, s], pidx_c, -vals.reshape(-1, nm, nm))

    # symmetric diagonal normalisation (same scaling as the dense path,
    # reshaped (side, superdomain, mode)) + ridge on the diagonal
    Dblk = B[diag_pidx]  # (nS, 2, 2, nm, nm)
    dsq = np.stack(
        [np.einsum("rjj->rj", Dblk[:, 0, 0]), np.einsum("rjj->rj", Dblk[:, 1, 1])]
    )  # (2, nS, nm)
    d = np.sqrt(np.abs(dsq))
    d = np.where(d > 1e-12 * max(d.max(), 1.0), d, 1.0)
    rfac = np.transpose(d[:, rows_p, :], (1, 0, 2))[:, :, None, :, None]
    cfac = np.transpose(d[:, cols_p, :], (1, 0, 2))[:, None, :, None, :]
    Bn = B / (rfac * cfac)
    jdx = np.arange(nm)
    for t in (0, 1):
        Bn[diag_pidx[:, None], t, t, jdx[None, :], jdx[None, :]] += ridge

    # block-Jacobi: per-superdomain (2nm, 2nm) diagonal block inverse
    Dm = Bn[diag_pidx].transpose(0, 1, 3, 2, 4).reshape(nS, 2 * nm, 2 * nm)
    Pinv = np.linalg.inv(Dm)

    # padded neighbour layout: K = max superdomain degree (incl. self)
    order = np.argsort(rows_p, kind="stable")
    r_sorted = rows_p[order]
    counts = np.bincount(r_sorted, minlength=nS)
    K = int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slots = np.arange(npair) - starts[r_sorted]
    nbr = np.full((nS, K), -1, np.int32)
    Eb = np.zeros((nS, K, 2, 2, nm, nm))
    nbr[r_sorted, slots] = cols_p[order].astype(np.int32)
    Eb[r_sorted, slots] = Bn[order]
    # matmul layout: [r, k, t, s, j, l] -> [r, (t j), (k s l)]
    Ebm = np.transpose(Eb, (0, 2, 4, 1, 3, 5)).reshape(nS, 2 * nm, K * 2 * nm)

    return SparseCoarseSpace(
        V=jnp.asarray(V, dtype=dtype),
        sd=jnp.asarray(sd.astype(np.int32)),
        dscale=jnp.asarray(1.0 / d, dtype=dtype),
        nbr=jnp.asarray(nbr),
        Eb=jnp.asarray(Ebm, dtype=dtype),
        Pinv=jnp.asarray(Pinv, dtype=dtype),
    )


def _sparse_coarse_matvec(cs: SparseCoarseSpace, h: jax.Array) -> jax.Array:
    """y[t, r, j] = sum_{k, s, l} E[(t,r,j), (s, nbr[r,k], l)] h[s, nbr[r,k], l]
    as one batched (nS, 2nm, K*2nm) @ (nS, K*2nm) matmul."""
    nS, K = cs.nbr.shape
    nm = h.shape[2]
    hn = h[:, jnp.maximum(cs.nbr, 0)]  # (2, nS, K, nm)
    hn = hn * (cs.nbr >= 0)[None, :, :, None].astype(h.dtype)
    hnf = jnp.transpose(hn, (1, 2, 0, 3)).reshape(nS, K * 2 * nm)
    y = jnp.einsum("rij,rj->ri", cs.Eb, hnf, precision="high")
    return jnp.transpose(y.reshape(nS, 2, nm), (1, 0, 2))


def _sparse_coarse_pc(cs: SparseCoarseSpace, r: jax.Array) -> jax.Array:
    """Block-Jacobi: z_r = Pinv_r r_r per superdomain, both sides stacked."""
    nm = r.shape[2]
    rr = jnp.concatenate([r[0], r[1]], axis=1)  # (nS, 2nm)
    z = jnp.einsum("rij,rj->ri", cs.Pinv, rr, precision="high")
    return jnp.stack([z[:, :nm], z[:, nm:]])


def _restrict_scaled(cs, params, v, n_own):
    """g = dscale * Z^T v as (2, nS, nm)."""
    from .ddh import _read_traces

    nS = cs.dscale.shape[1] if isinstance(cs, SparseCoarseSpace) else None
    if nS is None:
        nm = cs.V.shape[2]
        nS = cs.Einv.shape[0] // (2 * nm)
    n_lambda = v.shape[0] // 2
    lam0, mu0 = _read_traces(params, v, n_lambda, n_own)  # (ndom, pf) masked
    dt = cs.V.dtype
    gl = jax.ops.segment_sum(
        jnp.einsum("dkj,dk->dj", cs.V, lam0.astype(dt)), cs.sd, num_segments=nS
    )
    gm = jax.ops.segment_sum(
        jnp.einsum("dkj,dk->dj", cs.V, mu0.astype(dt)), cs.sd, num_segments=nS
    )
    return jnp.stack([gl, gm])


def _prolong_scaled(cs, h2, v_dtype, n_lambda, n_own):
    """q = Z (dscale * h) from h as (2, nS, nm)."""
    hl = h2[0][cs.sd]  # (ndom, nm)
    hm = h2[1][cs.sd]
    zl = jnp.einsum("dkj,dj->dk", cs.V, hl)
    zm = jnp.einsum("dkj,dj->dk", cs.V, hm)
    n_lost = n_lambda - n_own
    tail = jnp.zeros(n_lost, dtype=v_dtype)
    return jnp.concatenate(
        [zl.reshape(-1).astype(v_dtype), tail, zm.reshape(-1).astype(v_dtype), tail]
    )


def coarse_apply(
    cs,
    params,
    v: jax.Array,
    n_own: int,
    *,
    solve_m: int = 40,
    solve_maxit: int = 4,
    solve_tol: float = 1e-3,
    solve_opts: dict | None = None,
) -> jax.Array:
    """q = Z E^{-1} Z^T v on the device (jittable).

    ``params`` is the DDHParams of the owning DDH (for the trace layout).
    Dispatches on the space type: dense ``CoarseSpace`` applies the stored
    inverse; ``SparseCoarseSpace`` runs block-Jacobi-preconditioned GMRES on
    the block-sparse coarse matrix (``solve_*`` control that inner solve --
    an approximate coarse solve is fine under the flexible outer FGMRES).
    """
    n_lambda = v.shape[0] // 2
    g2 = _restrict_scaled(cs, params, v, n_own)
    if isinstance(cs, SparseCoarseSpace):
        from .gmres import gmres as _gmres

        shape = g2.shape
        g2 = g2 * cs.dscale

        def mv(x):
            return _sparse_coarse_matvec(cs, x.reshape(shape)).reshape(-1)

        def pc(x):
            return _sparse_coarse_pc(cs, x.reshape(shape)).reshape(-1)

        # deferred + single-pass CGS: the coarse solve sits near the
        # device's small-kernel serialization floor (~1 ms/step at nc~3e5;
        # measured docs/run_coarse_microbench.py), so removing the per-step
        # Givens/early-exit chain buys ~6% and the loose tol (default 1e-3,
        # study 3e-2) under the flexible outer FGMRES tolerates the CGS1
        # orthogonalisation.  ``unroll`` is measurably WORSE here (the 20
        # distinctly-shaped growing-slice matmuls beat the one masked
        # (m+1, nc) shape only for small n; at nc~3e5: 71 ms vs 49 ms per
        # apply, 19 s extra compile) -- keep the rolled loop.
        igo = {"deferred": True, "unroll": False, "reorth": False}
        if solve_opts is not None:
            igo = solve_opts
        out = _gmres(
            mv, g2.reshape(-1), precond=pc, m=solve_m, maxit=solve_maxit,
            tol=solve_tol, **igo,
        )
        h2 = out.x.reshape(shape) * cs.dscale
    else:
        nm = cs.V.shape[2]
        nS = cs.Einv.shape[0] // (2 * nm)
        g = jnp.concatenate([g2[0].reshape(-1), g2[1].reshape(-1)]) * cs.dscale
        h = (cs.Einv @ g) * cs.dscale
        h2 = jnp.stack([h[: nS * nm].reshape(nS, nm), h[nS * nm :].reshape(nS, nm)])
    return _prolong_scaled(cs, h2, v.dtype, n_lambda, n_own)
