"""The fitted Mosaic scoped-VMEM model and its compile-failure fallback ladder.

The grouped Pallas wave cycle sizes its row blocks with a single fitted model
(``ops/pallas/wave_cycle.grouped_vmem_rows``); a Mosaic version bump that
shifts its scoped-vmem accounting surfaces as a compile failure, which the
DDH precompute loops must catch and step down from (halve the chunk, then
fall back to the XLA scan) instead of crashing -- VERDICT r03 weak #4 / next
item 6.  No TPU is needed: the ladder and model are host logic.
"""

import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.spaces.ensemble import coordinate_bisection_labels
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis


def test_grouped_vmem_rows_model():
    from cuddhelmholtz_tpu.ops.pallas.wave_cycle import grouped_vmem_rows

    # flagship shape (pad 256): the proven DB=512 block must be admitted
    assert grouped_vmem_rows(256) >= 512
    # pad 640 (block-32 subdomains): DB=512 overflowed on hardware (22.3 MB
    # of the 16 MB stack, PERF.md); the model must cap below it
    r640 = grouped_vmem_rows(640)
    assert 8 <= r640 < 512 and r640 % 8 == 0
    # a tiny budget admits nothing (caller must take the XLA path)
    assert grouped_vmem_rows(640, budget=1 << 10) == 0


def test_vmem_fallback_step_unit():
    from cuddhelmholtz_tpu.solvers.ddh import _vmem_fallback_step

    oom = RuntimeError("RESOURCE_EXHAUSTED: Mosaic scoped vmem limit exceeded")
    # halve while the chunk can shrink, keep the grouped path
    assert _vmem_fallback_step(oom, True, 64) == (32, True)
    assert _vmem_fallback_step(oom, True, 16) == (8, True)
    # at the floor, drop to the XLA path
    assert _vmem_fallback_step(oom, True, 8) == (8, False)
    # non-VMEM failures and XLA-path failures re-raise
    assert _vmem_fallback_step(RuntimeError("boom"), True, 64) is None
    assert _vmem_fallback_step(oom, False, 64) is None


def test_kernel_admission_falls_back_to_xla(monkeypatch):
    """With a forced-tiny budget the kernel itself refuses the oversized
    grouped block and returns the XLA-scan result (identical numbers)."""
    import jax.numpy as jnp

    from cuddhelmholtz_tpu.ops.pallas import wave_cycle as wc
    from cuddhelmholtz_tpu.solvers.ddh import DDHParams, _wave_cycle_xla

    rng = np.random.default_rng(0)
    nu, c, pad, nt = 2, 8, 128, 7
    ndom = nu * c
    S_u = jnp.asarray(rng.standard_normal((nu, pad, pad)), jnp.float32) * 0.01
    mkrows = lambda: jnp.asarray(rng.standard_normal((ndom, pad)), jnp.float32)
    tables = jnp.asarray(rng.standard_normal((nt, 5)), jnp.float32) * 0.1
    z = jnp.zeros((ndom, pad), jnp.float32)
    zi = jnp.zeros((ndom, pad), jnp.int32)
    params = DDHParams(
        S=S_u, gI=zi, gmask=z, F_weight=z, Ha=mkrows() ** 2, inv_mi=mkrows() ** 2,
        m_gmi=z, fslot=zi[:, :8], Hf=z[:, :8], a2wf=z[:, :8], B0=zi[:, :8],
        B1=zi[:, :8], tables=tables, K0=jnp.float32(0.5), dt=jnp.float32(0.01),
        omega=jnp.float32(1.0),
    )
    F, G = mkrows(), mkrows()

    monkeypatch.setattr(wc, "VMEM_BUDGET", 1 << 10)
    u, v = wc.wave_cycle_pallas(params, F, G, wh_maxit=2, s_group_size=c)
    # reference: the XLA cycle with the per-domain stack expanded
    S_full = jnp.repeat(S_u, c, axis=0)
    u_ref, v_ref = _wave_cycle_xla(params._replace(S=S_full), F, G, 2, "highest")
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=2e-4, atol=1e-6)


def test_probe_compile_payload_no_large_constants(monkeypatch):
    """Probe-chunk jits must take the per-domain arrays as ARGUMENTS: a
    closed-over S stack is serialized into the HLO as a dense constant and
    blew the remote-compile tunnel's request-body limit at scale (HTTP 413
    at nu=1024, pad=384 -- the L4 unstructured run, PERF.md r04).  Spy on
    jax.jit and assert every traced probe program lowers to far less text
    than the S stack itself would occupy as an embedded literal."""
    import jax

    from cuddhelmholtz_tpu.solvers import ddh as ddh_mod

    mesh = load_unstructured_square()
    labels, nd = coordinate_bisection_labels(mesh, 8)
    fem = H1Space(mesh, Basis(4))
    d = ddh_mod.DDH(
        2 * np.pi * 0.8, np.ones(fem.ndof), fem,
        element_labels=labels, n_domains=nd, nt_override=20,
    )
    assert d.params.S.ndim == 3  # per-domain stiffness: the dangerous case
    s_bytes = int(np.prod(d.params.S.shape)) * 4

    real_jit = jax.jit
    sizes = []

    def spy_jit(f=None, **kw):
        if f is None:
            return lambda g: spy_jit(g, **kw)
        jf = real_jit(f, **kw)

        def wrapped(*a, **k):
            sizes.append(len(jf.lower(*a, **k).as_text()))
            return jf(*a, **k)

        return wrapped

    monkeypatch.setattr(jax, "jit", spy_jit)
    d.precompute_transfer()
    d.precompute_io_maps()
    assert sizes, "no probe jit was traced"
    # an embedded S literal alone costs >= 2 text chars/byte; argument-passed
    # state keeps the whole program orders of magnitude below that
    assert max(sizes) < min(s_bytes, 1 << 20), (max(sizes), s_bytes)


def test_precompute_vmem_fallback_ladder(monkeypatch):
    """A (simulated) Mosaic scoped-VMEM compile failure during the grouped
    transfer probes walks the ladder -- halve the chunk, then drop to the
    XLA path -- and still produces the correct transfer operator, with the
    actually-taken path recorded in transfer_stats."""
    from cuddhelmholtz_tpu.ops.pallas import wave_cycle as wc
    from cuddhelmholtz_tpu.solvers import ddh as ddh_mod

    mesh = load_unstructured_square()
    labels, nd = coordinate_bisection_labels(mesh, 4)
    fem = H1Space(mesh, Basis(4))
    omega = 2 * np.pi * 0.8
    a = np.ones(fem.ndof)

    mk = lambda: ddh_mod.DDH(
        omega, a, fem, element_labels=labels, n_domains=nd, nt_override=20
    )
    d_ref = mk()
    assert d_ref.params.S.ndim == 3  # per-domain stiffness (unstructured)
    T_ref = np.asarray(d_ref.precompute_transfer())

    d = mk()
    calls = []

    def fake_pallas(params, F, G, wh_maxit=wc.WH_MAXIT, block_domains=512,
                    precision="high", interpret=False, s_group_size=None):
        calls.append(s_group_size)
        if s_group_size is not None:
            raise RuntimeError(
                "Mosaic failed to compile TPU kernel: scoped vmem limit "
                "exceeded (simulated)"
            )
        return ddh_mod._wave_cycle_xla(params, F, G, wh_maxit, precision)

    monkeypatch.setattr(wc, "wave_cycle_pallas", fake_pallas)
    monkeypatch.setattr(ddh_mod.DDH, "_use_pallas", lambda self: True)
    T = np.asarray(d.precompute_transfer(chunk=32))
    # the grouped path was attempted, failed, and the ladder recorded the
    # XLA path as the one actually taken
    assert any(c is not None for c in calls)
    assert d.transfer_stats["transfer_used_group"] is False
    scale = np.abs(T_ref).max()
    np.testing.assert_allclose(T, T_ref, rtol=5e-5, atol=5e-5 * scale)
