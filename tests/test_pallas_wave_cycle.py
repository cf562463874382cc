"""Interpret-mode CI coverage for the Pallas WaveHoltz kernel.

The production TPU fast path (``ops/pallas/wave_cycle.py`` — the redesign of
the reference's hottest kernel, ``DDH.cpp:111-321``) is normally only
exercised on real hardware; here the same kernel runs through the Pallas
interpreter on the CPU mesh and must agree with the XLA scan cycle for both
precision branches (the manual 3-pass bf16 split and a plain fp32 pass).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.ops.pallas.wave_cycle import wave_cycle_pallas
from cuddhelmholtz_tpu.solvers.ddh import DDH, _wave_cycle_xla
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis


@pytest.fixture(scope="module")
def small_params():
    nx, deg = 8, 3
    omega = 2 * np.pi * nx / 2.5  # nt = 200 at the CFL-limited dt
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(deg + 1))
    rng = np.random.default_rng(0)
    a_nodal = 1.0 + 0.2 * rng.random(fem.ndof)
    ddh = DDH(omega, a_nodal, fem, nx=nx, ny=nx, block_size=8)
    assert ddh.shared_S  # the Pallas path requires the shared-S case
    ndom, pad = ddh.params.Ha.shape
    F = (rng.standard_normal((ndom, pad)) * np.asarray(ddh.params.gmask)).astype(
        np.float32
    )
    G = (rng.standard_normal((ndom, pad)) * np.asarray(ddh.params.gmask)).astype(
        np.float32
    )
    return ddh.params, jnp.asarray(F), jnp.asarray(G)


@pytest.mark.parametrize("precision", ["high", "default"])
def test_interpret_matches_xla(small_params, precision):
    params, F, G = small_params
    u_x, v_x = _wave_cycle_xla(params, F, G, 5, precision="highest")
    u_p, v_p = wave_cycle_pallas(params, F, G, wh_maxit=5, precision=precision, interpret=True)
    scale = float(jnp.abs(u_x).max())
    # "high" = 3-pass bf16 split (fp32-grade); "default" = 1 bf16 pass, which
    # carries the documented ~1e-3 noise floor over the long cycle
    tol = 2e-4 if precision == "high" else 5e-2
    err_u = float(jnp.abs(u_p - u_x).max()) / scale
    err_v = float(jnp.abs(v_p - v_x).max()) / max(float(jnp.abs(v_x).max()), 1e-30)
    assert err_u < tol, (precision, err_u)
    assert err_v < tol, (precision, err_v)
    # and the split must be materially tighter than a single bf16 pass
    if precision == "high":
        assert err_u < 1e-3


@pytest.fixture(scope="module")
def per_domain_params():
    """A jittered structured mesh: every subdomain assembles a DIFFERENT
    stiffness matrix, exercising the per-domain-S kernel path (grid-indexed
    (DB, pad, pad) stacks in VMEM) that unstructured partitions and
    heterogeneous coefficients hit in production."""
    nx, deg = 8, 3
    omega = 2 * np.pi * nx / 2.5
    mesh0 = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    rng = np.random.default_rng(3)
    verts = mesh0.vertices.copy()
    interior = (np.abs(np.abs(verts[:, 0]) - 1.0) > 1e-12) & (
        np.abs(np.abs(verts[:, 1]) - 1.0) > 1e-12
    )
    verts[interior] += 0.15 * (2.0 / nx) * rng.uniform(-1, 1, (interior.sum(), 2))
    mesh = Mesh2D.from_vertices(verts, mesh0.elem_vertices)
    fem = H1Space(mesh, Basis(deg + 1))
    a_nodal = 1.0 + 0.2 * rng.random(fem.ndof)
    ddh = DDH(omega, a_nodal, fem, nx=nx, ny=nx, block_size=8, nt_override=60)
    assert not ddh.shared_S and ddh.params.S.ndim == 3
    ndom, pad = ddh.params.Ha.shape
    F = (rng.standard_normal((ndom, pad)) * np.asarray(ddh.params.gmask)).astype(
        np.float32
    )
    G = (rng.standard_normal((ndom, pad)) * np.asarray(ddh.params.gmask)).astype(
        np.float32
    )
    return ddh.params, jnp.asarray(F), jnp.asarray(G)


@pytest.mark.parametrize("precision", ["high", "default"])
def test_interpret_per_domain_matches_xla(per_domain_params, precision):
    params, F, G = per_domain_params
    u_x, v_x = _wave_cycle_xla(params, F, G, 5, precision="highest")
    u_p, v_p = wave_cycle_pallas(
        params, F, G, wh_maxit=5, precision=precision, interpret=True
    )
    scale = float(jnp.abs(u_x).max())
    tol = 2e-4 if precision == "high" else 5e-2
    err_u = float(jnp.abs(u_p - u_x).max()) / scale
    err_v = float(jnp.abs(v_p - v_x).max()) / max(float(jnp.abs(v_x).max()), 1e-30)
    assert err_u < tol, (precision, err_u)
    assert err_v < tol, (precision, err_v)


def test_interpret_per_domain_blocking_and_padding(per_domain_params):
    """Per-domain blocking (ndom=16, DB=8: two grid steps); each block must
    read ITS OWN stiffness stack (grid-position indexing) and the result
    must match the single-block run."""
    params, F, G = per_domain_params
    assert params.Ha.shape[0] == 16
    u_a, v_a = wave_cycle_pallas(F=F, G=G, params=params, wh_maxit=2, interpret=True)
    u_b, v_b = wave_cycle_pallas(
        F=F, G=G, params=params, wh_maxit=2, block_domains=8, interpret=True
    )
    assert not np.array_equal(np.asarray(u_b), np.zeros_like(np.asarray(u_b)))
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_a), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_a), rtol=0, atol=1e-5)


def test_interpret_grouped_matches_xla(per_domain_params):
    """The grouped per-domain layout (contiguous row runs sharing one
    matrix, S selected by grid position -- the production precompute path)
    matches the XLA cycle."""
    params, F, G = per_domain_params
    gs = 8
    grouped = params._replace(
        Ha=jnp.repeat(params.Ha, gs, axis=0),
        inv_mi=jnp.repeat(params.inv_mi, gs, axis=0),
    )
    Fg = jnp.repeat(F, gs, axis=0)
    Gg = jnp.repeat(G, gs, axis=0)
    u_g, v_g = wave_cycle_pallas(
        grouped, Fg, Gg, wh_maxit=3, precision="high", interpret=True,
        s_group_size=gs,
    )
    u_x, v_x = _wave_cycle_xla(params, F, G, 3, precision="highest")
    # every row in a group repeats the same computation
    np.testing.assert_allclose(
        np.asarray(u_g[::gs]), np.asarray(u_g[gs - 1 :: gs]), rtol=0, atol=0
    )
    scale = float(jnp.abs(u_x).max())
    err = float(jnp.abs(u_g[::gs] - u_x).max()) / scale
    assert err < 2e-4, err


def test_interpret_blocking_and_padding(small_params):
    """Domain-batch blocking (several grid steps) and padding rows must not
    change the result."""
    params, F, G = small_params
    u_a, v_a = wave_cycle_pallas(F=F, G=G, params=params, wh_maxit=2, interpret=True)
    u_b, v_b = wave_cycle_pallas(
        F=F, G=G, params=params, wh_maxit=2, block_domains=6, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_a), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_a), rtol=0, atol=1e-5)


def test_wave_cycle_routes_per_row_stacks_to_grouped_kernel(
    per_domain_params, monkeypatch
):
    """`_wave_cycle` with a per-ROW S stack (the solve-path rhs/postprocess
    cycles on no-dedup unstructured partitions) must tile rows x8 and take
    the grouped VMEM kernel, NOT the XLA scan that re-streams the whole S
    stack from HBM every leapfrog step (10.5 s -> 1.6 s per cycle at the L4
    config, PERF.md r04) -- and the result must match the XLA cycle."""
    from cuddhelmholtz_tpu.ops.pallas import wave_cycle as wc
    from cuddhelmholtz_tpu.solvers.ddh import _wave_cycle

    params, F, G = per_domain_params
    seen = {}
    real = wc.wave_cycle_pallas

    def spy(p, Fb, Gb, **kw):
        seen["s_group_size"] = kw.get("s_group_size")
        seen["rows"] = Fb.shape[0]
        return real(p, Fb, Gb, **dict(kw, interpret=True))

    monkeypatch.setattr(wc, "wave_cycle_pallas", spy)
    u, v = _wave_cycle(params, F, G, 3, use_pallas=True)
    assert seen["s_group_size"] == 8
    assert seen["rows"] == 8 * F.shape[0]
    assert u.shape == F.shape
    u_x, v_x = _wave_cycle_xla(params, F, G, 3, precision="highest")
    scale = float(jnp.abs(u_x).max())
    assert float(jnp.abs(u - u_x).max()) / scale < 2e-4
    assert float(jnp.abs(v - v_x).max()) / max(
        float(jnp.abs(v_x).max()), 1e-30
    ) < 2e-4
