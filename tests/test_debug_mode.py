"""CUDDH_DEBUG-analog validation mode.

Reference parity: the debug build bounds-checks every tensor access and
asserts in-kernel invariants (``/root/reference/include/Tensor.hpp:34-37``,
``source/DDH.cpp:162-164``).  Here the checks run as setup-time index-table
audits plus host-side finiteness checks, enabled by ``CUDDH_DEBUG=1``.
A corrupted table must raise instead of being silently masked.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.solvers.ddh import DDH
from cuddhelmholtz_tpu.spaces.ensemble import EnsembleSpace, structured_labels
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis
from cuddhelmholtz_tpu.utils.debug import check_finite, check_index_table


@pytest.fixture
def debug_on(monkeypatch):
    monkeypatch.setenv("CUDDH_DEBUG", "1")


@pytest.fixture
def small_space():
    mesh = Mesh2D.uniform_rect(4, -1, 1, 4, -1, 1)
    return mesh, H1Space(mesh, Basis(4))


def test_checks_are_noops_when_disabled(monkeypatch, small_space):
    monkeypatch.delenv("CUDDH_DEBUG", raising=False)
    check_index_table("t", np.array([99]), 3)  # out of range, but flag off
    check_finite("x", np.array([np.nan]))


def test_valid_setup_passes_audit(debug_on, small_space):
    mesh, fem = small_space
    labels, nd = structured_labels(4, 4, 2, 2)
    efem = EnsembleSpace(fem, nd, labels)  # runs the audit internally
    DDH(2 * np.pi, np.ones(fem.ndof), fem, nx=4, ny=4, block_size=8, nt_override=4)
    assert efem.n_domains == nd


def test_corrupt_table_raises(debug_on, small_space):
    """An out-of-range entry in a padded index table raises in debug mode
    (without the flag it would be silently dropped by mode='drop' gathers)."""
    mesh, fem = small_space
    bad = fem.dofs.copy()
    bad[0, 0, 0] = fem.ndof + 7
    with pytest.raises(ValueError, match="index table"):
        check_index_table("H1Space.dofs", bad, fem.ndof, allow_pad=False)

    # end-to-end: corrupt the H1 numbering a constructor consumes (the
    # audit must fire at ENTRY — the vectorized build's dom*ndof+gid keys
    # would otherwise alias an out-of-range gid into the next domain)
    fem.dofs[0, 0, 0] = fem.ndof + 7
    labels, nd = structured_labels(4, 4, 2, 2)
    with pytest.raises(ValueError, match="dofs"):
        EnsembleSpace(fem, nd, labels)
    fem.dofs[0, 0, 0] = 0  # restore (fixture is function-scoped anyway)


def test_nonfinite_input_raises(debug_on, small_space):
    mesh, fem = small_space
    ddh = DDH(
        2 * np.pi, np.ones(fem.ndof), fem, nx=4, ny=4, block_size=8, nt_override=4
    )
    lam = jnp.zeros(ddh.size, jnp.float32).at[3].set(jnp.nan)
    with pytest.raises(FloatingPointError, match="non-finite"):
        ddh.action(lam)
