"""EnsembleSpace invariants (the reference has no unit tests for these)."""

import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.spaces.ensemble import (
    EnsembleSpace,
    coordinate_bisection_labels,
    structured_labels,
)
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis


def _ensemble_structured(nx=8, nb=4, epd=4):
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(nb))
    labels, ndom = structured_labels(nx, nx, epd, epd)
    return fem, EnsembleSpace(fem, ndom, labels)


def test_structured_partition_counts():
    fem, es = _ensemble_structured()
    assert es.n_domains == 4
    assert (es.n_elems == 16).all()
    # each subdomain of 4x4 elements with nb=4 has (4*3+1)^2 = 169 DOFs
    assert (es.sizes == 169).all()
    # each 4x4-element subdomain has 4 edges per side on its boundary
    assert (es.n_faces == 16).all()


def test_gI_covers_all_dofs():
    fem, es = _ensemble_structured()
    got = np.unique(es.gI[es.gI >= 0])
    assert np.array_equal(got, np.arange(fem.ndof))


def test_local_dofs_consistent_with_global():
    fem, es = _ensemble_structured()
    for p in range(es.n_domains):
        nelp = es.n_elems[p]
        for el in range(nelp):
            g_el = es.elems[p, el]
            local = es.local_dofs[p, el]  # (nb, nb)
            assert np.array_equal(es.gI[p, local], fem.dofs[g_el])


def test_cmap_pairs_same_global_dof():
    fem, es = _ensemble_structured()
    assert es.n_shared_dofs > 0
    for S0, S1, j0, j1 in es.cmap:
        g0 = es.gI[S0, es.pI[S0, j0]]
        g1 = es.gI[S1, es.pI[S1, j1]]
        assert g0 == g1


def test_cmap_unique_per_pair():
    fem, es = _ensemble_structured()
    keys = set()
    for S0, S1, j0, j1 in es.cmap:
        k = (min(S0, S1), max(S0, S1), es.gI[S0, es.pI[S0, j0]])
        assert k not in keys
        keys.add(k)


def test_unstructured_bisection_partition():
    mesh = load_unstructured_square()
    fem = H1Space(mesh, Basis(4))
    labels, ndom = coordinate_bisection_labels(mesh, 8)
    es = EnsembleSpace(fem, ndom, labels)
    assert es.n_elems.sum() == mesh.n_elem
    got = np.unique(es.gI[es.gI >= 0])
    assert np.array_equal(got, np.arange(fem.ndof))
    for S0, S1, j0, j1 in es.cmap:
        assert es.gI[S0, es.pI[S0, j0]] == es.gI[S1, es.pI[S1, j1]]


def test_cut_sweep_bisection_reduces_interface():
    """cut_sweep bisection is a valid partition and never crosses MORE
    interior edges than median bisection on the fixture (cut edges become
    lambda unknowns, so fewer is strictly better for the DDH solve)."""
    mesh = load_unstructured_square()
    l0, n0 = coordinate_bisection_labels(mesh, 8)
    l1, n1 = coordinate_bisection_labels(mesh, 8, cut_sweep=7)
    assert n1 == 8 and np.array_equal(np.unique(l1), np.arange(8))
    iee = mesh.edge_elements[mesh.interior_edges]
    cut0 = int((l0[iee[:, 0]] != l0[iee[:, 1]]).sum())
    cut1 = int((l1[iee[:, 0]] != l1[iee[:, 1]]).sum())
    assert cut1 <= cut0
    # the sweep partition must still produce a consistent EnsembleSpace
    fem = H1Space(mesh, Basis(4))
    es = EnsembleSpace(fem, n1, l1)
    assert es.n_elems.sum() == mesh.n_elem
    got = np.unique(es.gI[es.gI >= 0])
    assert np.array_equal(got, np.arange(fem.ndof))


def test_cut_sweep_matches_structured_on_grid():
    """On a structured grid at matched counts, median bisection (and the
    sweep) recover the structured partitioner's interface size."""
    from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
    from cuddhelmholtz_tpu.spaces.ensemble import structured_labels

    mesh = Mesh2D.uniform_rect(16, -1, 1, 16, -1, 1)
    iee = mesh.edge_elements[mesh.interior_edges]
    sl, ndom = structured_labels(16, 16, 4, 4)
    cut_s = int((sl[iee[:, 0]] != sl[iee[:, 1]]).sum())
    for k in (0, 7):
        l, n = coordinate_bisection_labels(mesh, ndom, cut_sweep=k)
        assert n == ndom
        cut = int((l[iee[:, 0]] != l[iee[:, 1]]).sum())
        assert cut == cut_s
