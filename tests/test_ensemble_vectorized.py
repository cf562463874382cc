"""Pin the vectorised EnsembleSpace build against a per-domain loop oracle.

The production constructor builds every table with batched first-occurrence
passes (no Python loops over edges or domains).  This oracle is the
straightforward loop transliteration of the reference's per-subdomain build
(``/root/reference/source/EnsembleSpace.cpp:11-287``); all tables must match
bit-for-bit on structured, strip, and unstructured partitions.
"""

import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.spaces.ensemble import (
    EnsembleSpace,
    coordinate_bisection_labels,
    structured_labels,
)
from cuddhelmholtz_tpu.spaces.h1 import H1Space, first_occurrence_unique, side_to_volume
from cuddhelmholtz_tpu.utils.basis import Basis


def loop_tables(space, n_domains, element_labels):
    """Reference loop build: returns the table dict to compare against."""
    labels = np.asarray(element_labels, dtype=np.int64).reshape(-1)
    mesh = space.mesh
    nb = space.n_basis
    nel = mesh.n_elem

    order = np.argsort(labels, kind="stable")
    counts = np.bincount(labels, minlength=n_domains)
    mx_elems = int(counts.max())
    elems = np.full((n_domains, mx_elems), -1, dtype=np.int32)
    el2s = np.zeros(nel, dtype=np.int32)
    offsets = np.zeros(n_domains + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    for p in range(n_domains):
        els = order[offsets[p] : offsets[p + 1]]
        elems[p, : len(els)] = els
        el2s[els] = np.arange(len(els))

    faces_per_dom = [[] for _ in range(n_domains)]
    shared_faces = []
    ee = mesh.edge_elements
    for e in range(mesh.n_edges):
        el0, el1 = ee[e]
        S0 = labels[el0]
        if el1 < 0:
            faces_per_dom[S0].append((e, 0))
        else:
            S1 = labels[el1]
            if S0 != S1:
                faces_per_dom[S0].append((e, 0))
                faces_per_dom[S1].append((e, 1))
                shared_faces.append(
                    (S0, S1, len(faces_per_dom[S0]) - 1, len(faces_per_dom[S1]) - 1)
                )
    n_faces = np.array([len(f) for f in faces_per_dom], dtype=np.int32)
    mx_faces = int(n_faces.max()) if n_domains else 0
    faces = np.full((n_domains, mx_faces), -1, dtype=np.int32)
    face_side = np.full((n_domains, mx_faces), -1, dtype=np.int32)
    for p, fl in enumerate(faces_per_dom):
        for i, (e, side) in enumerate(fl):
            faces[p, i] = e
            face_side[p, i] = side

    sizes = np.zeros(n_domains, dtype=np.int32)
    local_lists, g_lists = [], []
    for p in range(n_domains):
        gels = elems[p, : counts[p]]
        g_ids = space.dofs[gels]
        uniq, inv = first_occurrence_unique(g_ids.reshape(-1))
        local_lists.append(inv.reshape(counts[p], nb, nb))
        g_lists.append(uniq)
        sizes[p] = len(uniq)
    mx_ndof = int(sizes.max())
    local_dofs = np.full((n_domains, mx_elems, nb, nb), -1, dtype=np.int32)
    gI = np.full((n_domains, mx_ndof), -1, dtype=np.int32)
    for p in range(n_domains):
        local_dofs[p, : counts[p]] = local_lists[p]
        gI[p, : sizes[p]] = g_lists[p]

    fsizes = np.zeros(n_domains, dtype=np.int32)
    fI_lists, pI_lists = [], []
    for p in range(n_domains):
        nf = n_faces[p]
        if nf == 0:
            fI_lists.append(np.zeros((0, nb), dtype=np.int64))
            pI_lists.append(np.zeros(0, dtype=np.int64))
            continue
        es = faces[p, :nf]
        sides = face_side[p, :nf]
        g_el = ee[es, sides]
        s = mesh.edge_sides[es, sides]
        rev = (sides == 1) & (mesh.edge_delta[es] < 0)
        i = np.arange(nb)
        J = np.where(rev[:, None], nb - 1 - i[None, :], i[None, :])
        ix, iy = side_to_volume(J, s[:, None], nb)
        sub_idx = local_dofs[p, el2s[g_el][:, None], iy, ix]
        uniq, inv = first_occurrence_unique(sub_idx.reshape(-1))
        fI_lists.append(inv.reshape(nf, nb))
        pI_lists.append(uniq)
        fsizes[p] = len(uniq)
    mx_fdof = int(fsizes.max()) if n_domains else 0
    fI = np.full((n_domains, mx_faces, nb), -1, dtype=np.int32)
    pI = np.full((n_domains, mx_fdof), -1, dtype=np.int32)
    for p in range(n_domains):
        if n_faces[p]:
            fI[p, : n_faces[p]] = fI_lists[p]
        pI[p, : fsizes[p]] = pI_lists[p]

    seen = {}
    cmap_rows = []
    for S0, S1, l0, l1 in shared_faces:
        key = min(S0, S1) + n_domains * max(S0, S1)
        bucket = seen.setdefault(key, set())
        for i in range(nb):
            j0 = int(fI[S0, l0, i])
            j1 = int(fI[S1, l1, i])
            lkey = j0 if S0 < S1 else j1
            if lkey not in bucket:
                bucket.add(lkey)
                cmap_rows.append((S0, S1, j0, j1))
    cmap = (
        np.array(cmap_rows, dtype=np.int32)
        if cmap_rows
        else np.zeros((0, 4), dtype=np.int32)
    )
    return dict(
        elems=elems, el2s=el2s, n_faces=n_faces, faces=faces, face_side=face_side,
        sizes=sizes, local_dofs=local_dofs, gI=gI, fsizes=fsizes, fI=fI, pI=pI,
        cmap=cmap,
    )


CASES = []


def _case(name):
    def reg(fn):
        CASES.append(pytest.param(fn, id=name))
        return fn

    return reg


@_case("structured-4x4")
def _c1():
    mesh = Mesh2D.uniform_rect(8, -1, 1, 8, -1, 1)
    labels, nd = structured_labels(8, 8, 2, 2)
    return mesh, labels, nd


@_case("strips-uneven")
def _c2():
    nx = 9
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    i, _ = np.meshgrid(np.arange(nx), np.arange(nx), indexing="ij")
    labels = np.minimum(i // 2, 3).T.reshape(-1)
    return mesh, labels, 4


@_case("unstructured-bisection")
def _c3():
    mesh = load_unstructured_square()
    labels, nd = coordinate_bisection_labels(mesh, 7)
    return mesh, labels, nd


@pytest.mark.parametrize("case", CASES)
def test_vectorized_matches_loops(case):
    mesh, labels, nd = case()
    fem = H1Space(mesh, Basis(4))
    efem = EnsembleSpace(fem, nd, labels)
    want = loop_tables(fem, nd, labels)
    for name, w in want.items():
        got = getattr(efem, name)
        np.testing.assert_array_equal(got, w, err_msg=name)
    assert efem.n_shared_dofs == len(want["cmap"])


def test_bisection_underpartition_warns():
    mesh = Mesh2D.uniform_rect(2, -1, 1, 2, -1, 1)  # 4 elements
    with pytest.warns(UserWarning, match="exhausted"):
        labels, nd = coordinate_bisection_labels(mesh, 9)
    assert nd == 4


def test_setup_speed_4096_domains():
    """The vectorised build stays sub-second at 4096 domains (the loop build
    took ~4 s at 1024 domains)."""
    import os
    import time

    nx = 128
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(4))
    labels, nd = structured_labels(nx, nx, 2, 2)
    assert nd == 4096
    t0 = time.perf_counter()
    efem = EnsembleSpace(fem, nd, labels)
    dt = time.perf_counter() - t0
    assert efem.n_domains == 4096
    # generous bound (measured ~0.4 s idle): catches an accidental return to
    # the per-edge Python loops (~4 s) without flaking on loaded CI hosts.
    # CUDDH_STRICT_PERF=1 tightens it for dedicated perf runs.
    limit = 2.5 if os.environ.get("CUDDH_STRICT_PERF") else 10.0
    assert dt < limit, f"EnsembleSpace setup took {dt:.2f}s at 4096 domains"
