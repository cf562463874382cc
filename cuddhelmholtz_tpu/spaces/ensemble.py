"""Ensemble (subdomain) function spaces for domain decomposition.

Capability parity with the reference ``EnsembleSpace``
(``/root/reference/source/EnsembleSpace.cpp``): partition the mesh by
per-element labels and build, per subdomain (padded to max sizes with -1):

  * element lists and local DOF numberings (``local_dofs``/``sizes``),
  * subspace -> global DOF maps (``gI``),
  * interface+boundary face lists and face-space numberings (``fI``/``pI``),
  * the global connectivity map ``cmap`` pairing shared interface face-DOFs
    between subdomains (each shared DOF appears exactly once).

On TPU these padded tables drive the batched-over-subdomains DDH kernel; the
``cmap`` is the static neighbour graph for the interface (lambda) exchange.
"""

from __future__ import annotations

import numpy as np

from .h1 import H1Space, first_occurrence_unique, side_to_volume


class EnsembleSpace:
    def __init__(self, space: H1Space, n_domains: int, element_labels: np.ndarray):
        labels = np.asarray(element_labels, dtype=np.int64).reshape(-1)
        mesh = space.mesh
        nb = space.n_basis
        nel = mesh.n_elem
        if labels.shape[0] != nel:
            raise ValueError("element_labels must have one entry per element")
        if labels.min() < 0 or labels.max() >= n_domains:
            raise ValueError("element labels out of range")

        self.space = space
        self.n_domains = n_domains
        self.n_basis = nb

        # --- elements per subdomain (ascending global order) ----------------
        order = np.argsort(labels, kind="stable")
        counts = np.bincount(labels, minlength=n_domains)
        if counts.min() < 1:
            raise ValueError("every subdomain needs at least one element")
        self.n_elems = counts.astype(np.int32)
        mx_elems = int(counts.max())
        self.mx_elems = mx_elems
        self.elems = np.full((n_domains, mx_elems), -1, dtype=np.int32)
        el2s = np.zeros(nel, dtype=np.int32)  # global element -> local index
        start = 0
        offsets = np.zeros(n_domains + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        for p in range(n_domains):
            els = order[offsets[p] : offsets[p + 1]]
            self.elems[p, : len(els)] = els
            el2s[els] = np.arange(len(els))
        self.el2s = el2s

        # --- faces per subdomain (global edge-id order) ---------------------
        # a subdomain face is a boundary edge of one of its elements, or an
        # interior edge whose two elements have different labels
        faces_per_dom: list[list[tuple[int, int]]] = [[] for _ in range(n_domains)]
        shared_faces: list[tuple[int, int, int, int]] = []  # (S0, S1, l0, l1)
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
        self.n_faces = np.array([len(f) for f in faces_per_dom], dtype=np.int32)
        mx_faces = int(self.n_faces.max()) if n_domains else 0
        self.mx_faces = mx_faces
        self.faces = np.full((n_domains, mx_faces), -1, dtype=np.int32)
        self.face_side = np.full((n_domains, mx_faces), -1, dtype=np.int32)
        for p, fl in enumerate(faces_per_dom):
            for i, (e, side) in enumerate(fl):
                self.faces[p, i] = e
                self.face_side[p, i] = side

        # --- subspace DOF numbering (first occurrence over el, iy, ix) ------
        sizes = np.zeros(n_domains, dtype=np.int32)
        local_lists = []
        g_lists = []
        for p in range(n_domains):
            nelp = counts[p]
            gels = self.elems[p, :nelp]
            g_ids = space.dofs[gels]  # (nelp, nb, nb) traversal: el, iy, ix
            uniq, inv = first_occurrence_unique(g_ids.reshape(-1))
            local_lists.append(inv.reshape(nelp, nb, nb))
            g_lists.append(uniq)
            sizes[p] = len(uniq)
        self.sizes = sizes
        self.mx_ndof = int(sizes.max())
        self.local_dofs = np.full((n_domains, mx_elems, nb, nb), -1, dtype=np.int32)
        self.gI = np.full((n_domains, self.mx_ndof), -1, dtype=np.int32)
        for p in range(n_domains):
            self.local_dofs[p, : counts[p]] = local_lists[p]
            self.gI[p, : sizes[p]] = g_lists[p]

        # --- face-space numbering -------------------------------------------
        fsizes = np.zeros(n_domains, dtype=np.int32)
        fI_lists = []
        pI_lists = []
        for p in range(n_domains):
            nf = self.n_faces[p]
            if nf == 0:
                fI_lists.append(np.zeros((0, nb), dtype=np.int64))
                pI_lists.append(np.zeros(0, dtype=np.int64))
                continue
            es = self.faces[p, :nf]
            sides = self.face_side[p, :nf]
            g_el = ee[es, sides]
            s = mesh.edge_sides[es, sides]
            rev = (sides == 1) & (mesh.edge_delta[es] < 0)
            i = np.arange(nb)
            J = np.where(rev[:, None], nb - 1 - i[None, :], i[None, :])
            ix, iy = side_to_volume(J, s[:, None], nb)
            sub_idx = self.local_dofs[p, el2s[g_el][:, None], iy, ix]  # (nf, nb)
            uniq, inv = first_occurrence_unique(sub_idx.reshape(-1))
            fI_lists.append(inv.reshape(nf, nb))
            pI_lists.append(uniq)
            fsizes[p] = len(uniq)
        self.fsizes = fsizes
        self.mx_fdof = int(fsizes.max()) if n_domains else 0
        self.fI = np.full((n_domains, mx_faces, nb), -1, dtype=np.int32)
        self.pI = np.full((n_domains, self.mx_fdof), -1, dtype=np.int32)
        for p in range(n_domains):
            if self.n_faces[p]:
                self.fI[p, : self.n_faces[p]] = fI_lists[p]
            self.pI[p, : fsizes[p]] = pI_lists[p]

        # --- connectivity map: unique shared face-DOF pairs ------------------
        seen: dict[int, set[int]] = {}
        cmap_rows = []
        for S0, S1, l0, l1 in shared_faces:
            key = min(S0, S1) + n_domains * max(S0, S1)
            bucket = seen.setdefault(key, set())
            for i in range(nb):
                j0 = int(self.fI[S0, l0, i])
                j1 = int(self.fI[S1, l1, i])
                lkey = j0 if S0 < S1 else j1
                if lkey not in bucket:
                    bucket.add(lkey)
                    cmap_rows.append((S0, S1, j0, j1))
        self.cmap = (
            np.array(cmap_rows, dtype=np.int32)
            if cmap_rows
            else np.zeros((0, 4), dtype=np.int32)
        )
        self.n_shared_dofs = len(cmap_rows)

    def __repr__(self) -> str:
        return (
            f"EnsembleSpace(n_domains={self.n_domains}, mx_ndof={self.mx_ndof}, "
            f"mx_fdof={self.mx_fdof}, n_shared={self.n_shared_dofs})"
        )


def structured_labels(nx: int, ny: int, elems_per_dom_x: int, elems_per_dom_y: int):
    """Element labels for a uniform_rect mesh: square blocks of elements.

    Element el = i + nx*j gets label (i // ex) + ndx * (j // ey), matching the
    reference's DDH partitioner (``DDH.cpp:346-356``).
    """
    if nx % elems_per_dom_x or ny % elems_per_dom_y:
        raise ValueError("nx, ny must be multiples of the block size")
    ndx = nx // elems_per_dom_x
    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    lab = (i // elems_per_dom_x) + ndx * (j // elems_per_dom_y)
    return lab.T.reshape(-1), ndx * (ny // elems_per_dom_y)


def coordinate_bisection_labels(mesh, n_target: int) -> tuple[np.ndarray, int]:
    """Partition an arbitrary mesh into ~n_target subdomains by recursive
    coordinate bisection of element centroids (generalises DDH beyond
    uniform_rect, which the reference requires at ``DDH.cpp:333-344``)."""
    cent = mesh.element_corner_coords().mean(axis=1)  # (nel, 2)
    parts = [np.arange(mesh.n_elem)]
    while len(parts) < n_target:
        # split the largest part along its wider coordinate extent
        sizes = [len(p) for p in parts]
        k = int(np.argmax(sizes))
        part = parts.pop(k)
        if len(part) <= 1:
            parts.append(part)
            break
        c = cent[part]
        span = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(span))
        med = np.median(c[:, axis])
        lo = part[c[:, axis] <= med]
        hi = part[c[:, axis] > med]
        if len(lo) == 0 or len(hi) == 0:
            order = np.argsort(c[:, axis], kind="stable")
            half = len(part) // 2
            lo, hi = part[order[:half]], part[order[half:]]
        parts.extend([lo, hi])
    labels = np.zeros(mesh.n_elem, dtype=np.int64)
    for p, els in enumerate(parts):
        labels[els] = p
    return labels, len(parts)
