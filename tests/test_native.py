"""Native (C++) topology kernels must match the NumPy reference paths."""

import os

import numpy as np
import pytest

from cuddhelmholtz_tpu import native
from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _numpy_mesh(vertices, elems):
    os.environ["CUDDH_NATIVE"] = "0"
    native._tried, native._lib = True, None
    try:
        return Mesh2D(vertices, elems)
    finally:
        os.environ["CUDDH_NATIVE"] = "1"
        native._tried = False


def _numpy_space(mesh, nb):
    os.environ["CUDDH_NATIVE"] = "0"
    native._tried, native._lib = True, None
    try:
        return H1Space(mesh, Basis(nb))
    finally:
        os.environ["CUDDH_NATIVE"] = "1"
        native._tried = False


@pytest.mark.parametrize("mesh_kind", ["structured", "unstructured"])
def test_native_edges_match_numpy(mesh_kind):
    if mesh_kind == "structured":
        ref = Mesh2D.uniform_rect(7, -1, 1, 5, 0, 2)
    else:
        ref = load_unstructured_square()
    np_mesh = _numpy_mesh(ref.vertices, ref.elem_vertices)
    assert np.array_equal(ref.edge_vertices, np_mesh.edge_vertices)
    assert np.array_equal(ref.edge_elements, np_mesh.edge_elements)
    assert np.array_equal(ref.edge_sides, np_mesh.edge_sides)
    assert np.array_equal(ref.edge_delta, np_mesh.edge_delta)
    assert np.array_equal(ref.boundary_edges, np_mesh.boundary_edges)


@pytest.mark.parametrize("nb", [2, 3, 4, 6])
@pytest.mark.parametrize("mesh_kind", ["structured", "unstructured"])
def test_native_h1_matches_numpy(mesh_kind, nb):
    if mesh_kind == "structured":
        mesh = Mesh2D.uniform_rect(6, -1, 1, 4, -1, 1)
    else:
        mesh = load_unstructured_square()
    fem = H1Space(mesh, Basis(nb))
    ref = _numpy_space(mesh, nb)
    assert fem.ndof == ref.ndof
    assert np.array_equal(fem.dofs, ref.dofs)
    assert np.allclose(fem.coords, ref.coords)
