"""Mesh connectivity and DOF-map tests (structured + unstructured fixtures).

The reference has no direct unit tests for Mesh2D/H1Space (they are exercised
through the operator tests); here we add explicit invariants so regressions
localise.
"""

import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.mesh.mesh2d import BOUNDARY, INTERIOR, Mesh2D
from cuddhelmholtz_tpu.spaces.h1 import FaceSpace, H1Space
from cuddhelmholtz_tpu.utils.basis import Basis


def euler_ndof(mesh, nb):
    """Exact CG DOF count: interior nodes + edge interiors + vertices."""
    return (
        mesh.n_elem * (nb - 2) ** 2 + mesh.n_edges * (nb - 2) + mesh.n_vertices
    )


def test_uniform_rect_counts():
    mesh = Mesh2D.uniform_rect(4, -1, 1, 3, 0, 2)
    assert mesh.n_elem == 12
    assert mesh.n_vertices == 5 * 4
    # edges: horizontal 4*(3+1) + vertical (4+1)*3
    assert mesh.n_edges == 16 + 15
    assert len(mesh.boundary_edges) == 2 * (4 + 3)
    assert np.isclose(mesh.min_h(), 0.5)
    assert np.isclose(mesh.max_h(), 2 / 3)


def test_unstructured_square_loads():
    mesh = load_unstructured_square()
    assert mesh.n_vertices == 140
    assert mesh.n_elem == 119
    # all element Jacobians must be positive (CCW orientation)
    from cuddhelmholtz_tpu.utils.quadrature import QuadratureRule

    q = QuadratureRule(4, QuadratureRule.GaussLegendre)
    detJ = mesh.element_metrics(q).measures
    assert detJ.min() > 0

    # interior edges consistent: both sides reference the edge's vertices
    for e in mesh.interior_edges[:20]:
        el1 = mesh.edge_elements[e, 1]
        assert el1 >= 0
        assert mesh.edge_type[e] == INTERIOR


def test_edge_delta_orientation():
    mesh = load_unstructured_square()
    ev = mesh.elem_vertices
    from cuddhelmholtz_tpu.mesh.mesh2d import EDGE_V0, EDGE_V1

    for e in mesh.interior_edges:
        (el0, el1) = mesh.edge_elements[e]
        (s0, s1) = mesh.edge_sides[e]
        a0, b0 = ev[el0, EDGE_V0[s0]], ev[el0, EDGE_V1[s0]]
        a1, b1 = ev[el1, EDGE_V0[s1]], ev[el1, EDGE_V1[s1]]
        assert {a0, b0} == {a1, b1}
        assert mesh.edge_delta[e] == (1 if a0 == a1 else -1)


@pytest.mark.parametrize("nb", [2, 3, 4, 6])
def test_h1_dof_count_structured(nb):
    nx, ny = 5, 4
    mesh = Mesh2D.uniform_rect(nx, -1, 1, ny, -1, 1)
    fem = H1Space(mesh, Basis(nb))
    assert fem.ndof == (nx * (nb - 1) + 1) * (ny * (nb - 1) + 1)
    assert fem.ndof == euler_ndof(mesh, nb)


@pytest.mark.parametrize("nb", [2, 3, 4, 5])
def test_h1_dof_count_unstructured(nb):
    mesh = load_unstructured_square()
    fem = H1Space(mesh, Basis(nb))
    assert fem.ndof == euler_ndof(mesh, nb)


@pytest.mark.parametrize("mesh_kind", ["structured", "unstructured"])
def test_h1_continuity(mesh_kind):
    """Shared DOFs must have consistent physical coordinates from every element."""
    mesh = (
        Mesh2D.uniform_rect(4, -1, 1, 4, -1, 1)
        if mesh_kind == "structured"
        else load_unstructured_square()
    )
    basis = Basis(4)
    fem = H1Space(mesh, basis)
    X = mesh.physical_coordinates(basis.nodes, basis.nodes)  # (nel, ix, iy, 2)
    per_elem = fem.coords[fem.dofs.transpose(0, 2, 1)]  # (nel, ix, iy, 2)
    assert np.max(np.abs(per_elem - X)) < 1e-12


def test_face_space_boundary():
    nx, nb = 6, 4
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)
    fem = H1Space(mesh, Basis(nb))
    fs = FaceSpace(fem, mesh.boundary_edges)
    assert fs.fdof == 4 * nx * (nb - 1)
    # all face DOFs lie on the boundary of the square
    xy = fem.coords[fs.proj]
    on_bdry = (np.abs(np.abs(xy[:, 0]) - 1) < 1e-12) | (
        np.abs(np.abs(xy[:, 1]) - 1) < 1e-12
    )
    assert on_bdry.all()


def test_face_space_restrict_prolong_roundtrip():
    import jax.numpy as jnp

    mesh = Mesh2D.uniform_rect(4, -1, 1, 4, -1, 1)
    fem = H1Space(mesh, Basis(3))
    fs = FaceSpace(fem, mesh.boundary_edges)
    x = jnp.arange(fem.ndof, dtype=jnp.float64)
    xf = fs.restrict(x)
    y = fs.prolong(xf, jnp.zeros(fem.ndof))
    z = fs.orth(x)
    assert np.allclose(np.asarray(y)[fs.proj], np.asarray(x)[fs.proj])
    assert np.allclose(np.asarray(z)[fs.proj], 0.0)
    mask = np.ones(fem.ndof, bool)
    mask[fs.proj] = False
    assert np.allclose(np.asarray(z)[mask], np.asarray(x)[mask])


def test_non_manifold_mesh_rejected():
    """A duplicated element row makes an edge shared by 3+ sides; the builder
    must reject it instead of silently corrupting the CG numbering."""
    import pytest

    base = Mesh2D.uniform_rect(3, -1.0, 1.0, 3, -1.0, 1.0)
    bad_elems = np.vstack([base.elem_vertices, base.elem_vertices[:1]])
    with pytest.raises(ValueError, match="non-manifold"):
        Mesh2D.from_vertices(base.vertices, bad_elems)


def test_grid_space_rejects_swapped_dims():
    """GridH1Space must reject an (nx, ny) that disagrees with the mesh's
    el = ex + nx*ey element order (the strided assembly would silently pair
    the wrong metric data)."""
    import pytest

    from cuddhelmholtz_tpu.ops.structured import GridH1Space

    mesh = Mesh2D.uniform_rect(4, 0.0, 1.0, 2, 0.0, 1.0)
    GridH1Space(mesh, Basis(4), 4, 2)  # correct dims construct fine
    with pytest.raises(ValueError, match="row-major"):
        GridH1Space(mesh, Basis(4), 2, 4)
