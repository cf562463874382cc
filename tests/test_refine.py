"""Quad-mesh refinement (mesh/refine.py)."""

import numpy as np
import jax.numpy as jnp

from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.mesh.refine import jittered_grid, refine_quad_mesh
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis


def _total_area(mesh):
    v = mesh.vertices[mesh.elem_vertices]  # (nel, 4, 2)
    x, y = v[..., 0], v[..., 1]
    return 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1)
    ).sum()


def test_refine_preserves_geometry_and_conformity():
    mesh = load_unstructured_square()
    fine = refine_quad_mesh(mesh, levels=2)
    assert fine.n_elem == mesh.n_elem * 16
    # bilinear refinement of straight-edged quads preserves total area
    np.testing.assert_allclose(_total_area(fine), _total_area(mesh), rtol=1e-12)
    np.testing.assert_allclose(_total_area(fine), 4.0, rtol=1e-10)
    # conforming: shared midpoints dedup -> Euler's formula for a disc-like
    # domain: V - E + F = 1 (excluding the outer face)
    n_edges = len(fine.edges) if hasattr(fine, "edges") else None
    # boundary edge count doubles per level
    assert len(fine.boundary_edges) == 4 * len(mesh.boundary_edges)
    # the refined mesh builds a valid H1 space (exercises edge dedup,
    # orientation, and the non-manifold check)
    fem = H1Space(fine, Basis(3))
    assert fem.ndof > 0


def test_refined_mass_exactness():
    """P2 exactness of the mass operator on the refined mesh: the refined
    geometry is a valid discretisation, not just a valid data structure."""
    from cuddhelmholtz_tpu.ops.functional import linear_functional
    from cuddhelmholtz_tpu.ops.mass import apply_mass, make_mass_op
    from cuddhelmholtz_tpu.utils.quadrature import QuadratureRule

    mesh = refine_quad_mesh(load_unstructured_square(), levels=1)
    fem = H1Space(mesh, Basis(4))
    f = lambda xy: 1.0 + xy[..., 0] + xy[..., 1] ** 2

    nodal = np.asarray(f(jnp.asarray(fem.coords)))
    op = make_mass_op(fem)
    got = np.asarray(apply_mass(op, jnp.asarray(nodal)))
    quad = QuadratureRule(8, QuadratureRule.GaussLegendre)
    want = np.asarray(linear_functional(fem, f, quad))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-8, err


def test_jittered_grid_valid():
    mesh = jittered_grid(8, 8, amount=0.2, seed=3)
    assert mesh.n_elem == 64
    fem = H1Space(mesh, Basis(4))
    assert fem.ndof == (8 * 3 + 1) ** 2
