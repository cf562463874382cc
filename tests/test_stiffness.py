"""Stiffness-operator correctness (reference oracle: ``tests/stiffness.cpp``).

Manufactured solution with zero Neumann data on [-1,1]^2:
f = (x^5 - 5x)(y^3 - 3y), so (grad f, grad phi) = (-lap f, phi) exactly.
Checked to 1e-6 relative for p in {6,7,8} with a (p+2)-point quadrature on
both meshes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.ops.functional import linear_functional
from cuddhelmholtz_tpu.ops.stiffness import apply_stiffness, make_stiffness_op
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis
from cuddhelmholtz_tpu.utils.quadrature import QuadratureRule

TOL = 1e-6


def func(xy):
    x, y = xy[..., 0], xy[..., 1]
    return (x**5 - 5.0 * x) * (y**3 - 3.0 * y)


def neg_laplacian(xy):
    x, y = xy[..., 0], xy[..., 1]
    return -6.0 * y * (x**5 - 5.0 * x) - 20.0 * x**3 * (y**3 - 3.0 * y)


MESHES = {
    "structured": Mesh2D.uniform_rect(10, -1, 1, 10, -1, 1),
    "unstructured": load_unstructured_square(),
}


@pytest.mark.parametrize("mesh_kind", ["structured", "unstructured"])
@pytest.mark.parametrize("p", [6, 7, 8])
def test_stiffness_manufactured(mesh_kind, p):
    mesh = MESHES[mesh_kind]
    fem = H1Space(mesh, Basis(p))
    quad = QuadratureRule(p + 2, QuadratureRule.GaussLegendre)

    f = jnp.asarray(func(fem.coords))
    Lf = linear_functional(fem, neg_laplacian, quad)

    stiff = make_stiffness_op(fem, quad=quad)
    Sf = apply_stiffness(stiff, f)

    err = np.linalg.norm(Sf - Lf) / np.linalg.norm(Lf)
    assert err < TOL, err


def test_stiffness_annihilates_constants():
    mesh = MESHES["unstructured"]
    fem = H1Space(mesh, Basis(5))
    stiff = make_stiffness_op(fem)
    y = apply_stiffness(stiff, jnp.ones(fem.ndof))
    assert np.max(np.abs(y)) < 1e-10


def test_stiffness_symmetric():
    mesh = MESHES["structured"]
    fem = H1Space(mesh, Basis(4))
    stiff = make_stiffness_op(fem)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fem.ndof))
    v = jnp.asarray(rng.standard_normal(fem.ndof))
    a = float(jnp.vdot(apply_stiffness(stiff, u), v))
    b = float(jnp.vdot(u, apply_stiffness(stiff, v)))
    assert abs(a - b) < 1e-9 * max(1.0, abs(a))


def test_structured_path_matches_generic():
    """GridH1Space + strided assembly == generic gather/scatter assembly."""
    import jax.numpy as jnp

    from cuddhelmholtz_tpu.ops.mass import apply_mass, make_mass_op
    from cuddhelmholtz_tpu.ops.structured import (
        GridH1Space,
        apply_mass_structured,
        apply_stiffness_structured,
    )

    nx, ny, p = 6, 4, 4
    mesh = Mesh2D.uniform_rect(nx, -1, 1, ny, 0, 1)
    fem = GridH1Space(mesh, Basis(p), nx, ny)
    assert fem.ndof == (nx * (p - 1) + 1) * (ny * (p - 1) + 1)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(fem.ndof))

    stiff = make_stiffness_op(fem)
    want = apply_stiffness(stiff, x)
    got = apply_stiffness_structured(stiff, (nx, ny), x)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-11)

    a = 1.0 + 0.3 * np.asarray(fem.coords[:, 0]) ** 2
    mass = make_mass_op(fem, coeff=a)
    want = apply_mass(mass, x)
    got = apply_mass_structured(mass, (nx, ny), x)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-11)


def test_grid_space_solves_like_h1():
    """A GridH1Space produces the same physics as the default numbering."""
    import jax.numpy as jnp

    from cuddhelmholtz_tpu.models.poisson import solve_poisson
    from cuddhelmholtz_tpu.ops.structured import GridH1Space
    from cuddhelmholtz_tpu.spaces.h1 import FaceSpace

    nx, p = 5, 4
    mesh = Mesh2D.uniform_rect(nx, -1, 1, nx, -1, 1)

    def g(xy):
        return xy[..., 0] ** 2 - xy[..., 1] ** 2

    def fzero(xy):
        return jnp.zeros(xy.shape[:-1])

    for space in (H1Space(mesh, Basis(p)), GridH1Space(mesh, Basis(p), nx, nx)):
        fs = FaceSpace(space, mesh.boundary_edges)
        u, out = solve_poisson(space, fs, fzero, g, m=30, maxit=20, tol=1e-10)
        err = np.max(np.abs(np.asarray(u) - g(space.coords)))
        assert bool(out.success) and err < 1e-7, err
