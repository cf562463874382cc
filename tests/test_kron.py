"""Kron (1D-factorised) fast path == generic gather/scatter operators.

The kron path (ops/kron.py) must be numerically identical (same quadrature,
same collocated data) to the generic matrix-free operators on rectilinear
grid meshes, including non-square grids and variable mass coefficients.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.models.helmholtz import apply_helmholtz, make_helmholtz_op
from cuddhelmholtz_tpu.ops.kron import (
    apply_mass_kron,
    apply_stiffness_kron,
    make_kron_mass_op,
    make_kron_stiffness_op,
)
from cuddhelmholtz_tpu.ops.mass import apply_mass, make_mass_op
from cuddhelmholtz_tpu.ops.stiffness import apply_stiffness, make_stiffness_op
from cuddhelmholtz_tpu.ops.structured import GridH1Space
from cuddhelmholtz_tpu.spaces.h1 import FaceSpace
from cuddhelmholtz_tpu.utils.basis import Basis


def _grid_space(nx, ny, deg):
    mesh = Mesh2D.uniform_rect(nx, -1.0, 1.0, ny, -0.5, 1.5)
    return mesh, GridH1Space(mesh, Basis(deg + 1), nx, ny)


@pytest.mark.parametrize("nx,ny,deg", [(8, 8, 3), (8, 5, 3), (6, 7, 4)])
def test_kron_stiffness_matches_generic(nx, ny, deg):
    _, fem = _grid_space(nx, ny, deg)
    gop = make_stiffness_op(fem)
    kop = make_kron_stiffness_op(fem)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(fem.ndof))
    y_ref = apply_stiffness(gop, x)
    y_kron = apply_stiffness_kron(kop, x)
    err = float(jnp.linalg.norm(y_kron - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-12


@pytest.mark.parametrize("nx,ny,deg", [(8, 8, 3), (8, 5, 3), (6, 7, 4)])
def test_kron_mass_matches_generic(nx, ny, deg):
    _, fem = _grid_space(nx, ny, deg)
    rng = np.random.default_rng(1)
    coeff = 1.0 + 0.5 * rng.random(fem.ndof)
    gop = make_mass_op(fem, coeff=coeff)
    kop = make_kron_mass_op(fem, coeff=coeff)
    x = jnp.asarray(rng.standard_normal(fem.ndof))
    y_ref = apply_mass(gop, x)
    y_kron = apply_mass_kron(kop, x)
    err = float(jnp.linalg.norm(y_kron - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-12


def test_kron_requires_rectilinear():
    # perturbed interior vertex -> not a tensor-product grid
    nx = 4
    mesh0 = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
    verts = mesh0.vertices.copy()
    interior = np.flatnonzero(
        (np.abs(verts[:, 0]) < 0.99) & (np.abs(verts[:, 1]) < 0.99)
    )
    verts[interior[0]] += 0.05
    mesh = Mesh2D.from_vertices(verts, mesh0.elem_vertices)
    fem = GridH1Space(mesh, Basis(4), nx, nx)
    with pytest.raises(ValueError):
        make_kron_stiffness_op(fem)


def test_helmholtz_kron_matches_generic():
    nx, deg = 8, 3
    mesh = Mesh2D.uniform_rect(nx, -1.0, 1.0, nx, -1.0, 1.0)
    fem = GridH1Space(mesh, Basis(deg + 1), nx, nx)
    fs = FaceSpace(fem, mesh.boundary_edges)
    rng = np.random.default_rng(2)
    a2 = 1.0 + 0.3 * rng.random(fem.ndof)
    af = 1.0 + 0.3 * rng.random(fs.fdof)
    omega = 2 * np.pi * nx / 10

    op_k = make_helmholtz_op(omega, a2, af, fem, fs, kron=True)
    op_g = make_helmholtz_op(omega, a2, af, fem, fs, kron=False)
    assert op_k.kron_stiffness is not None and op_g.kron_stiffness is None

    U = jnp.asarray(rng.standard_normal(2 * fem.ndof))
    y_k = apply_helmholtz(op_k, U)
    y_g = apply_helmholtz(op_g, U)
    err = float(jnp.linalg.norm(y_k - y_g) / jnp.linalg.norm(y_g))
    assert err < 1e-12
