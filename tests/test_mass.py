"""Mass-operator correctness (reference oracle: ``tests/mass.cpp``).

Polynomial exactness: for f in P2, the matrix-free mass action must equal the
quadrature functional (f, phi) to 1e-8 relative (forward), and a
diagonally-preconditioned GMRES mass solve must recover the nodal values
(backward), on both the structured 10x10 mesh and the unstructured square,
for p = 3..8.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuddhelmholtz_tpu.mesh.io import load_unstructured_square
from cuddhelmholtz_tpu.mesh.mesh2d import Mesh2D
from cuddhelmholtz_tpu.ops.functional import linear_functional
from cuddhelmholtz_tpu.ops.mass import (
    apply_diag_inv_mass,
    apply_mass,
    make_diag_inv_mass_op,
    make_mass_op,
)
from cuddhelmholtz_tpu.solvers.gmres import gmres
from cuddhelmholtz_tpu.spaces.h1 import H1Space
from cuddhelmholtz_tpu.utils.basis import Basis
from cuddhelmholtz_tpu.utils.quadrature import QuadratureRule

TOL = 1e-8


def func(xy):
    x, y = xy[..., 0], xy[..., 1]
    return 3.0 * x * x - 2.0 * x * y + y + 1.0


def _meshes():
    return {
        "structured": Mesh2D.uniform_rect(10, -1, 1, 10, -1, 1),
        "unstructured": load_unstructured_square(),
    }


MESHES = _meshes()


@pytest.mark.parametrize("mesh_kind", ["structured", "unstructured"])
@pytest.mark.parametrize("p", [3, 4, 5, 6, 7, 8])
def test_mass_forward_backward(mesh_kind, p):
    mesh = MESHES[mesh_kind]
    fem = H1Space(mesh, Basis(p))
    quad = QuadratureRule(p + 2, QuadratureRule.GaussLegendre)

    f = jnp.asarray(func(fem.coords))
    b = linear_functional(fem, func, quad)

    mass = make_mass_op(fem)
    Mf = apply_mass(mass, f)

    err = np.linalg.norm(Mf - b) / np.linalg.norm(b)
    assert err < TOL, f"forward error {err}"

    # backward: solve M u = b with lumped-diagonal preconditioner
    pinv = make_diag_inv_mass_op(fem)
    out = gmres(
        lambda v: apply_mass(mass, v),
        b,
        m=5,
        maxit=10,
        tol=1e-12,
        precond=lambda v: apply_diag_inv_mass(pinv, v),
    )
    err = np.linalg.norm(out.x - f) / np.linalg.norm(f)
    assert err < TOL, f"backward error {err}"


@pytest.mark.parametrize("p", [3, 5])
def test_weighted_mass_matches_functional(p):
    """(a f, phi) assembled two ways: weighted mass action vs functional."""
    mesh = MESHES["unstructured"]
    fem = H1Space(mesh, Basis(p))

    def a_fn(xy):
        return 1.0 + 0.5 * xy[..., 0] ** 2

    a_nodal = np.asarray(a_fn(fem.coords))
    f = jnp.asarray(func(fem.coords))
    mass_a = make_mass_op(fem, coeff=a_nodal)
    Mf = apply_mass(mass_a, f)

    quad = QuadratureRule(2 * p + 2, QuadratureRule.GaussLegendre)

    # oracle: (a_h f_h, phi) where a_h, f_h are the nodal interpolants;
    # build from an unweighted mass apply on the pointwise product is wrong
    # (product is not in the space), so integrate the interpolants directly
    P = fem.basis.eval(quad.x)
    metrics = mesh.element_metrics(quad)
    detj = metrics.measures.transpose(0, 2, 1)
    w2 = np.outer(quad.w, quad.w)
    ae = a_nodal[fem.dofs]
    fe = np.asarray(f)[fem.dofs]
    aq = np.einsum("qi,rj,eji->erq", P, P, ae)
    fq = np.einsum("qi,rj,eji->erq", P, P, fe)
    g = aq * fq * w2[None] * detj
    t = np.einsum("qi,erq->eri", P, g)
    ye = np.einsum("rj,eri->eji", P, t)
    oracle = np.zeros(fem.ndof)
    np.add.at(oracle, fem.dofs.reshape(-1), ye.reshape(-1))

    err = np.linalg.norm(Mf - oracle) / np.linalg.norm(oracle)
    assert err < 1e-10, err
