"""Poisson model with Dirichlet boundary conditions via lifting.

Parity with ``/root/reference/examples/Poisson.cpp``: solve -lap u = f with
u = g on the boundary by writing u = w + G where G extends the boundary
projection of g; the operator is the stiffness action followed by zeroing the
boundary DOFs (restriction to H^1_0).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.face_mass import (
    apply_diag_inv_face_mass,
    apply_face_mass,
    make_diag_inv_face_mass_op,
    make_face_mass_op,
)
from ..ops.functional import face_linear_functional, linear_functional
from ..ops.stiffness import StiffnessOp, apply_stiffness, make_stiffness_op
from ..solvers.gmres import gmres, GmresResult
from ..spaces.h1 import FaceSpace, H1Space


class PoissonOp(NamedTuple):
    stiffness: StiffnessOp
    face_proj: jax.Array


def make_poisson_op(space: H1Space, fs: FaceSpace, dtype=jnp.float64) -> PoissonOp:
    return PoissonOp(
        stiffness=make_stiffness_op(space, dtype=dtype),
        face_proj=jnp.asarray(fs.proj),
    )


def apply_poisson(op: PoissonOp, x: jax.Array) -> jax.Array:
    """y = orth(S x): stiffness action restricted to interior DOFs."""
    return apply_stiffness(op.stiffness, x).at[op.face_proj].set(0.0)


def solve_poisson(
    space: H1Space,
    fs: FaceSpace,
    f: Callable,
    g: Callable,
    *,
    m: int = 20,
    maxit: int = 20,
    tol: float = 1e-6,
    dtype=jnp.float64,
) -> tuple[jax.Array, GmresResult]:
    """Full Poisson solve with Dirichlet lifting; returns (u, gmres_out)."""
    op = make_poisson_op(space, fs, dtype=dtype)

    # project boundary data onto the face space: solve <q, phi> = <g, phi>
    y = face_linear_functional(fs, g, dtype=dtype)
    fmass = make_face_mass_op(fs, dtype=dtype)
    fpinv = make_diag_inv_face_mass_op(fs, dtype=dtype)
    out_q = gmres(
        lambda x: apply_face_mass(fmass, x),
        y,
        m=5,
        maxit=10,
        tol=1e-12,
        precond=lambda x: apply_diag_inv_face_mass(fpinv, x),
    )

    # lift to H1: b = orth((f, phi) - (grad G, grad phi))
    G = jnp.zeros(space.ndof, dtype=dtype).at[op.face_proj].add(out_q.x)
    b = linear_functional(space, f, dtype=dtype) - apply_stiffness(op.stiffness, G)
    b = b.at[op.face_proj].set(0.0)

    out = gmres(lambda x: apply_poisson(op, x), b, m=m, maxit=maxit, tol=tol)
    return out.x + G, out
