"""Face (trace) mass operator on a FaceSpace and its diagonal inverse.

Parity with the reference ``FaceMassMatrix`` / ``DiagInvFaceMassMatrix``
(``/root/reference/source/FaceMassMatrix.cpp``): setup collocates
``a * w * ds`` on a 1D Gauss-Legendre rule per face; action is a 1D
interpolate -> scale -> integrate per face, batched over faces.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spaces.h1 import FaceSpace
from ..utils.quadrature import QuadratureRule


class FaceMassOp(NamedTuple):
    """fdofs (nf, nb) face-space ids; P (nq, nb); wds (nf, nq); fdof size."""

    fdofs: jax.Array
    P: jax.Array
    wds: jax.Array
    fdof: int


def make_face_mass_op(
    fs: FaceSpace,
    coeff: np.ndarray | None = None,
    dtype=jnp.float64,
    n_quad: int | None = None,
) -> FaceMassOp:
    """``coeff`` is a face-space nodal vector (a on the face GLL nodes)."""
    nb = fs.h1.n_basis
    order = fs.h1.mesh.max_element_order
    if n_quad is None:
        n_quad = nb + order if coeff is None else 1 + (3 * nb) // 2 + order
    quad = QuadratureRule(n_quad, QuadratureRule.GaussLegendre)
    P = fs.h1.basis.eval(quad.x)  # (nq, nb)
    metrics = fs.h1.mesh.edge_metrics(quad, fs.faces)
    wds = metrics.measures * quad.w[None, :]  # (nf, nq)
    if coeff is not None:
        a_f = np.asarray(coeff)[fs.face_dofs]  # (nf, nb)
        wds = wds * (a_f @ P.T)
    return FaceMassOp(
        fdofs=jnp.asarray(fs.face_dofs),
        P=jnp.asarray(P, dtype=dtype),
        wds=jnp.asarray(wds, dtype=dtype),
        fdof=fs.fdof,
    )


def face_mass_op_with_coeff(base: FaceMassOp, coeff: jax.Array) -> FaceMassOp:
    """Re-weight a unit-coefficient ``FaceMassOp`` by a face-space nodal
    field, traceably (differentiable in ``coeff``; see ``mass_op_with_coeff``).
    ``base`` must be built with the variable-coefficient quadrature size
    (``n_quad = 1 + 3*nb//2 + order``)."""
    a_f = jnp.take(coeff, base.fdofs, axis=0).astype(base.P.dtype)  # (nf, nb)
    return base._replace(wds=base.wds * jnp.matmul(a_f, base.P.T))


def apply_face_mass(op: FaceMassOp, x: jax.Array) -> jax.Array:
    """y = H x on the face space."""
    xf = jnp.take(x, op.fdofs, axis=0)  # (nf, nb)
    u = jnp.einsum("qi,fi->fq", op.P, xf) * op.wds
    yf = jnp.einsum("qi,fq->fi", op.P, u)
    return jax.ops.segment_sum(yf.reshape(-1), op.fdofs.reshape(-1), num_segments=op.fdof)


class DiagInvFaceMassOp(NamedTuple):
    p: jax.Array


def make_diag_inv_face_mass_op(
    fs: FaceSpace, coeff: np.ndarray | None = None, dtype=jnp.float64
) -> DiagInvFaceMassOp:
    """Lumped inverse using GLL collocation weights (reference init_diag)."""
    quad = fs.h1.basis.quadrature
    metrics = fs.h1.mesh.edge_metrics(quad, fs.faces)
    m_f = metrics.measures * quad.w[None, :]  # (nf, nb)
    if coeff is not None:
        m_f = m_f * np.asarray(coeff)[fs.face_dofs]
    diag = np.zeros(fs.fdof, dtype=np.float64)
    np.add.at(diag, fs.face_dofs.reshape(-1), m_f.reshape(-1))
    return DiagInvFaceMassOp(p=jnp.asarray(1.0 / diag, dtype=dtype))


def apply_diag_inv_face_mass(op: DiagInvFaceMassOp, x: jax.Array) -> jax.Array:
    return op.p * x
