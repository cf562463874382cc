"""RHS assembly: F[i] = (f, phi_i) over elements and faces.

Parity with the reference ``LinearFunctional`` / ``FaceLinearFunctional``
(``/root/reference/include/LinearFunctional.hpp``,
``include/FaceLinearFunctional.hpp``).  ``f`` is a Python callable evaluated
on the precomputed physical quadrature coordinates; since those coordinates
are static arrays, the whole assembly runs vectorised (and can be jitted with
``f`` traced).

Two paths, as in the reference:
  * fast collocation at the GLL basis nodes (diagonal quadrature),
  * full quadrature with interpolation matrices.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..spaces.h1 import FaceSpace, H1Space
from ..utils.quadrature import QuadratureRule


def linear_functional(
    space: H1Space,
    f: Callable,
    quad: QuadratureRule | None = None,
    dtype=jnp.float64,
) -> jax.Array:
    """F[i] = (f, phi_i).  ``f`` maps coordinate arrays (..., 2) -> (...)."""
    basis = space.basis
    if quad is None:
        # fast path: collocation at the GLL nodes
        q = basis.quadrature
        metrics = space.mesh.element_metrics(q)
        detj = metrics.measures.transpose(0, 2, 1)  # (nel, iy, ix)
        coords = metrics.coords.transpose(0, 2, 1, 3)  # (nel, iy, ix, 2)
        w2 = np.outer(q.w, q.w)
        fe = f(jnp.asarray(coords, dtype=dtype)) * jnp.asarray(w2[None] * detj, dtype=dtype)
        return jax.ops.segment_sum(
            fe.reshape(-1), jnp.asarray(space.dofs).reshape(-1), num_segments=space.ndof
        )
    P = jnp.asarray(basis.eval(quad.x), dtype=dtype)  # (nq, nb)
    metrics = space.mesh.element_metrics(quad)
    detj = metrics.measures.transpose(0, 2, 1)  # (nel, qy, qx)
    coords = metrics.coords.transpose(0, 2, 1, 3)  # (nel, qy, qx, 2)
    w2 = np.outer(quad.w, quad.w)
    g = f(jnp.asarray(coords, dtype=dtype)) * jnp.asarray(w2[None] * detj, dtype=dtype)
    t = jnp.einsum("qi,erq->eri", P, g)  # integrate x
    fe = jnp.einsum("rj,eri->eji", P, t)  # integrate y -> (nel, iy, ix)
    return jax.ops.segment_sum(
        fe.reshape(-1), jnp.asarray(space.dofs).reshape(-1), num_segments=space.ndof
    )


def face_linear_functional(
    fs: FaceSpace,
    f: Callable,
    quad: QuadratureRule | None = None,
    dtype=jnp.float64,
) -> jax.Array:
    """F[i] = <f, phi_i> over the face space."""
    basis = fs.h1.basis
    if quad is None:
        q = basis.quadrature
        metrics = fs.h1.mesh.edge_metrics(q, fs.faces)
        wds = metrics.measures * q.w[None, :]  # (nf, nq=nb)
        g = f(jnp.asarray(metrics.coords, dtype=dtype)) * jnp.asarray(wds, dtype=dtype)
        return jax.ops.segment_sum(
            g.reshape(-1), jnp.asarray(fs.face_dofs).reshape(-1), num_segments=fs.fdof
        )
    P = jnp.asarray(basis.eval(quad.x), dtype=dtype)
    metrics = fs.h1.mesh.edge_metrics(quad, fs.faces)
    wds = metrics.measures * quad.w[None, :]  # (nf, nq)
    g = f(jnp.asarray(metrics.coords, dtype=dtype)) * jnp.asarray(wds, dtype=dtype)
    gf = jnp.einsum("qi,fq->fi", P, g)
    return jax.ops.segment_sum(
        gf.reshape(-1), jnp.asarray(fs.face_dofs).reshape(-1), num_segments=fs.fdof
    )
