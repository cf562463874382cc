"""Operator protocol: pure matvec callables over jax arrays.

The reference models operators as classes with ``action(x, y)`` /
``action(c, x, y)`` mutating device buffers (``include/Operator.hpp``).  The
TPU-native equivalent is a pure function ``y = matvec(x)``; composition and
accumulation (``y += c * A x``) happen functionally and fuse under jit.
``LinearOperator`` is a light wrapper so solvers can treat anything with a
``matvec`` and a size uniformly.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


class LinearOperator:
    """y = matvec(x); n is the vector length (for solver allocation)."""

    def __init__(self, n: int, matvec: Callable, dtype=jnp.float64):
        self.n = int(n)
        self.matvec = matvec
        self.dtype = dtype

    def __call__(self, x):
        return self.matvec(x)


def scaled_accumulate(y, c, ax):
    """y + c * ax (the reference's ``action(c, x, y)`` contract)."""
    return y + c * ax
