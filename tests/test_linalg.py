"""BLAS-1 parity tests (reference oracle: ``tests/linalg.cpp``): device ops
vs host recomputation on random vectors, n=1024."""

import jax.numpy as jnp
import numpy as np

from cuddhelmholtz_tpu.utils import linalg as la

N = 1024
RNG = np.random.default_rng(0)
X = RNG.standard_normal(N)
Y = RNG.standard_normal(N)


def test_axpby():
    got = la.axpby(2.5, jnp.asarray(X), -0.5, jnp.asarray(Y))
    assert np.allclose(np.asarray(got), 2.5 * X - 0.5 * Y, atol=1e-12)


def test_dot_norm_dist():
    assert abs(float(la.dot(jnp.asarray(X), jnp.asarray(Y))) - X @ Y) < 1e-10
    assert abs(float(la.norm(jnp.asarray(X))) - np.linalg.norm(X)) < 1e-10
    assert abs(float(la.dist(jnp.asarray(X), jnp.asarray(Y))) - np.linalg.norm(X - Y)) < 1e-10


def test_scal_copy_fill():
    assert np.allclose(np.asarray(la.scal(3.0, jnp.asarray(X))), 3.0 * X)
    c = la.copy(jnp.asarray(X))
    assert np.array_equal(np.asarray(c), X)
    assert np.all(np.asarray(la.fill(7, 2.5)) == 2.5)
    assert np.all(np.asarray(la.zeros(7)) == 0.0)
    assert np.all(np.asarray(la.ones(7)) == 1.0)
    f32 = la.fill(4, 1.5, dtype=jnp.float32)
    assert f32.dtype == jnp.float32
