"""Matrix exponential tests vs scipy reference."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.linalg import expm as scipy_expm

from ecrad_tpu.solvers.matrix import (
    expm,
    fast_expm_exchange_2,
    fast_expm_exchange_3,
)


def test_expm_random_batch():
    rng = np.random.RandomState(0)
    A = rng.uniform(-1.0, 1.0, (16, 9, 9))
    got = np.asarray(expm(jnp.asarray(A, jnp.float32)))
    for i in range(16):
        want = scipy_expm(A[i])
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-4)


def test_expm_large_norm():
    """Matrices requiring several squarings."""
    rng = np.random.RandomState(1)
    A = rng.uniform(-1.0, 1.0, (4, 6, 6)) * 20.0
    A = A - np.eye(6) * 25.0  # keep exp bounded
    got = np.asarray(expm(jnp.asarray(A, jnp.float32)))
    for i in range(4):
        want = scipy_expm(A[i])
        np.testing.assert_allclose(got[i], want, rtol=5e-2, atol=1e-3)


def test_fast_expm_exchange_2():
    rng = np.random.RandomState(2)
    a = rng.uniform(0.01, 3.0, 8)
    b = rng.uniform(0.01, 3.0, 8)
    got = np.asarray(fast_expm_exchange_2(jnp.asarray(a), jnp.asarray(b)))
    for i in range(8):
        M = np.array([[-a[i], b[i]], [a[i], -b[i]]])
        want = scipy_expm(M)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_fast_expm_exchange_3():
    rng = np.random.RandomState(3)
    a = rng.uniform(0.05, 2.0, 8)
    b = rng.uniform(0.05, 2.0, 8)
    c = rng.uniform(0.05, 2.0, 8)
    d = rng.uniform(0.05, 2.0, 8)
    got = np.asarray(fast_expm_exchange_3(*(jnp.asarray(x) for x in
                                            (a, b, c, d))))
    for i in range(8):
        M = np.array([[-a[i], b[i], 0.0],
                      [a[i], -(b[i] + c[i]), d[i]],
                      [0.0, c[i], -d[i]]])
        want = scipy_expm(M)
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-4,
                                   err_msg=f"i={i}")
