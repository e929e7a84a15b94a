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


def test_gminor_ops_match_reference():
    """g-minor (leading matrix dims) ops vs numpy/scipy references."""
    import numpy as np
    import jax.numpy as jnp
    from scipy.linalg import expm as scipy_expm
    from ecrad_tpu.solvers.matrix import expm_g, mm_g, mv_g, solve_g, \
        solve_vec_g
    rng = np.random.RandomState(3)
    A = rng.randn(40, 6, 6).astype(np.float32) * 0.7
    B = rng.randn(40, 6, 3).astype(np.float32)
    x = rng.randn(40, 6).astype(np.float32)
    Ag = jnp.asarray(np.moveaxis(A, 0, -1))
    Bg = jnp.asarray(np.moveaxis(B, 0, -1))
    xg = jnp.asarray(np.moveaxis(x, 0, -1))

    mm = np.moveaxis(np.asarray(mm_g(Ag, Bg)), -1, 0)
    np.testing.assert_allclose(mm, A @ B, rtol=2e-5, atol=1e-5)

    mv = np.moveaxis(np.asarray(mv_g(Ag, xg)), -1, 0)
    np.testing.assert_allclose(mv, (A @ x[..., None])[..., 0],
                               rtol=2e-5, atol=1e-5)

    # diagonally-dominant systems (the unpivoted-elimination regime)
    Add = A + 8.0 * np.eye(6, dtype=np.float32)
    Addg = jnp.asarray(np.moveaxis(Add, 0, -1))
    X = np.moveaxis(np.asarray(solve_g(Addg, Bg)), -1, 0)
    np.testing.assert_allclose(X, np.linalg.solve(Add, B),
                               rtol=2e-4, atol=2e-4)
    y = np.moveaxis(np.asarray(solve_vec_g(Addg, xg)), -1, 0)
    np.testing.assert_allclose(
        y, np.linalg.solve(Add, x[..., None])[..., 0],
        rtol=2e-4, atol=2e-4)

    E = np.moveaxis(np.asarray(expm_g(Ag)), -1, 0)
    Es = np.stack([scipy_expm(A[i].astype(np.float64))
                   for i in range(A.shape[0])])
    np.testing.assert_allclose(E, Es, rtol=1e-4, atol=1e-4)


def test_expm_sw_g_block_triangular():
    """Blockwise expm of [[M, C], [0, D]] (SW SPARTACUS sparsity) vs a
    dense scipy expm of the assembled 9x9, incl. norms needing several
    squarings."""
    from ecrad_tpu.solvers.matrix import expm_sw_g
    rng = np.random.RandomState(7)
    nb = 48
    M = rng.randn(nb, 6, 6).astype(np.float32)
    C = rng.randn(nb, 6, 3).astype(np.float32)
    D = rng.randn(nb, 3, 3).astype(np.float32)
    # scale a third of the batch up to force squarings
    M[::3] *= 6.0
    D[::3] *= 6.0
    Em, Ec, Ed = (np.moveaxis(np.asarray(x), -1, 0) for x in expm_sw_g(
        jnp.asarray(np.moveaxis(M, 0, -1)),
        jnp.asarray(np.moveaxis(C, 0, -1)),
        jnp.asarray(np.moveaxis(D, 0, -1))))
    for i in range(nb):
        G = np.zeros((9, 9))
        G[:6, :6] = M[i]
        G[:6, 6:] = C[i]
        G[6:, 6:] = D[i]
        want = scipy_expm(G)
        np.testing.assert_allclose(Em[i], want[:6, :6], rtol=2e-3,
                                   atol=2e-3, err_msg=f"Em i={i}")
        np.testing.assert_allclose(Ec[i], want[:6, 6:], rtol=2e-3,
                                   atol=2e-3, err_msg=f"Ec i={i}")
        np.testing.assert_allclose(Ed[i], want[6:, 6:], rtol=2e-3,
                                   atol=2e-3, err_msg=f"Ed i={i}")
