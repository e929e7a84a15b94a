"""utils/fastmath.softexp: the Cody-Waite software exp that repairs
the TPU hardware exponential (rel err up to 6.2e-6 builtin; see
CLAUDE.md). The polynomial path is backend-independent, so its
accuracy contract is assertable on CPU."""
import numpy as np

import jax
import jax.numpy as jnp

from ecrad_tpu.utils import fastmath


def test_softexp_accuracy():
    x = np.linspace(-86.0, 10.0, 200001).astype(np.float32)
    got = np.asarray(jax.jit(fastmath.softexp)(jnp.asarray(x)),
                     np.float64)
    ref = np.exp(x.astype(np.float64))
    rel = np.abs(got - ref) / ref
    assert rel.max() < 2e-7, rel.max()


def test_softexp_edges():
    x = jnp.asarray([-1e30, -100.0, -87.5, 0.0, 1.0, 50.0],
                    jnp.float32)
    got = np.asarray(fastmath.softexp(x), np.float64)
    assert got[0] == 0.0 and got[1] == 0.0 and got[2] == 0.0
    assert got[3] == 1.0
    np.testing.assert_allclose(got[4], np.e, rtol=2e-7)
    np.testing.assert_allclose(got[5], np.exp(50.0), rtol=2e-7)


def test_exp_dispatch_cpu_uses_builtin():
    # on CPU the dispatcher must return the (correctly-rounded) libm
    # exp — bit-identical to jnp.exp
    x = jnp.asarray(np.linspace(-40, 5, 1001), jnp.float32)
    a = np.asarray(fastmath.exp(x))
    b = np.asarray(jnp.exp(x))
    if jax.default_backend() == "cpu":
        assert (a == b).all()


def test_softexp_f64_passthrough():
    # f64 inputs must use the builtin (validation workflows want libm)
    x = jnp.asarray([-5.0, 0.5], jnp.float32)
    out = fastmath.exp(x)
    assert out.dtype == jnp.float32
