"""Fused McICA optics kernels (ops/mcica_optics.py) vs the plain jnp
path: interpret-mode Pallas on CPU, identical math expected to f32
fusion-order tolerance."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecrad_tpu.ops.mcica_optics import (lw_clear_total_noscat,
                                        sw_clear_total_reftrans)


@pytest.fixture(scope="module")
def case():
    rng = np.random.RandomState(3)
    ncol, nlev, ng, nb = 37, 11, 112, 14
    od = rng.gamma(0.5, 1.0, (ncol, nlev, ng)).astype(np.float32)
    ssa = rng.uniform(0.1, 0.999, (ncol, nlev, ng)).astype(np.float32)
    g = rng.uniform(0.0, 0.9, (ncol, nlev, ng)).astype(np.float32)
    odc = rng.gamma(0.5, 2.0, (ncol, nlev, nb)).astype(np.float32)
    ssac = rng.uniform(0.3, 0.999, (ncol, nlev, nb)).astype(np.float32)
    gc = rng.uniform(0.5, 0.9, (ncol, nlev, nb)).astype(np.float32)
    osc = rng.gamma(1.0, 1.0, (ncol, nlev, ng)).astype(np.float32)
    frac = rng.rand(ncol, nlev) > 0.5
    mu0 = rng.uniform(-0.1, 1.0, ncol).astype(np.float32)
    band_from_g = np.sort(rng.randint(0, nb, ng))
    planck = rng.uniform(1.0, 30.0,
                         (ncol, nlev + 1, ng)).astype(np.float32)
    return (od, ssa, g, odc, ssac, gc, osc, frac, mu0, band_from_g,
            planck)


@pytest.mark.parametrize("delta_all", [False, True])
def test_sw_kernel_matches_fallback(case, delta_all):
    (od, ssa, g, odc, ssac, gc, osc, frac, mu0, band_from_g,
     planck) = case
    ref = sw_clear_total_reftrans(od, ssa, g, odc, ssac, gc,
                                  band_from_g, osc, frac, mu0,
                                  delta_all, use_pallas=False)
    got = sw_clear_total_reftrans(od, ssa, g, odc, ssac, gc,
                                  band_from_g, osc, frac, mu0,
                                  delta_all, use_pallas=False,
                                  interpret=True)
    for i, (a, b) in enumerate(zip(got, ref)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        # 2e-3: the direct-reflectance/transmittance fields amplify f32
        # fusion-order differences by ~1e6 at the k*mu0 resonance
        # (the reference nudges |k mu0 - 1| < 1e-6); end-to-end flux
        # accuracy is gated separately vs f64 truth
        assert np.abs(a - b).max() / scale < 2e-3, i


def test_lw_kernel_matches_fallback(case):
    (od, ssa, g, odc, ssac, gc, osc, frac, mu0, band_from_g,
     planck) = case
    ref = lw_clear_total_noscat(od, odc, band_from_g, osc, frac,
                                planck, use_pallas=False)
    got = lw_clear_total_noscat(od, odc, band_from_g, osc, frac,
                                planck, use_pallas=False,
                                interpret=True)
    for i, (a, b) in enumerate(zip(got, ref)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-4, i
