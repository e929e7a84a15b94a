"""Fused all-band taumol vs the per-band Section path.

The fused kernel (optics/rrtmg/taumol_lw_fused.py) re-expresses all 16
LW bands as a handful of class matmuls with in-kernel row/weight
computation. Its pure-jnp body must match the per-band path
(taumol_lw.py, itself golden-validated against the reference NetCDF)
to f32 reassociation tolerance on real meridian data.
"""
import jax
import numpy as np
import pytest

INPUT = "/root/reference/test/ifs/ecrad_meridian.nc"


@pytest.fixture(scope="module")
def coeffs(test_ifs_dir):
    from ecrad_tpu.constants import GAS_INDEX
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.optics.rrtmg.setcoef import prepare_gases, setcoef
    from ecrad_tpu.optics.rrtmg.tables import load_tables

    t = load_tables()
    sl, thermo, gas, cloud, aer = read_input(INPUT)
    phl, thl, gm = thermo.pressure_hl, thermo.temperature_hl, \
        gas.mixing_ratio
    p_fl = 0.5 * (phl[:, :-1] + phl[:, 1:])
    t_fl = 0.5 * (thl[:, :-1] + thl[:, 1:])

    def g(name):
        return gm[:, :, GAS_INDEX[name]]

    gc = prepare_gases(phl, p_fl, t_fl, g("h2o"), g("co2"), g("ch4"),
                       g("n2o"), g("cfc11"), g("cfc12"), g("hcfc22"),
                       g("ccl4"), g("o3"))
    return setcoef(gc, t["preflog"], t["tref"], t["chi_mls"]), t


def test_lw_fused_matches_sections(coeffs):
    from ecrad_tpu.optics.rrtmg.taumol_lw import taumol_lw
    from ecrad_tpu.optics.rrtmg.taumol_lw_fused import taumol_lw_fused

    c, t = coeffs
    tau0, pf0 = jax.jit(
        lambda c: taumol_lw(c, t, use_pallas=False))(c)
    tau1, pf1 = jax.jit(
        lambda c: taumol_lw_fused(c, t, use_pallas=False))(c)
    tau0, pf0 = np.asarray(tau0), np.asarray(pf0)
    tau1, pf1 = np.asarray(tau1), np.asarray(pf1)
    # relative agreement where tau is significant; f32 reassociation only
    mask = np.abs(tau0) > 1e-6
    rel = (np.abs(tau1 - tau0) / np.maximum(np.abs(tau0), 1e-30))[mask]
    assert rel.max() < 1e-5
    np.testing.assert_allclose(pf1, pf0, atol=1e-6)


def test_lw_fused_pallas_matches_body(coeffs):
    """On TPU, the pallas_call wrapping must equal the plain-XLA body."""
    if jax.default_backend() != "tpu":
        pytest.skip("TPU kernel path requires a TPU")
    from ecrad_tpu.optics.rrtmg.taumol_lw_fused import taumol_lw_fused

    c, t = coeffs
    tau0, pf0 = jax.jit(
        lambda c: taumol_lw_fused(c, t, use_pallas=False))(c)
    tau1, pf1 = jax.jit(
        lambda c: taumol_lw_fused(c, t, use_pallas=True))(c)
    np.testing.assert_allclose(np.asarray(tau1), np.asarray(tau0),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(pf1), np.asarray(pf0),
                               rtol=1e-5, atol=1e-7)


def test_sw_fused_matches_sections(coeffs):
    from ecrad_tpu.optics.rrtmg.taumol_sw import taumol_sw
    from ecrad_tpu.optics.rrtmg.taumol_sw_fused import taumol_sw_fused

    c, t = coeffs
    tg0, tr0, sf0 = jax.jit(
        lambda c: taumol_sw(c, t, use_pallas=False))(c)
    tg1, tr1, sf1 = jax.jit(
        lambda c: taumol_sw_fused(c, t, use_pallas=False))(c)
    tg0, tg1 = np.asarray(tg0), np.asarray(tg1)
    mask = np.abs(tg0) > 1e-8
    rel = (np.abs(tg1 - tg0) / np.maximum(np.abs(tg0), 1e-30))[mask]
    assert rel.max() < 1e-5
    np.testing.assert_array_equal(np.asarray(tr1), np.asarray(tr0))
    np.testing.assert_array_equal(np.asarray(sf1), np.asarray(sf0))


def test_sw_fused_pallas_matches_body(coeffs):
    if jax.default_backend() != "tpu":
        pytest.skip("TPU kernel path requires a TPU")
    from ecrad_tpu.optics.rrtmg.taumol_sw_fused import taumol_sw_fused

    c, t = coeffs
    tg0, tr0, _ = jax.jit(
        lambda c: taumol_sw_fused(c, t, use_pallas=False))(c)
    tg1, tr1, _ = jax.jit(
        lambda c: taumol_sw_fused(c, t, use_pallas=True))(c)
    np.testing.assert_allclose(np.asarray(tg1), np.asarray(tg0),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr0),
                               rtol=1e-5, atol=1e-12)
