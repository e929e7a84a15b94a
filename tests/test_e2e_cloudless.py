"""End-to-end clear-sky test on the reference meridian input."""
import jax
import numpy as np
import pytest

from ecrad_tpu.config import RadiationConfig, Solver
from ecrad_tpu.interface import radiation, setup_radiation
from ecrad_tpu.io.input_reader import read_input

INPUT = "/root/reference/test/ifs/ecrad_meridian.nc"


@pytest.fixture(scope="module")
def fluxes(test_ifs_dir):
    sl, thermo, gas, cloud, aer = read_input(INPUT)
    cfg = RadiationConfig(
        i_solver_sw=Solver.CLOUDLESS, i_solver_lw=Solver.CLOUDLESS,
        use_aerosols=False,
        do_nearest_spectral_sw_albedo=False,
        sw_albedo_wavelength_bound=(0.25e-6, 0.44e-6, 0.69e-6,
                                    1.19e-6, 2.38e-6),
        i_sw_albedo_index=(1, 2, 3, 4, 5, 6),
        do_nearest_spectral_lw_emiss=True,
        lw_emiss_wavelength_bound=(8.0e-6, 13.0e-6),
        i_lw_emiss_index=(1, 2, 1),
    )
    setup = setup_radiation(cfg)
    flux = jax.jit(lambda s, t, g: radiation(setup, s, t, g))(
        sl, thermo, gas)
    return sl, flux


def test_physical_ranges(fluxes):
    sl, flux = fluxes
    olr = np.asarray(flux.lw_up[:, 0])
    assert (olr > 120).all() and (olr < 360).all()
    # global-ish mean OLR for this pole-to-pole slice
    assert 200 < olr.mean() < 280
    # LW down at TOA is zero
    np.testing.assert_allclose(np.asarray(flux.lw_dn[:, 0]), 0.0,
                               atol=1e-3)
    # surface LW down positive and below sigma*T^4
    sfc_dn = np.asarray(flux.lw_dn[:, -1])
    assert (sfc_dn > 50).all() and (sfc_dn < 500).all()


def test_sw_consistency(fluxes):
    sl, flux = fluxes
    mu0 = np.asarray(sl.cos_sza)
    toa_dn = np.asarray(flux.sw_dn[:, 0])
    # TOA downward = S0 * mu0 for daylight columns
    expect = sl.solar_irradiance * np.maximum(mu0, 0.0)
    np.testing.assert_allclose(toa_dn, expect, rtol=1e-4, atol=1e-3)
    # night columns: all SW fluxes zero
    night = mu0 <= 0.0
    assert np.abs(np.asarray(flux.sw_dn)[night]).max() == 0.0
    assert np.abs(np.asarray(flux.sw_up)[night]).max() == 0.0
    # energy: TOA up < TOA dn; direct <= total dn
    day = mu0 > 0.0
    assert (np.asarray(flux.sw_up[:, 0])[day]
            < toa_dn[day]).all()
    # f32 rounding can put direct a few 0.01 W/m2 above total
    assert (np.asarray(flux.sw_dn_direct) <= np.asarray(flux.sw_dn)
            + 0.05).all()


def test_flux_monotonic_decrease_direct(fluxes):
    """Direct beam only attenuates downward."""
    sl, flux = fluxes
    fdir = np.asarray(flux.sw_dn_direct)
    day = np.asarray(sl.cos_sza) > 0
    d = np.diff(fdir[day], axis=1)
    assert (d <= 1e-3).all()


def test_clear_equals_total_for_cloudless(fluxes):
    sl, flux = fluxes
    np.testing.assert_array_equal(np.asarray(flux.lw_up),
                                  np.asarray(flux.lw_up_clear))
    np.testing.assert_array_equal(np.asarray(flux.sw_dn),
                                  np.asarray(flux.sw_dn_clear))


def test_heating_rates_sane(fluxes):
    sl, flux = fluxes
    sl2, thermo, gas, cloud, aer = read_input(INPUT)
    hr_lw = np.asarray(flux.heating_rate_lw(thermo))
    # restrict to the troposphere/stratosphere (p > 100 hPa) and to
    # layers thicker than 10 hPa: upper-mesosphere rates and ultra-thin
    # surface layers with sharp temperature jumps legitimately reach
    # tens of K/day
    p_hl = np.asarray(thermo.pressure_hl)
    p_mid = 0.5 * (p_hl[:, :-1] + p_hl[:, 1:])
    dp = p_hl[:, 1:] - p_hl[:, :-1]
    sel = (p_mid > 1e4) & (dp > 1e3)
    assert hr_lw[sel].min() > -20 and hr_lw[sel].max() < 15
