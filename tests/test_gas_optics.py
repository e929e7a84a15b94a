"""Sanity + physics tests for RRTMG-IFS gas optics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecrad_tpu.constants import GAS_INDEX, NUM_GASES, STEFAN_BOLTZMANN
from ecrad_tpu.optics.rrtmg.gas_optics import (
    GasOptics,
    gas_optics,
    make_spec,
)


def standard_atmosphere(ncol=4, nlev=50):
    """Simple analytic atmosphere: exponential pressure, linear-ish T."""
    rng = np.random.RandomState(0)
    p_top, p_surf = 1.0, 101325.0
    # half-level pressures, TOA first
    eta = np.linspace(0.0, 1.0, nlev + 1) ** 1.5
    p_hl = p_top + (p_surf - p_top) * eta
    p_hl = np.tile(p_hl, (ncol, 1))
    # temperature: stratosphere isothermal 210K -> surface 288K
    t_surf = 288.0 + rng.uniform(-5, 5, (ncol, 1))
    t_hl = 210.0 + (t_surf - 210.0) * (p_hl / p_surf) ** 0.28
    gas = np.zeros((ncol, nlev, NUM_GASES))
    p_fl = 0.5 * (p_hl[:, :-1] + p_hl[:, 1:])
    # water vapour decreasing with height, ~8 g/kg at surface
    gas[:, :, GAS_INDEX["h2o"]] = 8e-3 * (p_fl / p_surf) ** 3
    gas[:, :, GAS_INDEX["co2"]] = 415e-6 * (44.011 / 28.970)
    gas[:, :, GAS_INDEX["ch4"]] = 1.8e-6 * (16.043 / 28.970)
    gas[:, :, GAS_INDEX["n2o"]] = 330e-9 * (44.013 / 28.970)
    # ozone: peak in stratosphere
    o3 = 8e-6 * np.exp(-0.5 * ((np.log(p_fl / 2000.0)) / 1.0) ** 2)
    gas[:, :, GAS_INDEX["o3"]] = o3 * (47.9982 / 28.970)
    skin_t = t_hl[:, -1]
    cos_sza = np.array([1.0, 0.5, 0.1, -0.3])[:ncol]
    return (jnp.asarray(p_hl), jnp.asarray(t_hl), jnp.asarray(gas),
            jnp.asarray(skin_t), jnp.asarray(cos_sza))


@pytest.fixture(scope="module")
def result() -> GasOptics:
    p_hl, t_hl, gas, skin_t, cos_sza = standard_atmosphere()
    spec = make_spec()
    fn = jax.jit(lambda *a: gas_optics(*a, solar_irradiance=1361.0,
                                       spec=spec))
    return fn(p_hl, t_hl, gas, skin_t, cos_sza)


def test_shapes(result):
    ncol, nlev = 4, 50
    assert result.od_lw.shape == (ncol, nlev, 140)
    assert result.od_sw.shape == (ncol, nlev, 112)
    assert result.ssa_sw.shape == (ncol, nlev, 112)
    assert result.planck_hl.shape == (ncol, nlev + 1, 140)
    assert result.lw_emission.shape == (ncol, 140)
    assert result.incoming_sw.shape == (ncol, 112)


def test_finite_positive(result):
    for name in ("od_lw", "od_sw", "ssa_sw", "planck_hl", "lw_emission",
                 "incoming_sw"):
        arr = getattr(result, name)
        assert jnp.isfinite(arr).all(), name
    assert (result.od_lw > 0).all()
    assert (result.od_sw > 0).all()
    assert (result.ssa_sw >= 0).all() and (result.ssa_sw <= 1).all()


def test_solar_normalization(result):
    """Daylight columns: total incoming solar = solar irradiance."""
    total = np.asarray(result.incoming_sw.sum(axis=-1))
    np.testing.assert_allclose(total[:3], 1361.0, rtol=1e-4)


def test_raw_solar_source_magnitude():
    """Unnormalized RRTMG_SW solar source integrates to ~1368 W m-2."""
    from ecrad_tpu.optics.rrtmg.tables import load_tables
    t = load_tables()
    # sfluxref summed over g and (averaged over eta where 2-D) per band
    total = 0.0
    for band in range(16, 30):
        sf = np.asarray(t[f"sw{band}_sfluxref"])
        if sf.ndim == 2:
            sf = sf[:, 0]  # eta index 1 is representative
        s = sf.sum()
        if band == 27:
            s *= float(t["sw27_scalekur"])
        total += s
    assert 1320.0 < total < 1420.0, total


def test_planck_blackbody_consistency(result):
    """Summed Planck over all LW g at surface ~ sigma*T^4 (RRTMG bands
    cover 10-3250 cm-1, >99% of the blackbody integral at 288K)."""
    p_hl, t_hl, gas, skin_t, cos_sza = standard_atmosphere()
    planck_surf_total = np.asarray(result.planck_hl[:, -1, :].sum(-1))
    bb = STEFAN_BOLTZMANN * np.asarray(t_hl[:, -1]) ** 4
    ratio = planck_surf_total / bb
    assert (ratio > 0.95).all() and (ratio < 1.01).all(), ratio


def test_water_vapor_sensitivity():
    """More water vapour -> larger LW optical depth in the rotation band."""
    p_hl, t_hl, gas, skin_t, cos_sza = standard_atmosphere()
    spec = make_spec()
    base = gas_optics(p_hl, t_hl, gas, skin_t, cos_sza,
                      solar_irradiance=1361.0, spec=spec)
    gas_wet = gas.at[:, :, GAS_INDEX["h2o"]].multiply(2.0)
    wet = gas_optics(p_hl, t_hl, gas_wet, skin_t, cos_sza,
                     solar_irradiance=1361.0, spec=spec)
    # band 1 (10-350 cm-1) is pure H2O: od must increase everywhere
    assert (wet.od_lw[:, :, :10] > base.od_lw[:, :, :10]).all()


def test_co2_sensitivity():
    """Band 14 (2250-2380 cm-1) is pure CO2."""
    p_hl, t_hl, gas, skin_t, cos_sza = standard_atmosphere()
    spec = make_spec()
    base = gas_optics(p_hl, t_hl, gas, skin_t, cos_sza,
                      solar_irradiance=1361.0, spec=spec)
    gas2 = gas.at[:, :, GAS_INDEX["co2"]].multiply(2.0)
    dbl = gas_optics(p_hl, t_hl, gas2, skin_t, cos_sza,
                     solar_irradiance=1361.0, spec=spec)
    ngc = [10, 12, 16, 14, 16, 8, 12, 8, 12, 6, 8, 8, 4, 2, 2, 2]
    off14 = sum(ngc[:13])
    sl = slice(off14, off14 + 2)
    assert (dbl.od_lw[:, :, sl] > base.od_lw[:, :, sl]).all()


def test_od_magnitudes(result):
    """Total LW optical depth: opaque in H2O bands, thin in window."""
    od_col = np.asarray(result.od_lw[0].sum(axis=0))  # (140,)
    # rotation band (band 1) strongly absorbing
    assert od_col[:10].max() > 10.0
    # atmospheric window band 10 (1390-1480) has some weak g-points...
    # check the most transparent g-point of all is < 1
    assert od_col.min() < 1.0


def test_reordering_spec():
    spec = make_spec(reorder_lw=True, reorder_sw=True)
    assert len(np.unique(spec.g_from_reordered_g_lw)) == 140
    assert len(np.unique(spec.g_from_reordered_g_sw)) == 112
