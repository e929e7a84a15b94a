"""Host-model coupling: radiation_scheme analogue + UV/PAR diagnostics.

Reference parity: ifs/radiation_scheme.F90 (packing, effective radii,
UV/PAR weighted band sums :467-482), ifs/radiation_setup.F90:341-344,
radiation_config.F90:1304 (get_sw_weights).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

IFS_IN = "/root/reference/test/ifs/ecrad_meridian.nc"

needs_ref = pytest.mark.skipif(not os.path.exists(IFS_IN),
                               reason="reference test files unavailable")


def test_get_sw_weights_par_band():
    from ecrad_tpu.coupling import get_sw_weights
    bands, weights = get_sw_weights(0.4e-6, 0.7e-6)
    # PAR (14286..25000 cm-1) overlaps SW bands 9-11 (12850-29000 cm-1)
    assert len(bands) >= 2
    assert (weights > 0).all() and (weights <= 1.0).all()
    # a band fully inside the range has weight 1
    from ecrad_tpu.optics.rrtmg.gas_optics import WAVENUM1_SW, WAVENUM2_SW
    for b, w in zip(bands, weights):
        if WAVENUM1_SW[b] >= 0.01 / 0.7e-6 and \
                WAVENUM2_SW[b] <= 0.01 / 0.4e-6:
            assert w == pytest.approx(1.0)


def test_get_sw_weights_outside_range():
    from ecrad_tpu.coupling import get_sw_weights
    with pytest.raises(ValueError):
        get_sw_weights(100e-6, 200e-6)


def test_liquid_effective_radius_pinned():
    """Numerically pin the Martin et al. (1994) droplet radius against
    an independent f64 transcription of ifs/liquid_effective_radius.F90
    case 2 (:127-198)."""
    from ecrad_tpu.coupling import liquid_effective_radius
    # 4 columns x 1 level (land fraction is per column)
    p = np.array([[85000.0], [70000.0], [85000.0], [85000.0]])
    t = np.array([[280.0], [265.0], [280.0], [280.0]])
    cf = np.array([[0.8], [0.5], [0.8], [0.0005]])  # last: inactive
    ql = np.array([[2e-4], [5e-5], [2e-4], [2e-4]])
    qr = np.array([[0.0], [0.0], [5e-5], [0.0]])
    land = np.array([0.0, 1.0, 0.0, 0.0])           # sea, land, sea, sea

    got = np.asarray(liquid_effective_radius(
        p, t, cf, ql, qr, land[:, None]))

    def expect(p, t, cf, ql, qr, is_land):
        ccn = 900.0 if is_land else 50.0
        disp = 0.69 if is_land else 0.77
        ntot = (-2.10e-4 * ccn * ccn + 0.568 * ccn - 27.9 if is_land
                else -1.15e-3 * ccn * ccn + 0.963 * ccn + 5.30)
        ratio = (0.222 / disp) ** 0.333
        rho = 1000.0 * p / (287.058 * t)
        lwc = rho * ql / cf
        rwc = rho * qr / cf
        wood = 1.0
        if rwc > 0 and lwc > 1e-12:
            rr = rwc / lwc
            wood = (1.0 + rr) ** 0.666 / (1.0 + 0.2 * ratio * rr)
        re3 = 3.0 * (lwc + rwc) / (4.0 * np.pi * ntot * disp)
        re = wood * 100.0 * np.exp(0.333 * np.log(re3))
        return np.clip(re, 4.0, 30.0) * 1e-6

    assert got[0, 0] == pytest.approx(
        expect(85000.0, 280.0, 0.8, 2e-4, 0.0, False), rel=1e-5)
    assert got[1, 0] == pytest.approx(
        expect(70000.0, 265.0, 0.5, 5e-5, 0.0, True), rel=1e-5)
    assert got[2, 0] == pytest.approx(
        expect(85000.0, 280.0, 0.8, 2e-4, 5e-5, False), rel=1e-5)
    # cloud_frac below the 0.001 activity threshold -> minimum radius
    assert got[3, 0] == pytest.approx(4.0e-6, rel=1e-6)
    # rain engages the Wood (2000) factor: result differs from no-rain
    assert got[2, 0] != got[0, 0]


def test_ice_effective_radius_pinned():
    """Pin the Sun & Rikus (1999, rev. Sun 2001) ice radius against an
    independent f64 transcription of ifs/ice_effective_radius.F90
    case 1 (:100-157)."""
    from ecrad_tpu.coupling import ice_effective_radius
    p = np.array([[40000.0, 25000.0, 40000.0]])
    t = np.array([[230.0, 210.0, 230.0]])
    cf = np.array([[0.6, 0.3, 0.0]])               # last: inactive
    qi = np.array([[1e-5, 2e-6, 1e-5]])
    qs = np.array([[0.0, 1e-6, 0.0]])

    got = np.asarray(ice_effective_radius(p, t, cf, qi, qs))

    def expect(p, t, cf, qi, qs):
        rho = 1000.0 * p / (287.058 * t)
        iwc = rho * (qi + qs) / cf
        aiwc = 45.8966 * iwc ** 0.2214
        biwc = 0.7957 * iwc ** 0.2535
        diam = (1.2351 + 0.0105 * (t - 273.16)) * (
            aiwc + biwc * (t - 83.15))
        return np.clip(diam, 20.0, 155.0) * 0.64952 * 1e-6

    assert got[0, 0] == pytest.approx(
        expect(40000.0, 230.0, 0.6, 1e-5, 0.0), rel=1e-5)
    assert got[0, 1] == pytest.approx(
        expect(25000.0, 210.0, 0.3, 2e-6, 1e-6), rel=1e-5)
    # inactive -> default 80 um diameter times RRE2DE
    assert got[0, 2] == pytest.approx(80.0 * 0.64952e-6, rel=1e-6)


def test_cloud_overlap_decorr_len_pinned():
    """Pin both latitude schemes of ifs/cloud_overlap_decorr_len.F90
    (:96-107): Shonk et al. (2010) Eq. 13 and the equator-smoothed
    variant."""
    from ecrad_tpu.coupling import cloud_overlap_decorr_len
    lat_deg = np.array([0.0, 30.0, 60.0, -45.0])
    sinlat = np.sin(np.deg2rad(lat_deg))
    got1 = np.asarray(cloud_overlap_decorr_len(sinlat, scheme=1))
    np.testing.assert_allclose(got1, 2.899 - 0.02759 * np.abs(lat_deg),
                               rtol=1e-5)
    got2 = np.asarray(cloud_overlap_decorr_len(sinlat, scheme=2))
    coslat = np.cos(np.deg2rad(lat_deg))
    np.testing.assert_allclose(got2, 0.75 + 2.149 * coslat * coslat,
                               rtol=1e-5)


@needs_ref
def test_radiation_scheme_and_uv_par():
    from ecrad_tpu.config import RadiationConfig, Solver
    from ecrad_tpu.coupling import radiation_scheme, uv_par_fluxes
    from ecrad_tpu.interface import setup_radiation
    from ecrad_tpu.io.netcdf import NetcdfFile
    with NetcdfFile(IFS_IN) as f:
        p_hl = f.read("pressure_hl")[:8]
        t_hl = f.read("temperature_hl")[:8]
        q = f.read("q")[:8]
        o3 = f.read("o3_mmr")[:8]
        ql = f.read("q_liquid")[:8]
        qi = f.read("q_ice")[:8]
        cf = f.read("cloud_fraction")[:8]
        cos_sza = f.read("cos_solar_zenith_angle")[:8]
        tskin = f.read("skin_temperature")[:8]
        alb = f.read("sw_albedo")[:8]
        emis = f.read("lw_emissivity")[:8]
    cfg = RadiationConfig(i_solver_sw=Solver.TRIPLECLOUDS,
                          i_solver_lw=Solver.TRIPLECLOUDS,
                          use_aerosols=False,
                          do_surface_sw_spectral_flux=True,
                          directory_name="/root/reference/data")
    setup = setup_radiation(cfg)
    j = lambda x: jnp.asarray(x, jnp.float32)
    flux = radiation_scheme(
        setup, pressure_hl=j(p_hl), temperature_hl=j(t_hl),
        cos_sza=j(cos_sza), skin_temperature=j(tskin),
        sw_albedo=j(alb.mean(-1) if alb.ndim == 2 else alb),
        lw_emissivity=j(emis.mean(-1) if emis.ndim == 2 else emis),
        q=j(q),
        q_liq=j(ql), q_ice=j(qi), cloud_frac=j(cf),
        sin_latitude=j(np.linspace(-1, 1, 8)),
        land_frac=j(np.zeros(8)), o3_mmr=j(o3))
    assert np.isfinite(np.asarray(flux.lw_up)).all()
    uv, par, par_clear = uv_par_fluxes(flux)
    uv, par, par_clear = map(np.asarray, (uv, par, par_clear))
    assert np.isfinite(uv).all() and np.isfinite(par).all()
    # daytime columns: 0 < UV < PAR < total surface SW
    day = np.asarray(flux.sw_dn)[:, -1] > 10.0
    assert (par[day] > uv[day]).all()
    assert (par[day] > 0).all()
    total_sw = np.asarray(flux.sw_dn)[:, -1]
    assert (par[day] < total_sw[day]).all()
    # clear-sky PAR >= all-sky PAR under cloud
    assert (par_clear[day] >= par[day] - 1e-3).all()


@needs_ref
def test_unpack_host_outputs():
    """The post-radiation() unpack of ifs/radiation_scheme.F90:445-512:
    net fluxes, surface/TOA scalars, direct-normal irradiance, effective
    emissivity, and the per-albedo-band SW fluxes (LAPPROXSWUPDATE)."""
    from ecrad_tpu.config import RadiationConfig, Solver
    from ecrad_tpu.coupling import radiation_scheme, unpack_host_outputs
    from ecrad_tpu.interface import setup_radiation
    from ecrad_tpu.io.netcdf import NetcdfFile
    with NetcdfFile(IFS_IN) as f:
        p_hl = f.read("pressure_hl")[:8]
        t_hl = f.read("temperature_hl")[:8]
        q = f.read("q")[:8]
        o3 = f.read("o3_mmr")[:8]
        ql = f.read("q_liquid")[:8]
        qi = f.read("q_ice")[:8]
        cf = f.read("cloud_fraction")[:8]
        cos_sza = f.read("cos_solar_zenith_angle")[:8]
        tskin = f.read("skin_temperature")[:8]
        alb = f.read("sw_albedo")[:8]
        emis = f.read("lw_emissivity")[:8]
    cfg = RadiationConfig(i_solver_sw=Solver.TRIPLECLOUDS,
                          i_solver_lw=Solver.TRIPLECLOUDS,
                          use_aerosols=False,
                          do_surface_sw_spectral_flux=True,
                          do_lw_derivatives=True,
                          directory_name="/root/reference/data")
    setup = setup_radiation(cfg)
    j = lambda x: jnp.asarray(x, jnp.float32)
    alb1 = j(alb.mean(-1) if alb.ndim == 2 else alb)
    emis1 = j(emis.mean(-1) if emis.ndim == 2 else emis)
    flux = radiation_scheme(
        setup, pressure_hl=j(p_hl), temperature_hl=j(t_hl),
        cos_sza=j(cos_sza), skin_temperature=j(tskin),
        sw_albedo=alb1, lw_emissivity=emis1, q=j(q),
        q_liq=j(ql), q_ice=j(qi), cloud_frac=j(cf),
        sin_latitude=j(np.linspace(-1, 1, 8)),
        land_frac=j(np.zeros(8)), o3_mmr=j(o3))
    out = unpack_host_outputs(setup, flux, cos_sza=j(cos_sza),
                              skin_temperature=j(tskin),
                              lw_emissivity=emis1)

    # net fluxes are exactly dn - up
    np.testing.assert_allclose(
        np.asarray(out.flux_sw),
        np.asarray(flux.sw_dn) - np.asarray(flux.sw_up), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.flux_lw_clear),
        np.asarray(flux.lw_dn_clear) - np.asarray(flux.lw_up_clear),
        rtol=1e-6)
    # direct-normal irradiance: mu0 * DNI == surface direct flux
    day = cos_sza > 0.05
    np.testing.assert_allclose(
        (np.asarray(out.flux_dir_into_sun) * cos_sza)[day],
        np.asarray(out.flux_dir)[day], rtol=1e-5)
    # DNI cannot exceed the solar irradiance
    assert (np.asarray(out.flux_dir_into_sun) <= 1361.0 + 1.0).all()
    # TOA downwelling = mu0 * S0 on daytime columns
    np.testing.assert_allclose(
        np.asarray(out.flux_sw_dn_toa)[day], (1361.0 * cos_sza)[day],
        rtol=1e-3)
    # effective emissivity: physical and equal to the prescribed value
    # when computed back through the net-LW identity
    eo = np.asarray(out.emis_out)
    assert np.isfinite(eo).all() and (eo > 0.3).all() and (eo < 1.2).all()
    # albedo-band split: diffuse + direct sums to the total surface SW
    assert out.sw_diffuse_band is not None
    tot = (np.asarray(out.sw_diffuse_band)
           + np.asarray(out.sw_direct_band)).sum(-1)
    np.testing.assert_allclose(tot, np.asarray(flux.sw_dn)[:, -1],
                               rtol=1e-4, atol=1e-4)
    # Hogan-Bozzo LW derivative present, surface value 1
    assert out.lw_derivative is not None
    np.testing.assert_allclose(np.asarray(out.lw_derivative)[:, -1], 1.0,
                               rtol=1e-6)
