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
