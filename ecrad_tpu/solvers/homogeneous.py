"""Homogeneous (plane-parallel overcast) solvers.

Reference parity: radiation/radiation_homogeneous_sw.F90:33 and
radiation_homogeneous_lw.F90:30 — clouds fill the gridbox (in-cloud water
path uses dp/g, not dp/(g*frac)); cloud properties merge into the gas per
g-point and a single adding pass produces the fluxes; the clear-sky pass
uses gas+aerosol only.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import RadiationConfig
from ..optics.cloud import delta_eddington
from ..optics.combine import combine_cloud_gas_lw, combine_cloud_gas_sw
from . import two_stream as ts
from .adding import adding_lw, adding_sw, lw_no_scattering_fluxes
from .cloudless import LwFluxes, SwFluxes, _gf, solver_cloudless_lw, \
    solver_cloudless_sw


def solver_homogeneous_sw(config: RadiationConfig, band_from_g, cloud,
                          od, ssa, g, od_cloud, ssa_cloud, g_cloud,
                          incoming_sw, cos_sza, albedo_diffuse,
                          albedo_direct):
    clear = solver_cloudless_sw(od, ssa, g, incoming_sw, cos_sza,
                                albedo_diffuse, albedo_direct)
    cloud_mask = (cloud.fraction
                  >= config.cloud_fraction_threshold)[..., None]
    od_t, ssa_t, g_t = combine_cloud_gas_sw(
        od, ssa, g, od_cloud, ssa_cloud, g_cloud, band_from_g,
        cloud_mask=cloud_mask)
    if config.do_sw_delta_scaling_with_gases:
        od_t, ssa_t, g_t = delta_eddington(od_t, ssa_t, g_t)
    od_t, ssa_t, g_t = _gf(od_t), _gf(ssa_t), _gf(g_t)
    mu0 = jnp.maximum(cos_sza, 1e-10)[None, :]
    g1, g2, g3 = ts.sw_gammas(mu0, ssa_t, g_t)
    r, t, rd, tdd, tdir = ts.sw_reftrans(mu0, od_t, ssa_t, g1, g2, g3)
    up, dnd, dndir = adding_sw(r, t, rd, tdd, tdir, incoming_sw.T,
                               albedo_diffuse.T, albedo_direct.T,
                               jnp.maximum(cos_sza, 1e-10), gfirst=True)
    daylight = (cos_sza > 0.0)[None, None, :]
    total = SwFluxes(up=jnp.where(daylight, up, 0.0),
                     dn_diffuse=jnp.where(daylight, dnd, 0.0),
                     dn_direct=jnp.where(daylight, dndir, 0.0))
    return total, clear


def solver_homogeneous_lw(config: RadiationConfig, band_from_g, cloud,
                          od, ssa, g, od_cloud, ssa_cloud, g_cloud,
                          planck_hl, emission, albedo):
    do_clear_scat = config.do_lw_aerosol_scattering
    clear, t_clear = solver_cloudless_lw(
        od, ssa, g, planck_hl, emission, albedo,
        do_scattering=do_clear_scat, want_trans=True)
    cloud_mask = (cloud.fraction
                  >= config.cloud_fraction_threshold)[..., None]
    od_t, ssa_t, g_t = combine_cloud_gas_lw(
        od, ssa, g, od_cloud, ssa_cloud, g_cloud, band_from_g,
        config.do_lw_cloud_scattering, cloud_mask=cloud_mask)
    planck_g = _gf(planck_hl)
    planck_top = planck_g[:-1]
    planck_bot = planck_g[1:]
    emis_g, alb_g = emission.T, albedo.T
    if config.do_lw_cloud_scattering:
        g1, g2 = ts.lw_gammas(_gf(ssa_t), _gf(g_t))
        r, t, su, sd = ts.lw_reftrans(_gf(od_t), g1, g2, planck_top,
                                      planck_bot)
        up, dn = adding_lw(r, t, su, sd, emis_g, alb_g, gfirst=True)
    else:
        t, su, sd = ts.lw_no_scattering_transmittance(
            _gf(od_t), planck_top, planck_bot)
        up, dn = lw_no_scattering_fluxes(t, su, sd, emis_g, alb_g,
                                         gfirst=True)
    total = LwFluxes(up=up, dn=dn)
    extras = {}
    if config.do_lw_derivatives:
        # all-sky transmittance for columns with cloud, clear-sky
        # otherwise (radiation_homogeneous_lw.F90:301-307)
        from .lw_derivatives import lw_derivatives_ica
        col_cloudy = cloud_mask.any(axis=1)          # (ncol, 1)
        deriv_total = lw_derivatives_ica(t, up[-1].T, gfirst=True)
        deriv_clear = lw_derivatives_ica(t_clear, clear.up[-1].T,
                                         gfirst=True)
        extras["lw_derivatives"] = jnp.where(col_cloudy, deriv_total,
                                             deriv_clear)
    return total, clear, extras
