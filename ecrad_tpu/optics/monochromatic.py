"""Monochromatic (single-wavelength toy) gas & cloud optics model.

Reference parity: radiation/radiation_monochromatic.F90:37-379 — optical
depth distributed proportionally to layer pressure mass, Planck either
sigma*T^4 (broadband) or single-wavelength; geometric-optics cloud optical
depths. Used for idealized tests (driver/test_solver.F90).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import RadiationConfig
from ..constants import ACCEL_DUE_TO_GRAVITY, STEFAN_BOLTZMANN

PLANCK = 6.62607015e-34
BOLTZMANN = 1.380649e-23
SPEED_OF_LIGHT = 299792458.0
DENSITY_LIQUID_WATER = 1000.0
DENSITY_SOLID_ICE = 916.7


def planck_function_mono(wavelength, temperature):
    """Spectral radiance (W sr-1 m-3), radiation_monochromatic.F90:348."""
    x = PLANCK * SPEED_OF_LIGHT / (wavelength * BOLTZMANN
                                   * jnp.maximum(temperature, 1e-3))
    val = (2.0 * PLANCK * SPEED_OF_LIGHT ** 2
           / (wavelength ** 5 * (jnp.exp(x) - 1.0)))
    return jnp.where(temperature > 0.0, val, 0.0)


class MonoGasOptics(NamedTuple):
    od_lw: jnp.ndarray       # (ncol, nlev, 1)
    od_sw: jnp.ndarray
    ssa_sw: jnp.ndarray
    planck_hl: jnp.ndarray   # (ncol, nlev+1, 1)
    lw_emission: jnp.ndarray  # (ncol, 1)
    incoming_sw: jnp.ndarray  # (ncol, 1)


def gas_optics_mono(config: RadiationConfig, single_level,
                    thermodynamics) -> MonoGasOptics:
    p_hl = thermodynamics.pressure_hl
    ncol, nlevp1 = p_hl.shape
    nlev = nlevp1 - 1
    # od fraction per layer ~ pressure mass fraction
    # (reference normalizes by pressure_hl(nlev), i.e. the SECOND-TO-LAST
    # half level, faithfully reproduced here)
    frac = (p_hl[:, 1:] - p_hl[:, :-1]) / jnp.maximum(p_hl[:, -2:-1],
                                                      1e-3)
    od_lw = (config.mono_lw_total_od * frac)[..., None]
    od_sw = (config.mono_sw_total_od * frac)[..., None]
    ssa_sw = jnp.full_like(od_sw, 0.999999)
    incoming_sw = jnp.full((ncol, 1), single_level.solar_irradiance)
    t_hl = thermodynamics.temperature_hl
    if config.mono_lw_wavelength <= 0.0:
        planck_hl = (STEFAN_BOLTZMANN * t_hl ** 4)[..., None]
        lw_emission = (STEFAN_BOLTZMANN
                       * single_level.skin_temperature ** 4
                       * single_level.lw_emissivity[:, 0])[:, None]
    else:
        wl = config.mono_lw_wavelength
        planck_hl = (np.pi * planck_function_mono(wl, t_hl))[..., None]
        lw_emission = (np.pi * planck_function_mono(
            wl, single_level.skin_temperature)
            * single_level.lw_emissivity[:, 0])[:, None]
    return MonoGasOptics(od_lw=od_lw, od_sw=od_sw, ssa_sw=ssa_sw,
                         planck_hl=planck_hl, lw_emission=lw_emission,
                         incoming_sw=incoming_sw)


def cloud_optics_mono(config: RadiationConfig, thermodynamics, cloud):
    """Geometric-optics cloud properties
    (radiation_monochromatic.F90:253-310). Returns the 6-tuple matching
    optics.cloud.cloud_optics with nbands=1."""
    dp = (thermodynamics.pressure_hl[:, 1:]
          - thermodynamics.pressure_hl[:, :-1])
    frac = cloud.fraction
    factor = dp / (ACCEL_DUE_TO_GRAVITY * jnp.maximum(frac, 1e-12))
    incloud = frac > 0.0
    lwp = jnp.where(incloud, factor * cloud.q_liq, 0.0)
    iwp = jnp.where(incloud, factor * cloud.q_ice, 0.0)
    od_sw = ((3.0 / (2.0 * DENSITY_LIQUID_WATER)) * lwp / cloud.re_liq
             + (3.0 / (2.0 * DENSITY_SOLID_ICE)) * iwp
             / cloud.re_ice)[..., None]
    od_lw = (lwp * 137.22
             + (3.0 / (2.0 * DENSITY_SOLID_ICE)) * iwp
             / cloud.re_ice)[..., None]
    ssa_sw = jnp.full_like(od_sw, config.mono_sw_single_scattering_albedo)
    g_sw = jnp.full_like(od_sw, config.mono_sw_asymmetry_factor)
    if config.do_lw_cloud_scattering:
        ssa_lw = jnp.full_like(od_lw,
                               config.mono_lw_single_scattering_albedo)
        g_lw = jnp.full_like(od_lw, config.mono_lw_asymmetry_factor)
    else:
        ssa_lw = jnp.zeros_like(od_lw)
        g_lw = jnp.zeros_like(od_lw)
        od_lw = od_lw * (1.0 - config.mono_lw_single_scattering_albedo)
    from .cloud import delta_eddington
    od_sw2, ssa_sw2, g_sw2 = delta_eddington(od_sw, ssa_sw, g_sw)
    cloudy = incloud[..., None]
    od_sw = jnp.where(cloudy, od_sw2, 0.0)
    ssa_sw = jnp.where(cloudy, ssa_sw2, 0.0)
    g_sw = jnp.where(cloudy, g_sw2, 0.0)
    if config.do_lw_cloud_scattering:
        od_lw2, ssa_lw2, g_lw2 = delta_eddington(od_lw, ssa_lw, g_lw)
        od_lw = jnp.where(cloudy, od_lw2, 0.0)
        ssa_lw = jnp.where(cloudy, ssa_lw2, 0.0)
        g_lw = jnp.where(cloudy, g_lw2, 0.0)
    else:
        od_lw = jnp.where(cloudy, od_lw, 0.0)
    return od_lw, ssa_lw, g_lw, od_sw, ssa_sw, g_sw
