"""Host-model coupling: the IFS RADIATION_SCHEME analogue.

Reference parity: ifs/radiation_scheme.F90 + the helper physics
parameterizations it calls:
  - liquid_effective_radius.F90 (Martin et al. 1994 from CCN; case 2)
  - ice_effective_radius.F90 (Sun & Rikus 1999 rev. Sun 2001)
  - cloud_overlap_decorr_len.F90 (latitude-dependent decorrelation)

`radiation_scheme` packs raw host-model arrays into the framework's
types, computes effective radii & overlap, runs radiation() and returns
fluxes — the entry point a large-scale model embeds.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import GAS_INDEX
from .interface import RadiationSetup, radiation
from .types import Aerosol, Cloud, GasConcs, SingleLevel, Thermodynamics

RD = 287.058
RTT = 273.16
RRE2DE = 0.64952  # effective radius / effective diameter (Fu convention)


def liquid_effective_radius(pressure, temperature, cloud_frac, q_liq,
                            q_rain, land_frac, ccn_land=900.0,
                            ccn_sea=50.0):
    """Martin et al. (1994) droplet effective radius in metres
    (ifs/liquid_effective_radius.F90 case 2)."""
    land = land_frac >= 0.5
    spectral_dispersion = jnp.where(land, 0.69, 0.77)
    ccn = jnp.where(land, ccn_land, ccn_sea)
    ntot_cm3 = jnp.where(
        land,
        -2.10e-4 * ccn * ccn + 0.568 * ccn - 27.9,
        -1.15e-3 * ccn * ccn + 0.963 * ccn + 5.30)
    ratio = (0.222 / spectral_dispersion) ** 0.333

    air_density_gm3 = 1000.0 * pressure / (RD * temperature)
    frac = jnp.maximum(cloud_frac, 1e-3)
    lwc = air_density_gm3 * q_liq / frac
    rwc = air_density_gm3 * q_rain / frac
    rain_ratio = rwc / jnp.maximum(lwc, 1e-12)
    # land-dependent factors carry a trailing singleton level axis from
    # the caller's land_frac[:, None]; they broadcast against (ncol, nlev)
    wood_factor = jnp.where(
        lwc > 1e-12,
        (1.0 + rain_ratio) ** 0.666
        / (1.0 + 0.2 * ratio * rain_ratio), 1.0)
    re_cubed = (3.0 * (lwc + rwc)) / (
        4.0 * np.pi * (ntot_cm3 * spectral_dispersion))
    re_um = jnp.where(
        re_cubed > 1e-12,
        jnp.clip(wood_factor * 100.0
                 * jnp.exp(0.333 * jnp.log(jnp.maximum(re_cubed, 1e-12))),
                 4.0, 30.0), 4.0)
    active = (cloud_frac >= 0.001) & (q_liq + q_rain > 0.0)
    return jnp.where(active, re_um, 4.0) * 1e-6


def ice_effective_radius(pressure, temperature, cloud_frac, q_ice,
                         q_snow, min_diameter_um=20.0):
    """Sun & Rikus (1999) rev. Sun (2001) ice effective radius (m)
    (ifs/ice_effective_radius.F90 case 1)."""
    air_density_gm3 = 1000.0 * pressure / (RD * temperature)
    frac = jnp.maximum(cloud_frac, 1e-3)
    iwc = air_density_gm3 * (q_ice + q_snow) / frac
    t_c = temperature - RTT
    aiwc = 45.8966 * jnp.maximum(iwc, 1e-12) ** 0.2214
    biwc = 0.7957 * jnp.maximum(iwc, 1e-12) ** 0.2535
    diameter_um = ((1.2351 + 0.0105 * t_c)
                   * (aiwc + biwc * (temperature - 83.15)))
    diameter_um = jnp.clip(diameter_um, min_diameter_um, 155.0)
    active = (cloud_frac >= 0.001) & (q_ice + q_snow > 0.0)
    return jnp.where(active, diameter_um * RRE2DE, 80.0 * RRE2DE) * 1e-6


def cloud_overlap_decorr_len(sin_latitude, scheme=1):
    """Latitude-dependent overlap decorrelation length in km
    (ifs/cloud_overlap_decorr_len.F90)."""
    if scheme == 1:
        abs_lat_deg = jnp.abs(jnp.arcsin(sin_latitude)) * (180.0 / np.pi)
        return 2.899 - 0.02759 * abs_lat_deg
    cos_lat = jnp.cos(jnp.arcsin(sin_latitude))
    return 0.75 + 2.149 * cos_lat * cos_lat


def get_sw_weights(wavelength1: float, wavelength2: float):
    """Fractional overlap of a wavelength range with each SW band.

    Reference: radiation_config.F90:1304-1366 (get_sw_weights), used at
    setup for the UV (0.2-0.4415 um) and PAR (0.4-0.7 um) diagnostics
    (ifs/radiation_setup.F90:341-344). Returns (band_indices, weights)
    as numpy arrays (0-based)."""
    from .optics.rrtmg.gas_optics import WAVENUM1_SW, WAVENUM2_SW
    wn1 = 0.01 / wavelength2
    wn2 = 0.01 / wavelength1
    bands, weights = [], []
    for jband in range(len(WAVENUM1_SW)):
        if wn1 < WAVENUM2_SW[jband] and wn2 > WAVENUM1_SW[jband]:
            bands.append(jband)
            weights.append(
                (min(wn2, WAVENUM2_SW[jband])
                 - max(wn1, WAVENUM1_SW[jband]))
                / (WAVENUM2_SW[jband] - WAVENUM1_SW[jband]))
    if not bands:
        raise ValueError(
            f"wavelength range {wavelength1}..{wavelength2} m outside "
            f"the shortwave bands")
    return np.asarray(bands), np.asarray(weights)


def uv_par_fluxes(flux):
    """Surface UV and PAR diagnostics from band-resolved surface fluxes
    (ifs/radiation_scheme.F90:467-482). Requires the flux to carry
    sw_dn_surf_band (config.do_surface_sw_spectral_flux).

    Returns (flux_uv, flux_par, flux_par_clear), each (ncol,)."""
    if flux.sw_dn_surf_band is None:
        raise ValueError("uv_par_fluxes needs do_surface_sw_spectral_flux")
    ib_uv, w_uv = get_sw_weights(0.2e-6, 0.4415e-6)
    ib_par, w_par = get_sw_weights(0.4e-6, 0.7e-6)
    wu = jnp.asarray(w_uv, flux.sw_dn_surf_band.dtype)
    wp = jnp.asarray(w_par, flux.sw_dn_surf_band.dtype)
    flux_uv = (flux.sw_dn_surf_band[:, ib_uv] * wu).sum(-1)
    flux_par = (flux.sw_dn_surf_band[:, ib_par] * wp).sum(-1)
    if flux.sw_dn_surf_clear_band is not None:
        flux_par_clear = (flux.sw_dn_surf_clear_band[:, ib_par]
                          * wp).sum(-1)
    else:
        flux_par_clear = jnp.zeros_like(flux_par)
    return flux_uv, flux_par, flux_par_clear


class HostOutputs(NamedTuple):
    """The diagnostics RADIATION_SCHEME hands back to the host model
    (ifs/radiation_scheme.F90:445-512), in IFS naming."""
    flux_sw: jnp.ndarray            # net SW profile (ncol, nlev+1)
    flux_lw: jnp.ndarray            # net LW profile
    flux_sw_clear: jnp.ndarray
    flux_lw_clear: jnp.ndarray
    flux_sw_dn: jnp.ndarray         # surface downwelling (ncol,)
    flux_lw_dn: jnp.ndarray
    flux_sw_dn_clear: jnp.ndarray
    flux_lw_dn_clear: jnp.ndarray
    flux_dir: jnp.ndarray           # surface direct SW
    flux_dir_clear: jnp.ndarray
    flux_dir_into_sun: jnp.ndarray  # direct normal irradiance
    flux_sw_dn_toa: jnp.ndarray
    flux_uv: jnp.ndarray
    flux_par: jnp.ndarray
    flux_par_clear: jnp.ndarray
    emis_out: jnp.ndarray           # effective broadband emissivity
    lw_derivative: Optional[jnp.ndarray]
    sw_diffuse_band: Optional[jnp.ndarray]  # (ncol, n_albedo_bands)
    sw_direct_band: Optional[jnp.ndarray]


SIGMA_SB = 5.670374419e-8


def unpack_host_outputs(setup: RadiationSetup, flux, *, cos_sza,
                        skin_temperature, lw_emissivity) -> HostOutputs:
    """Everything RADIATION_SCHEME computes after calling radiation()
    (ifs/radiation_scheme.F90:445-512): net-flux profiles, surface and
    TOA scalars, direct-normal irradiance, UV/PAR band sums, effective
    broadband emissivity, the Hogan-Bozzo LW derivative copy, and the
    per-albedo-band diffuse/direct surface SW fluxes used by the
    approximate SW update (LAPPROXSWUPDATE)."""
    net_sw = flux.sw_dn - flux.sw_up
    net_lw = flux.lw_dn - flux.lw_up
    net_sw_clear = flux.sw_dn_clear - flux.sw_up_clear
    net_lw_clear = flux.lw_dn_clear - flux.lw_up_clear

    sw_dn_surf = flux.sw_dn[:, -1]
    lw_dn_surf = flux.lw_dn[:, -1]
    fdir = flux.sw_dn_direct[:, -1]
    fdir_clear = (flux.sw_dn_direct_clear[:, -1]
                  if flux.sw_dn_direct_clear is not None
                  else jnp.zeros_like(fdir))
    mu0 = jnp.asarray(cos_sza)
    dir_into_sun = jnp.where(mu0 > 1e-10, fdir / jnp.maximum(mu0, 1e-10),
                             0.0)

    flux_uv, flux_par, flux_par_clear = uv_par_fluxes(flux)

    # effective broadband emissivity (ifs/radiation_scheme.F90:487-492)
    emissivity = (lw_emissivity if lw_emissivity.ndim == 1
                  else lw_emissivity[:, 0])
    black_net = lw_dn_surf - SIGMA_SB * skin_temperature ** 4
    emis_out = jnp.where(jnp.abs(black_net) > 1e-5,
                         net_lw[:, -1] / black_net, emissivity)

    sw_diffuse_band = sw_direct_band = None
    if (flux.sw_dn_surf_band is not None
            and flux.sw_dn_direct_surf_band is not None):
        if setup.sw_albedo_map is not None:
            alb_from_band = np.asarray(setup.sw_albedo_map)
        else:
            # weights form: assign each band to its dominant interval
            alb_from_band = np.argmax(
                np.asarray(setup.sw_albedo_weights), axis=0)
        n_alb = int(alb_from_band.max()) + 1
        onehot = jnp.asarray(
            alb_from_band[:, None] == np.arange(n_alb)[None, :],
            flux.sw_dn_surf_band.dtype)          # (n_bands, n_alb)
        diffuse = flux.sw_dn_surf_band - flux.sw_dn_direct_surf_band
        mm = lambda a, b: jnp.matmul(
            a, b, precision=jax.lax.Precision.HIGHEST)
        sw_diffuse_band = mm(diffuse, onehot)
        sw_direct_band = mm(flux.sw_dn_direct_surf_band, onehot)

    return HostOutputs(
        flux_sw=net_sw, flux_lw=net_lw, flux_sw_clear=net_sw_clear,
        flux_lw_clear=net_lw_clear, flux_sw_dn=sw_dn_surf,
        flux_lw_dn=lw_dn_surf,
        flux_sw_dn_clear=flux.sw_dn_clear[:, -1],
        flux_lw_dn_clear=flux.lw_dn_clear[:, -1],
        flux_dir=fdir, flux_dir_clear=fdir_clear,
        flux_dir_into_sun=dir_into_sun,
        flux_sw_dn_toa=flux.sw_dn[:, 0],
        flux_uv=flux_uv, flux_par=flux_par,
        flux_par_clear=flux_par_clear, emis_out=emis_out,
        lw_derivative=flux.lw_derivatives,
        sw_diffuse_band=sw_diffuse_band, sw_direct_band=sw_direct_band)


def radiation_scheme(setup: RadiationSetup, *, pressure_hl,
                     temperature_hl, cos_sza, skin_temperature,
                     sw_albedo, lw_emissivity, q, q_liq, q_ice,
                     cloud_frac, sin_latitude, land_frac,
                     co2_vmr=415e-6, ch4_vmr=1.8e-6, n2o_vmr=330e-9,
                     o3_mmr=None, q_rain=None, q_snow=None,
                     aerosol_mmr=None, solar_irradiance=1361.0,
                     iseed=None):
    """Pack raw host-model arrays, derive cloud microphysics inputs, run
    the radiation scheme (ifs/radiation_scheme.F90:237-442)."""
    ncol, nlevp1 = pressure_hl.shape
    nlev = nlevp1 - 1
    p_fl = 0.5 * (pressure_hl[:, :-1] + pressure_hl[:, 1:])
    t_fl = 0.5 * (temperature_hl[:, :-1] + temperature_hl[:, 1:])
    q_rain = q_rain if q_rain is not None else jnp.zeros_like(q_liq)
    q_snow = q_snow if q_snow is not None else jnp.zeros_like(q_ice)

    single_level = SingleLevel(
        cos_sza=cos_sza, skin_temperature=skin_temperature,
        sw_albedo=sw_albedo if sw_albedo.ndim == 2 else sw_albedo[:, None],
        lw_emissivity=(lw_emissivity if lw_emissivity.ndim == 2
                       else lw_emissivity[:, None]),
        solar_irradiance=float(solar_irradiance),
        iseed=(iseed if iseed is not None
               else jnp.arange(1, ncol + 1, dtype=jnp.int32)))
    thermo = Thermodynamics(pressure_hl=pressure_hl,
                            temperature_hl=temperature_hl)
    gas = GasConcs.create(ncol, nlev)
    gas = gas.put("h2o", q)
    gas = gas.put_well_mixed_vmr("co2", co2_vmr, ncol, nlev)
    gas = gas.put_well_mixed_vmr("ch4", ch4_vmr, ncol, nlev)
    gas = gas.put_well_mixed_vmr("n2o", n2o_vmr, ncol, nlev)
    gas = gas.put_well_mixed_vmr("o2", 0.20944, ncol, nlev)
    if o3_mmr is not None:
        gas = gas.put("o3", o3_mmr)

    re_liq = liquid_effective_radius(p_fl, t_fl, cloud_frac, q_liq,
                                     q_rain, land_frac[:, None])
    re_ice = ice_effective_radius(p_fl, t_fl, cloud_frac, q_ice, q_snow)
    decorr_km = cloud_overlap_decorr_len(sin_latitude)
    cloud = Cloud(q_liq=q_liq, q_ice=q_ice, re_liq=re_liq, re_ice=re_ice,
                  fraction=cloud_frac,
                  fractional_std=jnp.ones_like(cloud_frac))
    # per-column decorrelation length: use the column-mean (the overlap
    # parameter itself is per-interface via set_overlap_param)
    cloud = cloud.set_overlap_param(thermo,
                                    float(jnp.mean(decorr_km)) * 1000.0) \
        if not isinstance(decorr_km, jnp.ndarray) else \
        cloud.replace(overlap_param=_overlap_from_decorr(
            thermo, decorr_km * 1000.0))

    aerosol = (Aerosol(mixing_ratio=aerosol_mmr)
               if aerosol_mmr is not None else
               Aerosol(mixing_ratio=jnp.zeros((ncol, nlev, 1))))
    return radiation(setup, single_level, thermo, gas, cloud, aerosol)


def _overlap_from_decorr(thermo, decorr_len_m):
    """Per-column decorrelation length -> overlap parameter."""
    p = jnp.maximum(thermo.pressure_hl, 1.0)
    t = thermo.temperature_hl
    r_over_g = 287.0 / 9.80665
    dz = r_over_g * 0.5 * (t[:, :-1] + t[:, 1:]) * jnp.log(
        p[:, 1:] / p[:, :-1])
    sep = 0.5 * (dz[:, :-1] + dz[:, 1:])
    return jnp.exp(-jnp.abs(sep) / decorr_len_m[:, None])
