"""Read driver input NetCDF files into the framework's data types.

Reference parity: driver/ecrad_driver_read_input.F90 — flexible variable
naming (`q` vs `h2o_mmr` vs `h2o_vmr`, per-gas `_mmr`/`_vmr` variants,
scalar vs per-column solar irradiance), per-column `iseed`, optional cloud
heterogeneity fields, aerosol 3-D read with (col, type, lev) permutation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import DriverConfig
from ..constants import GAS_NAMES
from ..types import Aerosol, Cloud, GasConcs, SingleLevel, Thermodynamics
from .netcdf import NetcdfFile


def read_input(path: str, driver_config: Optional[DriverConfig] = None,
               return_orientation: bool = False
               ) -> Tuple[SingleLevel, Thermodynamics, GasConcs, Cloud,
                          Aerosol]:
    dc = driver_config or DriverConfig()
    f = NetcdfFile(path)

    pressure_hl = f.read("pressure_hl")
    temperature_hl = f.read("temperature_hl")
    ncol, nlevp1 = pressure_hl.shape
    nlev = nlevp1 - 1

    # Reversed (height-increasing) input: the reference flips the level
    # axis, runs normally and flips fluxes back
    # (radiation_interface.F90:283-290, radiation_reverse :475-617). The
    # orientation check is host-side data, so the flip happens here at
    # ingest; the driver flips the output fluxes back (is_reversed).
    is_reversed = bool(pressure_hl[0, 1] < pressure_hl[0, 0])

    def orient(arr, level_axis=1, nlev_expected=None):
        if not is_reversed or arr is None or np.ndim(arr) <= level_axis:
            return arr
        n = np.shape(arr)[level_axis]
        if nlev_expected is not None and n not in (nlev, nlev + 1,
                                                   nlev - 1):
            return arr
        return np.flip(arr, axis=level_axis)

    pressure_hl = orient(pressure_hl)
    temperature_hl = orient(temperature_hl)

    # ---- single level -----------------------------------------------------
    cos_sza, _ = f.read_any(["cos_solar_zenith_angle", "cos_sza"])
    skin_t = f.read("skin_temperature")
    if skin_t.ndim == 2:
        # Tiled-surface input: (ncol, nfacet); the effective boundary
        # condition comes from the surface scheme later — use the first
        # (ground) facet here.
        skin_t = skin_t[:, 0]
    sw_albedo = f.read("sw_albedo")
    if sw_albedo.ndim == 1:
        sw_albedo = sw_albedo[:, None]
    elif sw_albedo.ndim == 3:           # tiled: (ncol, nfacet, nband)
        sw_albedo = sw_albedo[:, 0, :]
    sw_albedo_direct, _ = f.read_any(["sw_albedo_direct"])
    if sw_albedo_direct is not None and sw_albedo_direct.ndim == 1:
        sw_albedo_direct = sw_albedo_direct[:, None]
    elif sw_albedo_direct is not None and sw_albedo_direct.ndim == 3:
        sw_albedo_direct = sw_albedo_direct[:, 0, :]
    lw_emissivity = f.read("lw_emissivity")
    if lw_emissivity.ndim == 1:
        lw_emissivity = lw_emissivity[:, None]
    elif lw_emissivity.ndim == 3:
        lw_emissivity = lw_emissivity[:, 0, :]
    solar_irradiance = float(np.asarray(f.read("solar_irradiance",
                                               np.float64(1366.0))))
    if dc.solar_irradiance_override > 0.0:
        solar_irradiance = dc.solar_irradiance_override
    iseed, _ = f.read_any(["iseed"])
    if iseed is None:
        iseed = np.arange(1, ncol + 1)
    if dc.cos_sza_override >= 0.0:
        cos_sza = np.full(ncol, dc.cos_sza_override)
    if dc.skin_temperature_override >= 0.0:
        skin_t = np.full(ncol, dc.skin_temperature_override)
    if dc.sw_albedo_override >= 0.0:
        sw_albedo = np.full_like(sw_albedo, dc.sw_albedo_override)
        if sw_albedo_direct is not None:
            sw_albedo_direct = np.full_like(sw_albedo_direct,
                                            dc.sw_albedo_override)
    if dc.lw_emissivity_override >= 0.0:
        lw_emissivity = np.full_like(lw_emissivity,
                                     dc.lw_emissivity_override)

    single_level = SingleLevel(
        cos_sza=jnp.asarray(cos_sza, jnp.float32),
        skin_temperature=jnp.asarray(skin_t, jnp.float32),
        sw_albedo=jnp.asarray(sw_albedo, jnp.float32),
        sw_albedo_direct=(None if sw_albedo_direct is None
                          else jnp.asarray(sw_albedo_direct, jnp.float32)),
        lw_emissivity=jnp.asarray(lw_emissivity, jnp.float32),
        solar_irradiance=solar_irradiance,
        iseed=jnp.asarray(np.asarray(iseed), jnp.int32),
    )

    thermodynamics = Thermodynamics(
        pressure_hl=jnp.asarray(pressure_hl, jnp.float32),
        temperature_hl=jnp.asarray(temperature_hl, jnp.float32),
    )

    # ---- gases ------------------------------------------------------------
    gas = GasConcs.create(ncol, nlev)
    scalings = {
        "h2o": dc.h2o_scaling, "co2": dc.co2_scaling, "o3": dc.o3_scaling,
        "ch4": dc.ch4_scaling, "n2o": dc.n2o_scaling, "co": dc.co_scaling,
        "no2": dc.nox_scaling, "cfc11": dc.cfc11_scaling,
        "cfc12": dc.cfc12_scaling, "hcfc22": dc.hcfc22_scaling,
        "ccl4": dc.ccl4_scaling,
    }
    for name in GAS_NAMES:
        candidates = ([f"{name}_mmr", f"{name}_vmr", name]
                      if name != "h2o" else
                      ["q", "h2o_mmr", "h2o_vmr"])
        data, found = f.read_any(candidates)
        if data is None:
            continue
        if np.ndim(data) == 2:
            data = orient(data)
        data = jnp.asarray(data, jnp.float32)
        if found.endswith("_vmr"):
            gas = gas.put_vmr(name, data)
        else:
            gas = gas.put(name, data)
        s = scalings.get(name, 1.0)
        if s != 1.0:
            gas = gas.scale(name, s)

    # ---- cloud ------------------------------------------------------------
    q_liq, _ = f.read_any(["q_liquid", "q_liq"],
                          np.zeros((ncol, nlev)))
    q_ice, _ = f.read_any(["q_ice"], np.zeros((ncol, nlev)))
    re_liq, _ = f.read_any(["re_liquid"], np.full((ncol, nlev), 10e-6))
    re_ice, _ = f.read_any(["re_ice"], np.full((ncol, nlev), 50e-6))
    frac, _ = f.read_any(["cloud_fraction"], np.zeros((ncol, nlev)))
    q_liq, q_ice, re_liq, re_ice, frac = (
        orient(q_liq), orient(q_ice), orient(re_liq), orient(re_ice),
        orient(frac))
    if dc.cloud_fraction_override >= 0.0:
        frac = np.where(np.asarray(frac) > 0.0,
                        dc.cloud_fraction_override, 0.0)
    fsd, _ = f.read_any(["fractional_std"])
    fsd = orient(fsd)
    if dc.fractional_std > 0.0:
        fsd = np.full((ncol, nlev), dc.fractional_std)
    overlap, _ = f.read_any(["overlap_param"])
    overlap = orient(overlap)
    inv_eff, _ = f.read_any(["inv_cloud_effective_size"])
    inv_inhom, _ = f.read_any(["inv_inhom_effective_size"])
    inv_eff, inv_inhom = orient(inv_eff), orient(inv_inhom)
    if dc.high_inv_effective_size > 0.0 or dc.effective_size_scaling > 0.0:
        pass  # handled by driver-level overrides later
    cloud = Cloud(
        q_liq=jnp.asarray(q_liq, jnp.float32) * dc.q_liquid_scaling,
        q_ice=jnp.asarray(q_ice, jnp.float32) * dc.q_ice_scaling,
        re_liq=jnp.asarray(re_liq, jnp.float32),
        re_ice=jnp.asarray(re_ice, jnp.float32),
        fraction=jnp.asarray(frac, jnp.float32),
        fractional_std=(None if fsd is None
                        else jnp.asarray(fsd, jnp.float32)),
        overlap_param=(None if overlap is None
                       else jnp.asarray(overlap, jnp.float32)),
        inv_cloud_effective_size=(None if inv_eff is None
                                  else jnp.asarray(inv_eff, jnp.float32)),
        inv_inhom_effective_size=(None if inv_inhom is None
                                  else jnp.asarray(inv_inhom, jnp.float32)),
    )
    if dc.overlap_decorr_length > 0.0:
        cloud = cloud.set_overlap_param(thermodynamics,
                                        dc.overlap_decorr_length)
    elif cloud.overlap_param is not None and \
            dc.overlap_decorr_length_scaling > 0.0:
        # alpha -> alpha^(1/scaling) (ecrad_driver_read_input.F90:213-221)
        op = cloud.overlap_param
        cloud = cloud.replace(overlap_param=jnp.where(
            op > 0.0, op ** (1.0 / dc.overlap_decorr_length_scaling), op))
    elif cloud.overlap_param is not None and \
            dc.overlap_decorr_length_scaling == 0.0:
        cloud = cloud.replace(
            overlap_param=jnp.zeros_like(cloud.overlap_param))

    # ---- aerosol ----------------------------------------------------------
    aer_mmr, _ = f.read_any(["aerosol_mmr"])
    if aer_mmr is not None:
        # stored (col, type, lev) -> (col, lev, type)
        aer_mmr = orient(np.transpose(aer_mmr, (0, 2, 1)))
        aer_mmr = jnp.asarray(aer_mmr, jnp.float32)
        aerosol = Aerosol(mixing_ratio=aer_mmr, istartlev=0, iendlev=nlev)
    else:
        aerosol = Aerosol(mixing_ratio=jnp.zeros((ncol, nlev, 1),
                                                 jnp.float32))
    f.close()
    out = (single_level, thermodynamics, gas, cloud, aerosol)
    if return_orientation:
        return out + (is_reversed,)
    return out
