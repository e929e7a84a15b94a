"""Combine band-resolved cloud optical properties with per-g gas+aerosol
properties (radiation_mcica_sw.F90:220-274, radiation_homogeneous_*.F90).

cloud arrays are (ncol, nlev, nbands); gas arrays (ncol, nlev, ng);
band_from_g maps each (possibly reordered) g-point to its band.
od_scaling optionally scales the cloud optical depth per (ncol, nlev, ng)
(the McICA subcolumn scaling).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def combine_cloud_gas_sw(od, ssa, g, od_cloud, ssa_cloud, g_cloud,
                         band_from_g, od_scaling=None,
                         cloud_mask=None):
    """Returns (od_total, ssa_total, g_total)."""
    odc = od_cloud[:, :, band_from_g]
    ssac = ssa_cloud[:, :, band_from_g]
    gc = g_cloud[:, :, band_from_g]
    if od_scaling is not None:
        odc = odc * od_scaling
    od_total = od + odc
    scat_gas = ssa * od
    scat_cld = ssac * odc
    scat_od = scat_gas + scat_cld
    ssa_total = jnp.where(od_total > 0.0,
                          scat_od / jnp.maximum(od_total, 1e-30), 0.0)
    g_total = jnp.where(scat_od > 0.0,
                        (g * scat_gas + gc * scat_cld)
                        / jnp.maximum(scat_od, 1e-30), 0.0)
    if cloud_mask is not None:
        od_total = jnp.where(cloud_mask, od_total, od)
        ssa_total = jnp.where(cloud_mask, ssa_total, ssa)
        g_total = jnp.where(cloud_mask, g_total, g)
    return od_total, ssa_total, g_total


def combine_cloud_gas_lw(od, ssa, g, od_cloud, ssa_cloud, g_cloud,
                         band_from_g, do_lw_cloud_scattering,
                         od_scaling=None, cloud_mask=None):
    """LW combination: with cloud scattering the same mix as SW; without,
    cloud od is already absorption-only and ssa/g stay zero
    (radiation_mcica_lw.F90)."""
    odc = od_cloud[:, :, band_from_g]
    if od_scaling is not None:
        odc = odc * od_scaling
    if not do_lw_cloud_scattering:
        od_total = od + odc
        if cloud_mask is not None:
            od_total = jnp.where(cloud_mask, od_total, od)
        return od_total, jnp.zeros_like(od_total), jnp.zeros_like(od_total)
    ssac = ssa_cloud[:, :, band_from_g]
    gc = g_cloud[:, :, band_from_g]
    od_total = od + odc
    scat_gas = ssa * od
    scat_cld = ssac * odc
    scat_od = scat_gas + scat_cld
    ssa_total = jnp.where(od_total > 0.0,
                          scat_od / jnp.maximum(od_total, 1e-30), 0.0)
    g_total = jnp.where(scat_od > 0.0,
                        (g * scat_gas + gc * scat_cld)
                        / jnp.maximum(scat_od, 1e-30), 0.0)
    if cloud_mask is not None:
        od_total = jnp.where(cloud_mask, od_total, od)
        ssa_total = jnp.where(cloud_mask, ssa_total, ssa)
        g_total = jnp.where(cloud_mask, g_total, g)
    return od_total, ssa_total, g_total
