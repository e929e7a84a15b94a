"""Write flux outputs to NetCDF.

Reference parity: radiation/radiation_save.F90:34-304 (save_fluxes) —
same variable names/units so downstream tooling (ecradplot,
compare_output.py) works unchanged.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..types import Flux, Thermodynamics
from .netcdf import write_netcdf


def save_fluxes(path: str, flux: Flux,
                thermodynamics: Optional[Thermodynamics] = None) -> None:
    dims = {}
    variables = {}
    attrs = {}

    def add(name, dims_needed, data, units, long_name):
        if data is None:
            return
        data = np.asarray(data)
        for dname, dlen in zip(dims_needed, data.shape):
            dims.setdefault(dname, dlen)
        variables[name] = (dims_needed, data.astype(np.float32))
        attrs[name] = {"units": units, "long_name": long_name}

    if thermodynamics is not None:
        add("pressure_hl", ("column", "half_level"),
            thermodynamics.pressure_hl, "Pa", "Pressure on half-levels")

    cl = ("column", "half_level")
    add("flux_up_lw", cl, flux.lw_up, "W m-2", "Upwelling longwave flux")
    add("flux_dn_lw", cl, flux.lw_dn, "W m-2", "Downwelling longwave flux")
    add("flux_up_sw", cl, flux.sw_up, "W m-2", "Upwelling shortwave flux")
    add("flux_dn_sw", cl, flux.sw_dn, "W m-2",
        "Downwelling shortwave flux")
    add("flux_dn_direct_sw", cl, flux.sw_dn_direct, "W m-2",
        "Downwelling direct shortwave flux")
    add("flux_up_lw_clear", cl, flux.lw_up_clear, "W m-2",
        "Upwelling clear-sky longwave flux")
    add("flux_dn_lw_clear", cl, flux.lw_dn_clear, "W m-2",
        "Downwelling clear-sky longwave flux")
    add("flux_up_sw_clear", cl, flux.sw_up_clear, "W m-2",
        "Upwelling clear-sky shortwave flux")
    add("flux_dn_sw_clear", cl, flux.sw_dn_clear, "W m-2",
        "Downwelling clear-sky shortwave flux")
    add("flux_dn_direct_sw_clear", cl, flux.sw_dn_direct_clear, "W m-2",
        "Downwelling clear-sky direct shortwave flux")
    add("lw_derivative", cl, flux.lw_derivatives, "1",
        "Derivative of upwelling LW flux w.r.t. surface value")
    add("cloud_cover_lw", ("column",), flux.cloud_cover_lw, "1",
        "Total cloud cover diagnosed by longwave solver")
    add("cloud_cover_sw", ("column",), flux.cloud_cover_sw, "1",
        "Total cloud cover diagnosed by shortwave solver")
    add("flux_dn_sw_surf_band", ("column", "band_sw"),
        flux.sw_dn_surf_band, "W m-2",
        "Surface downwelling shortwave flux in each band")
    add("flux_dn_direct_sw_surf_band", ("column", "band_sw"),
        flux.sw_dn_direct_surf_band, "W m-2",
        "Surface downwelling direct shortwave flux in each band")
    add("flux_dn_sw_surf_clear_band", ("column", "band_sw"),
        flux.sw_dn_surf_clear_band, "W m-2",
        "Surface clear-sky downwelling shortwave flux in each band")
    add("flux_dn_lw_surf_band", ("column", "band_lw"),
        flux.lw_dn_surf_band, "W m-2",
        "Surface downwelling longwave flux in each band")
    # band-resolved profiles (do_save_spectral_flux)
    p3 = ("column", "half_level", "band_sw")
    add("spectral_flux_up_sw", p3, flux.sw_up_band, "W m-2",
        "Spectral upwelling shortwave flux")
    add("spectral_flux_dn_sw", p3, flux.sw_dn_band, "W m-2",
        "Spectral downwelling shortwave flux")
    add("spectral_flux_dn_direct_sw", p3, flux.sw_dn_direct_band, "W m-2",
        "Spectral downwelling direct shortwave flux")
    p3l = ("column", "half_level", "band_lw")
    add("spectral_flux_up_lw", p3l, flux.lw_up_band, "W m-2",
        "Spectral upwelling longwave flux")
    add("spectral_flux_dn_lw", p3l, flux.lw_dn_band, "W m-2",
        "Spectral downwelling longwave flux")

    write_netcdf(path, dims, variables, attrs,
                 global_attrs={"title":
                               "Radiative fluxes from ecRad-TPU"})


def save_surface_fluxes(path: str, surface_flux) -> None:
    """Write per-facet surface fluxes.

    Reference parity: radsurf/radsurf_save.F90:24-140 — same variable
    names (flux_dn_lw_facet, absorption_sw_canopy, ...) and layout
    (column, facet)/(column, tile)."""
    dims = {}
    variables = {}
    attrs = {}

    def add(name, dims_needed, data, units, long_name):
        if data is None:
            return
        data = np.asarray(data)
        for dname, dlen in zip(dims_needed, data.shape):
            dims.setdefault(dname, dlen)
        variables[name] = (dims_needed, data.astype(np.float32))
        attrs[name] = {"units": units, "long_name": long_name}

    cf = ("column", "facet")
    ct = ("column", "tile")
    add("flux_dn_lw_facet", cf, surface_flux.lw_dn_facet, "W m-2",
        "Longwave flux into facet of surface")
    add("flux_up_lw_facet", cf, surface_flux.lw_up_facet, "W m-2",
        "Longwave flux out of facet of surface")
    add("absorption_lw_canopy", ct, surface_flux.lw_abs_canopy, "W m-2",
        "Longwave absorption by tile canopy")
    add("flux_dn_sw_facet", cf, surface_flux.sw_dn_facet, "W m-2",
        "Shortwave flux into facet of surface")
    add("flux_dn_direct_sw_facet", cf, surface_flux.sw_dn_direct_facet,
        "W m-2", "Shortwave direct flux into facet of surface")
    add("flux_up_sw_facet", cf, surface_flux.sw_up_facet, "W m-2",
        "Shortwave flux out of facet of surface")
    add("absorption_sw_canopy", ct, surface_flux.sw_abs_canopy, "W m-2",
        "Shortwave absorption by tile canopy")

    write_netcdf(path, dims, variables, attrs,
                 global_attrs={"title":
                               "Surface fluxes from ecRad-TPU"})
