"""Solver dispatch (radiation_interface.F90:384-455).

Called from interface.radiation with precomputed gas+aerosol per-g
properties and band-resolved cloud properties. Returns
(total_fluxes, clear_fluxes, extras_dict) where extras carries
diagnostics like cloud cover and LW derivatives.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import Solver
from .homogeneous import solver_homogeneous_lw, solver_homogeneous_sw
from .mcica import solver_mcica_lw, solver_mcica_sw


def solve_lw(setup, single_level, thermodynamics, cloud, cloud_props,
             od, ssa, g, planck_hl, emission, albedo):
    cfg = setup.config
    od_cloud, ssa_cloud, g_cloud = cloud_props[:3]
    band_from_g = setup.spec.band_from_reordered_g_lw
    extras = {}
    if cfg.i_solver_lw == Solver.MCICA:
        total, clear, tcc, mcica_extras = solver_mcica_lw(
            cfg, setup.pdf_sampler, band_from_g, single_level.iseed,
            cloud, od, ssa, g, od_cloud, ssa_cloud, g_cloud,
            planck_hl, emission, albedo)
        extras["cloud_cover_lw"] = tcc
        extras.update(mcica_extras)
    elif cfg.i_solver_lw == Solver.HOMOGENEOUS:
        total, clear, homog_extras = solver_homogeneous_lw(
            cfg, band_from_g, cloud, od, ssa, g,
            od_cloud, ssa_cloud, g_cloud, planck_hl, emission, albedo)
        extras["cloud_cover_lw"] = (cloud.fraction
                                    >= cfg.cloud_fraction_threshold
                                    ).any(axis=1).astype(od.dtype)
        extras.update(homog_extras)
    elif cfg.i_solver_lw == Solver.TRIPLECLOUDS:
        from .tripleclouds import solver_tripleclouds_lw
        total, clear, tcc, tc_extras = solver_tripleclouds_lw(
            setup, single_level, cloud, od, ssa, g,
            od_cloud, ssa_cloud, g_cloud, planck_hl, emission, albedo)
        extras["cloud_cover_lw"] = tcc
        extras.update(tc_extras)
    elif cfg.i_solver_lw == Solver.SPARTACUS:
        from .spartacus_lw import solver_spartacus_lw
        total, clear, tcc, sp_extras = solver_spartacus_lw(
            setup, single_level, thermodynamics, cloud, od, ssa, g,
            od_cloud, ssa_cloud, g_cloud, planck_hl, emission, albedo)
        extras["cloud_cover_lw"] = tcc
        extras.update(sp_extras)
    else:
        raise NotImplementedError(cfg.i_solver_lw)
    return total, clear, extras


def solve_sw(setup, single_level, thermodynamics, cloud, cloud_props,
             od, ssa, g, incoming_sw, albedo_diffuse, albedo_direct):
    cfg = setup.config
    od_cloud, ssa_cloud, g_cloud = cloud_props[3:]
    band_from_g = setup.spec.band_from_reordered_g_sw
    extras = {}
    if cfg.i_solver_sw == Solver.MCICA:
        total, clear, tcc = solver_mcica_sw(
            cfg, setup.pdf_sampler, band_from_g, single_level.iseed,
            single_level.cos_sza, cloud, od, ssa, g,
            od_cloud, ssa_cloud, g_cloud, incoming_sw,
            albedo_diffuse, albedo_direct)
        extras["cloud_cover_sw"] = tcc
    elif cfg.i_solver_sw == Solver.HOMOGENEOUS:
        total, clear = solver_homogeneous_sw(
            cfg, band_from_g, cloud, od, ssa, g,
            od_cloud, ssa_cloud, g_cloud, incoming_sw,
            single_level.cos_sza, albedo_diffuse, albedo_direct)
        extras["cloud_cover_sw"] = (cloud.fraction
                                    >= cfg.cloud_fraction_threshold
                                    ).any(axis=1).astype(od.dtype)
    elif cfg.i_solver_sw == Solver.TRIPLECLOUDS:
        from .tripleclouds import solver_tripleclouds_sw
        total, clear, tcc = solver_tripleclouds_sw(
            setup, single_level, cloud, od, ssa, g,
            od_cloud, ssa_cloud, g_cloud, incoming_sw,
            albedo_diffuse, albedo_direct)
        extras["cloud_cover_sw"] = tcc
    elif cfg.i_solver_sw == Solver.SPARTACUS:
        from .spartacus_sw import solver_spartacus_sw
        total, clear, tcc, sp_extras = solver_spartacus_sw(
            setup, single_level, thermodynamics, cloud, od, ssa, g,
            od_cloud, ssa_cloud, g_cloud, incoming_sw,
            albedo_diffuse, albedo_direct)
        extras["cloud_cover_sw"] = tcc
        extras.update(sp_extras)
    else:
        raise NotImplementedError(cfg.i_solver_sw)
    return total, clear, extras
