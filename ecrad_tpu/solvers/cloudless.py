"""Cloudless (clear-sky only) solvers.

Reference parity: radiation/radiation_cloudless_sw.F90:27 and
radiation_cloudless_lw.F90:24 — gas+aerosol optics only: per-g two-stream
reflectance/transmittance then one adding pass; LW uses the full adding
when scattering is on (aerosol LW scattering) or the fast no-scattering
path otherwise; SW zeroes columns with sun below the horizon.

All inputs (ncol, nlev, ng) TOA-first.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import two_stream as ts
from .adding import adding_lw, adding_sw, lw_no_scattering_fluxes


class LwFluxes(NamedTuple):
    up: jnp.ndarray          # (ncol, nlev+1, ng)
    dn: jnp.ndarray


class SwFluxes(NamedTuple):
    up: jnp.ndarray
    dn_diffuse: jnp.ndarray
    dn_direct: jnp.ndarray


def solver_cloudless_lw(od, ssa, g, planck_hl, emission, albedo,
                        do_scattering: bool, want_trans: bool = False):
    """od/ssa/g: (ncol, nlev, ng); planck_hl: (ncol, nlev+1, ng);
    emission/albedo: (ncol, ng).

    With want_trans the per-layer diffuse transmittance is returned too
    (for the ICA LW derivatives, radiation_cloudless_lw.F90:169)."""
    planck_top = planck_hl[:, :-1, :]
    planck_bot = planck_hl[:, 1:, :]
    if do_scattering:
        gamma1, gamma2 = ts.lw_gammas(ssa, g)
        ref, trans, src_up, src_dn = ts.lw_reftrans(
            od, gamma1, gamma2, planck_top, planck_bot)
        up, dn = adding_lw(ref, trans, src_up, src_dn, emission, albedo)
    else:
        trans, src_up, src_dn = ts.lw_no_scattering_transmittance(
            od, planck_top, planck_bot)
        up, dn = lw_no_scattering_fluxes(trans, src_up, src_dn,
                                         emission, albedo)
    fluxes = LwFluxes(up=up, dn=dn)
    if want_trans:
        return fluxes, trans
    return fluxes


def solver_cloudless_sw(od, ssa, g, incoming_toa, cos_sza,
                        albedo_diffuse, albedo_direct) -> SwFluxes:
    """incoming_toa/albedos: (ncol, ng); cos_sza: (ncol,)."""
    mu0 = jnp.maximum(cos_sza, 1e-10)[:, None, None]
    gamma1, gamma2, gamma3 = ts.sw_gammas(mu0, ssa, g)
    ref, trans, ref_dir, trans_dir_diff, trans_dir_dir = ts.sw_reftrans(
        mu0, od, ssa, gamma1, gamma2, gamma3)
    up, dn_diff, dn_dir = adding_sw(
        ref, trans, ref_dir, trans_dir_diff, trans_dir_dir,
        incoming_toa, albedo_diffuse, albedo_direct,
        jnp.maximum(cos_sza, 1e-10))
    # zero columns with sun below horizon (radiation_cloudless_sw.F90)
    daylight = (cos_sza > 0.0)[:, None, None]
    return SwFluxes(up=jnp.where(daylight, up, 0.0),
                    dn_diffuse=jnp.where(daylight, dn_diff, 0.0),
                    dn_direct=jnp.where(daylight, dn_dir, 0.0))
