"""Cloudless (clear-sky only) solvers.

Reference parity: radiation/radiation_cloudless_sw.F90:27 and
radiation_cloudless_lw.F90:24 — gas+aerosol optics only: per-g two-stream
reflectance/transmittance then one adding pass; LW uses the full adding
when scattering is on (aerosol LW scattering) or the fast no-scattering
path otherwise; SW zeroes columns with sun below the horizon.

Layout: inputs arrive (ncol, nlev, ng) TOA-first from gas optics and are
transposed ONCE to the g-first (nlev, ng, ncol) form; everything
downstream (two-stream, adding scans) runs g-first and the flux
containers carry g-first (nlev+1, ng, ncol) profiles — the interface
reduces them (g sums, surface slices) without ever materializing an
(ncol, nlev+1, ng) spectral profile (see solvers/adding.py _to_gfirst
for the measured 2.2x scan-bandwidth rationale).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import two_stream as ts
from .adding import adding_lw, adding_sw, lw_no_scattering_fluxes


class LwFluxes(NamedTuple):
    up: jnp.ndarray          # (nlev+1, ng, ncol) g-first
    dn: jnp.ndarray


class SwFluxes(NamedTuple):
    up: jnp.ndarray          # (nlev+1, ng, ncol) g-first
    dn_diffuse: jnp.ndarray
    dn_direct: jnp.ndarray


def _gf(x):
    """(ncol, nlev, ng) -> (nlev, ng, ncol)."""
    return jnp.transpose(x, (1, 2, 0))


def solver_cloudless_lw(od, ssa, g, planck_hl, emission, albedo,
                        do_scattering: bool, want_trans: bool = False):
    """od/ssa/g: (ncol, nlev, ng); planck_hl: (ncol, nlev+1, ng);
    emission/albedo: (ncol, ng). Fluxes g-first (nlev+1, ng, ncol).

    With want_trans the per-layer diffuse transmittance is returned too,
    g-first (nlev, ng, ncol) (for the ICA LW derivatives,
    radiation_cloudless_lw.F90:169)."""
    od_g = _gf(od)
    planck_g = _gf(planck_hl)
    planck_top = planck_g[:-1]
    planck_bot = planck_g[1:]
    emis_g, alb_g = emission.T, albedo.T
    if do_scattering:
        gamma1, gamma2 = ts.lw_gammas(_gf(ssa), _gf(g))
        ref, trans, src_up, src_dn = ts.lw_reftrans(
            od_g, gamma1, gamma2, planck_top, planck_bot)
        up, dn = adding_lw(ref, trans, src_up, src_dn, emis_g, alb_g,
                           gfirst=True)
    else:
        trans, src_up, src_dn = ts.lw_no_scattering_transmittance(
            od_g, planck_top, planck_bot)
        up, dn = lw_no_scattering_fluxes(trans, src_up, src_dn,
                                         emis_g, alb_g, gfirst=True)
    fluxes = LwFluxes(up=up, dn=dn)
    if want_trans:
        return fluxes, trans
    return fluxes


def solver_cloudless_sw(od, ssa, g, incoming_toa, cos_sza,
                        albedo_diffuse, albedo_direct) -> SwFluxes:
    """incoming_toa/albedos: (ncol, ng); cos_sza: (ncol,).
    Fluxes g-first (nlev+1, ng, ncol)."""
    mu0 = jnp.maximum(cos_sza, 1e-10)[None, :]     # (1, ncol)
    od_g, ssa_g, g_g = _gf(od), _gf(ssa), _gf(g)
    gamma1, gamma2, gamma3 = ts.sw_gammas(mu0, ssa_g, g_g)
    ref, trans, ref_dir, trans_dir_diff, trans_dir_dir = ts.sw_reftrans(
        mu0, od_g, ssa_g, gamma1, gamma2, gamma3)
    up, dn_diff, dn_dir = adding_sw(
        ref, trans, ref_dir, trans_dir_diff, trans_dir_dir,
        incoming_toa.T, albedo_diffuse.T, albedo_direct.T,
        jnp.maximum(cos_sza, 1e-10), gfirst=True)
    # zero columns with sun below horizon (radiation_cloudless_sw.F90)
    daylight = (cos_sza > 0.0)[None, None, :]
    return SwFluxes(up=jnp.where(daylight, up, 0.0),
                    dn_diffuse=jnp.where(daylight, dn_diff, 0.0),
                    dn_direct=jnp.where(daylight, dn_dir, 0.0))
