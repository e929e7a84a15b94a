"""Longwave flux derivatives for Hogan & Bozzo (2015) approximate updates.

Reference parity: radiation/radiation_lw_derivatives.F90 — the derivative
of upwelling broadband flux w.r.t. its surface value, computed from the
surface spectral fluxes and layer transmittances:

  - calc_lw_derivatives_ica (:42): per-g normalized surface flux
    propagated up through scalar layer transmittances (McICA,
    Homogeneous, Cloudless).
  - calc_lw_derivatives_region (:199): multi-region solvers without 3D
    effects (Tripleclouds) — overlap matrix U at each interface, then
    per-region scalar transmittance.
  - calc_lw_derivatives_matrix (:137): multi-region solvers with full
    transmittance matrices (SPARTACUS).

The reference's per-column upward loops become lax.scan over levels with
all columns/g-points batched; region-coupled forms use the g-minor
(nreg, ncol, ng) layout of the Tripleclouds/SPARTACUS solvers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalized_surface_flux(flux_up_surf):
    total = jnp.maximum(flux_up_surf.sum(-1, keepdims=True), 1e-30)
    return flux_up_surf / total


def lw_derivatives_ica(transmittance, flux_up_surf, gfirst=False):
    """transmittance (ncol, nlev, ng) TOA-first, or (nlev, ng, ncol)
    with gfirst=True; flux_up_surf (ncol, ng).
    Returns (ncol, nlev+1) derivatives (surface value = 1)."""
    norm = _normalized_surface_flux(flux_up_surf)   # (ncol, ng)
    lev_axis = 0 if gfirst else 1
    # P(l) = prod_{j >= l} trans(j): reverse cumprod along levels
    rev = jnp.flip(transmittance, axis=lev_axis)
    cum = jnp.cumprod(rev, axis=lev_axis)
    pprod = jnp.flip(cum, axis=lev_axis)
    if gfirst:
        deriv_levels = (norm.T[None] * pprod).sum(axis=1).T  # (ncol,nlev)
        ncol = transmittance.shape[-1]
    else:
        deriv_levels = (norm[:, None, :] * pprod).sum(-1)
        ncol = transmittance.shape[0]
    ones = jnp.ones((ncol, 1), transmittance.dtype)
    return jnp.concatenate([deriv_levels, ones], axis=1)


def lw_derivatives_region(trans_g, um_g, flux_up_surf, gfirst=False):
    """Region form (radiation_lw_derivatives.F90:199-257).

    trans_g: (nlev, nreg, ncol, ng) per-region diffuse transmittance
      (TOA-first), or (nlev, nreg, ng, ncol) with gfirst=True (the
      Tripleclouds solver's internal layout).
    um_g: (nlev+1, nreg, nreg, ncol, 1) (or (..., 1, ncol)) upward
      overlap matrices per interface (interface i sits above layer i).
    flux_up_surf: (ncol, ng) surface spectral up-flux summed over regions.
    Returns (ncol, nlev+1)."""
    nlev, nreg = trans_g.shape[:2]
    ncol = trans_g.shape[-1] if gfirst else trans_g.shape[-2]
    norm = _normalized_surface_flux(flux_up_surf)
    if gfirst:
        norm = norm.T
    # surface treated as a single clear-sky layer: region 1 only
    v0 = jnp.zeros((nreg,) + trans_g.shape[2:],
                   trans_g.dtype).at[0].set(norm)
    g_axis = 1 if gfirst else 2

    def body(v, xs):
        t_l, um_l = xs
        # overlap at the interface below this layer, then transmittance
        v = (um_l * v[None]).sum(axis=1)
        v = t_l * v
        return v, v.sum(axis=(0, g_axis))

    # upward sweep: layer nlev-1 uses U at interface nlev, ..., layer 0
    # uses U at interface 1
    _, derivs = jax.lax.scan(
        body, v0, (jnp.flip(trans_g, 0), jnp.flip(um_g[1:], 0)))
    deriv_levels = jnp.flip(jnp.moveaxis(derivs, 0, 1), 1)  # (ncol, nlev)
    ones = jnp.ones((ncol, 1), trans_g.dtype)
    return jnp.concatenate([deriv_levels, ones], axis=1)


def lw_derivatives_matrix(trans_g, um_g, flux_up_surf, gfirst=False):
    """Matrix form (radiation_lw_derivatives.F90:137-196).

    trans_g: (nlev, nreg, nreg, ncol, ng) layer transmittance matrices,
      or (nlev, nreg, nreg, ng, ncol) with gfirst=True (the SPARTACUS
      solver's internal layout).
    um_g/flux_up_surf: as in lw_derivatives_region (um_g batch dims
      follow trans_g's).
    Returns (ncol, nlev+1)."""
    nlev, nreg = trans_g.shape[:2]
    ncol = trans_g.shape[-1] if gfirst else trans_g.shape[-2]
    norm = _normalized_surface_flux(flux_up_surf)
    if gfirst:
        norm = norm.T
    v0 = jnp.zeros((nreg,) + trans_g.shape[3:],
                   trans_g.dtype).at[0].set(norm)
    g_axis = 1 if gfirst else 2

    def body(v, xs):
        t_l, um_l = xs
        v = (um_l * v[None]).sum(axis=1)
        v = (t_l * v[None, :]).sum(axis=1)          # mat x vec over regions
        return v, v.sum(axis=(0, g_axis))

    _, derivs = jax.lax.scan(
        body, v0, (jnp.flip(trans_g, 0), jnp.flip(um_g[1:], 0)))
    deriv_levels = jnp.flip(jnp.moveaxis(derivs, 0, 1), 1)
    ones = jnp.ones((ncol, 1), trans_g.dtype)
    return jnp.concatenate([deriv_levels, ones], axis=1)
