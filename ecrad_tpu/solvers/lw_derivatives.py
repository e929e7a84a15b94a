"""Longwave flux derivatives for Hogan & Bozzo (2015) approximate updates.

Reference parity: radiation/radiation_lw_derivatives.F90 — the derivative
of upwelling flux w.r.t. its surface value: per-g normalized surface flux
propagated up through the layer transmittances, summed over g. The
reference's upward loop is a reverse cumulative product over levels.
"""
from __future__ import annotations

import jax.numpy as jnp


def lw_derivatives_ica(transmittance, flux_up_surf):
    """transmittance (ncol, nlev, ng) TOA-first; flux_up_surf (ncol, ng).
    Returns (ncol, nlev+1) derivatives (surface value = 1)."""
    total = jnp.maximum(flux_up_surf.sum(-1, keepdims=True), 1e-30)
    norm = flux_up_surf / total                     # (ncol, ng)
    # P(l) = prod_{j >= l} trans(j): reverse cumprod along levels
    rev = jnp.flip(transmittance, axis=1)
    cum = jnp.cumprod(rev, axis=1)
    pprod = jnp.flip(cum, axis=1)                   # (ncol, nlev, ng)
    deriv_levels = (norm[:, None, :] * pprod).sum(-1)  # (ncol, nlev)
    ones = jnp.ones((transmittance.shape[0], 1), transmittance.dtype)
    return jnp.concatenate([deriv_levels, ones], axis=1)
