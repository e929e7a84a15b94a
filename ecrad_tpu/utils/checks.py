"""Physical-bounds checking of inputs and outputs.

Reference parity: radiation_config.F90:1799-1977 (out_of_physical_bounds
1d/2d/3d with optional auto-correction) and the driver-level checks
(driver/ecrad_driver.F90:245-254, :337). Returns findings rather than
aborting (jit-friendly); `validate_inputs` runs in numpy at ingest time
and can clamp like do_correct_unphysical_inputs.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# (name, min, max) bounds per physical field
INPUT_BOUNDS = {
    "cos_sza": (-1.0, 1.0),
    "skin_temperature": (100.0, 400.0),
    "sw_albedo": (0.0, 1.0),
    "sw_albedo_direct": (0.0, 1.0),
    "lw_emissivity": (0.0, 1.0),
    "pressure_hl": (0.0, 120000.0),
    "temperature_hl": (100.0, 400.0),
    "mixing_ratio": (0.0, 1.0),        # gas MMR
    "q_liq": (0.0, 0.1),
    "q_ice": (0.0, 0.1),
    "re_liq": (1.0e-7, 1.0e-3),
    "re_ice": (1.0e-7, 1.0e-3),
    "fraction": (0.0, 1.0),
    "overlap_param": (-0.5, 1.0),
    "fractional_std": (0.0, 10.0),
    "inv_cloud_effective_size": (0.0, 1.0),
    "inv_inhom_effective_size": (0.0, 1.0),
    "aerosol mixing_ratio": (0.0, 0.01),
}

FLUX_BOUNDS = {
    "lw_up": (0.0, 900.0),
    "lw_dn": (0.0, 800.0),
    "sw_up": (0.0, 1600.0),
    "sw_dn": (0.0, 1600.0),
    "sw_dn_direct": (0.0, 1600.0),
    "cloud_cover_lw": (-1.0, 1.0),
    "cloud_cover_sw": (-1.0, 1.0),
}


def check_field(name: str, data, bounds=None) -> Optional[str]:
    """Return a description of the violation, or None."""
    if data is None:
        return None
    bounds = bounds or INPUT_BOUNDS.get(name)
    if bounds is None:
        return None
    arr = np.asarray(data)
    if not np.isfinite(arr).all():
        return f"{name}: contains non-finite values"
    lo, hi = bounds
    amin, amax = arr.min(), arr.max()
    if amin < lo or amax > hi:
        return (f"{name}: range [{amin:.4g}, {amax:.4g}] outside "
                f"bounds [{lo:.4g}, {hi:.4g}]")
    return None


def validate_inputs(single_level, thermodynamics, gas, cloud=None,
                    aerosol=None, correct: bool = False) -> List[str]:
    """Check (and optionally clamp) all inputs. Returns findings.

    With correct=True, returns findings but the caller should use
    clamp_inputs() to obtain corrected pytrees."""
    findings = []
    for obj in (single_level, thermodynamics, gas, cloud, aerosol):
        if obj is None:
            continue
        for fname in getattr(obj, "__dataclass_fields__", {}):
            msg = check_field(fname, getattr(obj, fname, None))
            if msg:
                findings.append(msg)
    return findings


def clamp_inputs(single_level, thermodynamics, gas, cloud=None,
                 aerosol=None):
    """Clamp fields into physical bounds
    (do_correct_unphysical_inputs behaviour)."""
    def clamp(obj):
        if obj is None:
            return None
        updates = {}
        for fname in obj.__dataclass_fields__:
            val = getattr(obj, fname, None)
            bounds = INPUT_BOUNDS.get(fname)
            if val is None or bounds is None or not hasattr(val, "shape"):
                continue
            updates[fname] = jnp.clip(val, bounds[0], bounds[1])
        return obj.replace(**updates) if updates else obj

    return (clamp(single_level), clamp(thermodynamics), clamp(gas),
            clamp(cloud), clamp(aerosol))


def validate_fluxes(flux) -> List[str]:
    """Post-run flux sanity (driver/ecrad_driver.F90:337)."""
    findings = []
    for fname, bounds in FLUX_BOUNDS.items():
        msg = check_field(fname, getattr(flux, fname, None), bounds)
        if msg:
            findings.append(msg)
    return findings
