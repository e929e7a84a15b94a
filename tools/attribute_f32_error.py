#!/usr/bin/env python
"""Stage-by-stage f32 error attribution for the clear-sky SW path.

The f32-mode SW clear-sky fluxes differ from the reference golden by
~1 W/m2 max while an all-f64 run matches to ~1e-4 (the reference
builds in double precision; tests/test_f64_validation.py). This tool
attributes that gap to pipeline stages by running ONE stage in f32
(inputs cast down, stage computed in f32, outputs cast back up) with
everything else in f64:

    taumol   — gas optics (od_sw / ssa_sw / incoming_sw)
    reftrans — sw_gammas + Meador-Weaver sw_reftrans
    adding   — the adding_sw level scans

plus all-f64 (floor) and all-f32 (the production CPU number).
Reference baseline: test/ifs/ecrad_meridian_default_out_REFERENCE.nc.

    python tools/attribute_f32_error.py          (CPU, x64 enabled)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def main():
    from ecrad_tpu.config import load_config_from_namelist
    from ecrad_tpu.interface import get_albedos, setup_radiation
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.optics.rrtmg.gas_optics import gas_optics
    from ecrad_tpu.solvers import two_stream as ts
    from ecrad_tpu.solvers.adding import adding_sw
    from ecrad_tpu.solvers.cloudless import _gf
    from scipy.io import netcdf_file

    inputs = read_input("/root/reference/test/ifs/ecrad_meridian.nc")
    single_level, thermo, gas, cloud, aerosol = inputs
    cfg = load_config_from_namelist(
        "/root/reference/test/ifs/configCY47R1.nam",
        directory_name="/root/reference/data",
        do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
        do_canopy_fluxes_lw=False, dtype="float64")
    setup = setup_radiation(cfg)

    def cast(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jnp.floating)
            else x, tree)

    sl64 = cast(single_level, jnp.float64)
    th64 = cast(thermo, jnp.float64)
    gas64 = cast(gas, jnp.float64)
    sw_alb_diff, sw_alb_dir, _ = get_albedos(setup, sl64)

    def run_gas_optics(dt):
        from ecrad_tpu.optics.aerosol import add_aerosol_optics
        sl, th, g = (cast(sl64, dt), cast(th64, dt), cast(gas64, dt))
        go = gas_optics(
            th.pressure_hl, th.temperature_hl, g.mixing_ratio,
            sl.skin_temperature, sl.cos_sza, sl.solar_irradiance,
            setup.spec, tables=setup.tables,
            min_gas_od_lw=cfg.min_gas_od_lw,
            min_gas_od_sw=cfg.min_gas_od_sw, dtype=dt)
        zl = jnp.zeros_like(go.od_lw)
        zs = jnp.zeros_like(go.od_sw)
        aer = cast(aerosol, dt)
        (_, _, _, od_sw, ssa_sw, g_sw) = add_aerosol_optics(
            setup, th, g, aer, go.od_lw, zl, zl,
            go.od_sw, go.ssa_sw, zs)
        return (od_sw.astype(jnp.float64),
                ssa_sw.astype(jnp.float64),
                g_sw.astype(jnp.float64),
                go.incoming_sw.astype(jnp.float64))

    def run_reftrans(od, ssa, gg, mu0, dt):
        od_g = _gf(od).astype(dt)
        ssa_g = _gf(ssa).astype(dt)
        g_g = _gf(gg).astype(dt)
        mu = mu0.astype(dt)[None, :]
        g1, g2, g3 = ts.sw_gammas(mu, ssa_g, g_g)
        out = ts.sw_reftrans(mu, od_g, ssa_g, g1, g2, g3)
        return tuple(x.astype(jnp.float64) for x in out)

    def run_adding(rt, inc, mu0, dt):
        rt = tuple(x.astype(dt) for x in rt)
        out = adding_sw(*rt, inc.T.astype(dt),
                        sw_alb_diff.T.astype(dt),
                        sw_alb_dir.T.astype(dt),
                        mu0.astype(dt), gfirst=True)
        return tuple(x.astype(jnp.float64) for x in out)

    mu0 = jnp.maximum(sl64.cos_sza, 1e-10)
    daylight = np.asarray(sl64.cos_sza > 0.0)[None, :]

    ref = netcdf_file(
        "/root/reference/test/ifs/"
        "ecrad_meridian_default_out_REFERENCE.nc", mmap=False)
    ref_up = ref.variables["flux_up_sw_clear"][:].astype(np.float64)
    ref_dn = ref.variables["flux_dn_sw_clear"][:].astype(np.float64)

    def fluxes(variant):
        go_dt, rt_dt, add_dt, sum_dt = variant
        od, ssa, gg, inc = run_gas_optics(go_dt)
        rt = run_reftrans(od, ssa, gg, mu0, rt_dt)
        up, dnd, dnr = run_adding(rt, inc, mu0, add_dt)
        # the final spectral reduction (interface._gsum): 112 g-point
        # fluxes accumulated — the only stage left between adding and
        # the saved output
        up = np.asarray(up.astype(sum_dt).sum(axis=1),
                        np.float64).T * daylight.T
        dn = np.asarray((dnd + dnr).astype(sum_dt).sum(axis=1),
                        np.float64).T * daylight.T
        return up, dn

    f64, f32 = jnp.float64, jnp.float32
    cases = [
        ("all_f64", (f64, f64, f64, f64)),
        ("taumol_f32", (f32, f64, f64, f64)),
        ("reftrans_f32", (f64, f32, f64, f64)),
        ("adding_f32", (f64, f64, f32, f64)),
        ("gsum_f32", (f64, f64, f64, f32)),
        ("all_f32", (f32, f32, f32, f32)),
    ]
    up64 = dn64 = None
    print(f"{'variant':14s} {'up_vs_ref':>10s} {'dn_vs_ref':>10s} "
          f"{'up_vs_f64':>10s} {'dn_vs_f64':>10s}   (max abs, W/m2)")
    for name, variant in cases:
        up, dn = fluxes(variant)
        if name == "all_f64":
            up64, dn64 = up, dn
        print(f"{name:14s} {np.abs(up - ref_up).max():10.4f} "
              f"{np.abs(dn - ref_dn).max():10.4f} "
              f"{np.abs(up - up64).max():10.4f} "
              f"{np.abs(dn - dn64).max():10.4f}")


if __name__ == "__main__":
    main()
