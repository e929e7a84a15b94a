#!/usr/bin/env python
"""Isolate the TPU-specific clear-sky SW f32 loss (round-5): run the
clear-sky SW pipeline stage by stage, saving each stage's output to
npz, on whatever backend this process has. Run once on TPU and once
on CPU, then compare: the stage whose TPU-vs-CPU divergence explains
the ~1.2 W/m2 flux difference is the culprit.

Stages (same seams as tools/attribute_f32_error.py):
  gas     — taumol + aerosol (od, ssa, g, incoming)
  reftrans— sw_gammas + Meador-Weaver  (FROM PINNED gas inputs)
  adding  — the ICA adding sweeps      (FROM PINNED reftrans inputs)

    python tools/diag_tpu_sw.py save /tmp/sw_tpu.npz        (on TPU)
    JAX_PLATFORMS=cpu python tools/diag_tpu_sw.py save /tmp/sw_cpu.npz
    python tools/diag_tpu_sw.py cmp /tmp/sw_tpu.npz /tmp/sw_cpu.npz
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def save(path):
    import jax
    import jax.numpy as jnp
    from ecrad_tpu.config import load_config_from_namelist
    from ecrad_tpu.interface import get_albedos, setup_radiation
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.optics.rrtmg.gas_optics import gas_optics
    from ecrad_tpu.optics.aerosol import add_aerosol_optics
    from ecrad_tpu.solvers import two_stream as ts
    from ecrad_tpu.solvers.adding import adding_sw
    from ecrad_tpu.solvers.cloudless import _gf

    inputs = read_input("/root/reference/test/ifs/ecrad_meridian.nc")
    single_level, thermo, gas, cloud, aerosol = inputs
    cfg = load_config_from_namelist(
        "/root/reference/test/ifs/configCY47R1.nam",
        directory_name="/root/reference/data",
        do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
        do_canopy_fluxes_lw=False)
    setup = setup_radiation(cfg)
    sw_alb_diff, sw_alb_dir, _ = get_albedos(setup, single_level)
    mu0 = jnp.maximum(single_level.cos_sza, 1e-10)

    @jax.jit
    def stage_gas(th, g, aer):
        go = gas_optics(
            th.pressure_hl, th.temperature_hl, g.mixing_ratio,
            single_level.skin_temperature, single_level.cos_sza,
            single_level.solar_irradiance, setup.spec,
            tables=setup.tables, min_gas_od_lw=cfg.min_gas_od_lw,
            min_gas_od_sw=cfg.min_gas_od_sw, dtype=jnp.float32)
        zl = jnp.zeros_like(go.od_lw)
        zs = jnp.zeros_like(go.od_sw)
        (_, _, _, od_sw, ssa_sw, g_sw) = add_aerosol_optics(
            setup, th, g, aer, go.od_lw, zl, zl,
            go.od_sw, go.ssa_sw, zs)
        return od_sw, ssa_sw, g_sw, go.incoming_sw

    od, ssa, gg, inc = stage_gas(thermo, gas, aerosol)

    @jax.jit
    def stage_reftrans(od, ssa, gg):
        od_g, ssa_g, g_g = _gf(od), _gf(ssa), _gf(gg)
        mu = mu0[None, :]
        g1, g2, g3 = ts.sw_gammas(mu, ssa_g, g_g)
        return ts.sw_reftrans(mu, od_g, ssa_g, g1, g2, g3)

    rt = stage_reftrans(od, ssa, gg)

    @jax.jit
    def stage_adding(rt, inc):
        return adding_sw(*rt, inc.T, sw_alb_diff.T, sw_alb_dir.T,
                         mu0, gfirst=True)

    up, dnd, dnr = stage_adding(rt, inc)
    daylight = np.asarray(single_level.cos_sza > 0.0)

    out = {
        "od": od, "ssa": ssa, "g": gg, "inc": inc,
        "ref": rt[0], "trans": rt[1], "ref_dir": rt[2],
        "tdd": rt[3], "tdir": rt[4],
        "up": np.asarray(up.sum(axis=1)).T * daylight[:, None],
        "dn": np.asarray((dnd + dnr).sum(axis=1)).T * daylight[:, None],
    }
    # cross-stage: reftrans + adding from PINNED CPU-f32 gas inputs if
    # a reference npz is present (written by the CPU run first)
    pin_path = os.environ.get("ECRAD_SW_PIN", "")
    if pin_path and os.path.exists(pin_path):
        pin = np.load(pin_path)
        rt2 = stage_reftrans(jnp.asarray(pin["od"]),
                             jnp.asarray(pin["ssa"]),
                             jnp.asarray(pin["g"]))
        for k, v in zip(("ref", "trans", "ref_dir", "tdd", "tdir"), rt2):
            out["pin_" + k] = v
        up2, dnd2, dnr2 = stage_adding(
            tuple(jnp.asarray(pin["pin_" + k]) if ("pin_" + k) in pin
                  else jnp.asarray(pin[k])
                  for k in ("ref", "trans", "ref_dir", "tdd", "tdir")),
            jnp.asarray(pin["inc"]))
        out["pin_up"] = np.asarray(up2.sum(axis=1)).T * daylight[:, None]
        out["pin_dn"] = np.asarray(
            (dnd2 + dnr2).sum(axis=1)).T * daylight[:, None]
    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in out.items()})
    print(f"wrote {path}")


def cmp(a_path, b_path):
    a = np.load(a_path)
    b = np.load(b_path)
    for k in a.files:
        if k not in b.files:
            continue
        x, y = a[k].astype(np.float64), b[k].astype(np.float64)
        scale = max(np.abs(y).max(), 1e-30)
        print(f"{k:12s} maxabs {np.abs(x - y).max():.4e}  "
              f"rel {np.abs(x - y).max() / scale:.3e}")


if __name__ == "__main__":
    if sys.argv[1] == "save":
        save(sys.argv[2])
    else:
        cmp(sys.argv[2], sys.argv[3])
