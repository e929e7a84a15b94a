#!/usr/bin/env python
"""Roofline utilization of the hot kernels on the attached TPU chip.

For each stage (RRTMG gas optics = the taumol/setcoef pipeline; the
two-stream + adding solver core via the Cloudless solver), measures
steady-state device time and reports achieved FLOP/s and HBM bytes/s
against chip peaks, using XLA's own cost analysis for the op counts.
The BASELINE.md target is taumol + two-stream at >=70% of the roofline
bound (i.e. of whichever ceiling — compute or bandwidth — binds).

Usage: python tools/roofline.py [ncol_tile]

Peaks default to TPU v5e (bf16 MXU 394 TFLOP/s, f32 ~ 1/4 of that on
the MXU, HBM ~819 GB/s); override with ECRAD_PEAK_TFLOPS / ECRAD_PEAK_GBS.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp


def measure(fn, args, nrepeat=8):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    # through the axon relay block_until_ready may not synchronize;
    # force execution by fetching a scalar (CLAUDE.md)
    float(jax.tree.leaves(out)[0].ravel()[0])
    times = []
    for _ in range(nrepeat):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def cost(fn, args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    from bench import tile_columns
    from ecrad_tpu.config import RadiationConfig, Solver
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.optics.rrtmg.gas_optics import gas_optics

    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    peak_tflops = float(os.environ.get("ECRAD_PEAK_TFLOPS", "394"))
    peak_gbs = float(os.environ.get("ECRAD_PEAK_GBS", "819"))

    sl, thermo, gas, cloud, aer = read_input(
        "/root/reference/test/ifs/ecrad_meridian.nc")
    batch = tile_columns((sl, thermo, gas, cloud, aer), tile)
    sl, thermo, gas, cloud, aer = batch
    ncol = sl.cos_sza.shape[0]

    cfg = RadiationConfig(i_solver_sw=Solver.CLOUDLESS,
                          i_solver_lw=Solver.CLOUDLESS,
                          use_aerosols=False,
                          directory_name="/root/reference/data")
    setup = setup_radiation(cfg)

    stages = {}

    go = jax.jit(lambda p, t, g, st, mu, alb: gas_optics(
        p, t, g, st, mu, sl.solar_irradiance, setup.spec,
        lw_albedo=alb))
    n_g_lw = len(setup.spec.band_from_g_lw)
    go_args = (thermo.pressure_hl, thermo.temperature_hl,
               gas.mixing_ratio, sl.skin_temperature, sl.cos_sza,
               jnp.zeros((ncol, n_g_lw), jnp.float32))
    stages["gas_optics(taumol+setcoef+planck)"] = (go, go_args)

    full = jax.jit(lambda s, t, g, c, a: radiation(setup, s, t, g, c, a))
    stages["cloudless e2e (gas optics + two-stream + adding)"] = (
        full, batch)

    print(f"ncol={ncol} nlev=137  peaks: {peak_tflops} TFLOP/s (bf16), "
          f"{peak_gbs} GB/s HBM")
    results = {}
    for name, (fn, args) in stages.items():
        flops, nbytes = cost(fn, args)
        dt = measure(fn, args)
        tflops = flops / dt / 1e12
        gbs = nbytes / dt / 1e9
        # roofline bound: time implied by the binding ceiling
        t_flop = flops / (peak_tflops * 1e12)
        t_mem = nbytes / (peak_gbs * 1e9)
        bound = max(t_flop, t_mem)
        util = bound / dt
        binding = "compute" if t_flop > t_mem else "memory"
        results[name] = {
            "time_ms": round(dt * 1e3, 2),
            "cols_per_s": round(ncol / dt, 1),
            "achieved_tflops": round(tflops, 2),
            "achieved_gbs": round(gbs, 1),
            "binding_ceiling": binding,
            "roofline_fraction": round(util, 3),
        }
        print(f"{name}:")
        for k, v in results[name].items():
            print(f"   {k}: {v}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
