#!/usr/bin/env python
"""Roofline utilization of the hot kernels on the attached TPU chip.

Methodology (round 2): XLA's cost analysis cannot see inside Pallas
kernels (their internal traffic/FLOPs are invisible) and the axon relay
adds ~25 ms latency to any wall-clock fetch, so:

  - The fused taumol kernels are measured from profiler DEVICE events
    (their custom-call entries) and compared against ANALYTIC ceilings
    computed from their true shapes: HBM bytes = packed coeff inputs +
    tau/pfrac outputs + one table fetch, MXU FLOPs = the one-hot class
    matmuls against the concatenated tables. Utilization = binding
    ceiling time / measured kernel time.
  - Full-stage numbers (gas optics jit, cloudless e2e) use the profiler
    program event for time and XLA cost analysis for traffic — labeled
    "xla_visible" because fused/Pallas-internal bytes are not counted.

Usage: python tools/roofline.py [ncol_tile]

Peaks default to TPU v5e (bf16 MXU 394 TFLOP/s; f32 matmuls via
Precision.HIGHEST run at roughly peak/6; HBM ~819 GB/s); override with
ECRAD_PEAK_TFLOPS / ECRAD_PEAK_GBS / ECRAD_F32_MXU_DERATE.
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def trace_device_events(fn, args, tag):
    """Run fn once traced; return (program_us, [(name, dur_us, src)])."""
    out = fn(*args)
    l0 = jax.tree.leaves(out)[0]
    float(l0.ravel()[0])
    d = f"/tmp/roofline_trace_{tag}_{time.time_ns()}"
    with jax.profiler.trace(d):
        out = fn(*args)
        l0 = jax.tree.leaves(out)[0]
        float(l0.ravel()[0])
    files = sorted(glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(files[-1], "rt") as f:
        t = json.load(f)
    prog = 0.0
    evs = []
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != 3 or "dur" not in e:
            continue
        if e.get("name", "").startswith("jit"):
            prog = max(prog, e["dur"])
            continue
        a = e.get("args", {})
        evs.append((e["name"], e["dur"], a.get("source", ""),
                    a.get("hlo_category", "")))
    return prog, evs


def taumol_kernel_ceilings(ncell):
    """Analytic (bytes, bf16_flops) per fused taumol kernel launch.

    The class matmuls run as single folded bf16 products against the
    *_fold tables (taumol_lw_fused._dot_fold); the MXU pads the
    contraction dim to 128 multiples, so the ceiling counts padded-k
    bf16 FLOPs at the bf16 peak. Per-table use counts: the LW tropo/
    strat tables are multiplied by BOTH temperature-family one-hots."""
    from ecrad_tpu.optics.rrtmg.gas_optics import load_tables
    from ecrad_tpu.optics.rrtmg import taumol_lw_fused as lwf
    from ecrad_tpu.optics.rrtmg import taumol_sw_fused as swf

    t = load_tables()
    fdl = lwf.build_lw_fused(t)
    fds = swf.build_sw_fused(t)

    def kernel_cost(fd, tab_fields, uses, nf, ni, ng_out, nout):
        tables = sum(np.asarray(getattr(fd, k)).nbytes
                     for k in tab_fields)
        bytes_ = ncell * 4 * (nf + ni + ng_out * nout) + tables
        flops = 0
        for k, n_uses in uses.items():
            v = np.asarray(getattr(fd, k))
            kpad = -(-v.shape[1] // 128) * 128
            flops += 2 * v.shape[0] * kpad * ncell * n_uses
        return bytes_, flops

    lw = kernel_cost(
        fdl, lwf.TAB_FIELDS,
        {"tropo_fold": 2, "strat_fold": 2, "sf_fold": 1,
         "minor_fold": 1, "pf_fold": 1},
        len(lwf.F_FIELDS), len(lwf.I_FIELDS), 140, 2)
    sw = kernel_cost(
        fds, swf.TAB_FIELDS_SW,
        {"tropo_fold": 1, "strat_fold": 1, "sf_fold": 1,
         "rayl24_fold": 1},
        len(swf.F_FIELDS_SW), len(swf.I_FIELDS_SW), 112, 2)
    return {"taumol_lw_fused": lw, "taumol_sw_fused": sw}


def main():
    from bench import tile_columns
    from ecrad_tpu.config import RadiationConfig, Solver
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.optics.rrtmg.gas_optics import gas_optics

    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    peak_tflops = float(os.environ.get("ECRAD_PEAK_TFLOPS", "394"))
    peak_gbs = float(os.environ.get("ECRAD_PEAK_GBS", "819"))
    f32_derate = float(os.environ.get("ECRAD_F32_MXU_DERATE", "6"))
    mxu_f32 = peak_tflops / f32_derate

    sl, thermo, gas, cloud, aer = read_input(
        "/root/reference/test/ifs/ecrad_meridian.nc")
    batch = tile_columns((sl, thermo, gas, cloud, aer), tile)
    sl, thermo, gas, cloud, aer = batch
    ncol = sl.cos_sza.shape[0]
    nlev = thermo.pressure_hl.shape[1] - 1

    cfg = RadiationConfig(i_solver_sw=Solver.CLOUDLESS,
                          i_solver_lw=Solver.CLOUDLESS,
                          use_aerosols=False,
                          directory_name="/root/reference/data")
    setup = setup_radiation(cfg)

    go = jax.jit(lambda p, t, g, st, mu, alb: gas_optics(
        p, t, g, st, mu, sl.solar_irradiance, setup.spec,
        lw_albedo=alb))
    n_g_lw = len(setup.spec.band_from_g_lw)
    go_args = (thermo.pressure_hl, thermo.temperature_hl,
               gas.mixing_ratio, sl.skin_temperature, sl.cos_sza,
               jnp.zeros((ncol, n_g_lw), jnp.float32))

    results = {}
    print(f"ncol={ncol} nlev={nlev}  peaks: {peak_tflops} TFLOP/s bf16 "
          f"(f32 MXU ~{mxu_f32:.0f}), {peak_gbs} GB/s HBM")

    # ---- fused taumol kernels: device events + analytic ceilings --------
    prog_us, evs = trace_device_events(go, go_args, "gas")
    ceilings = taumol_kernel_ceilings(ncol * nlev)
    for kname, (nbytes, flops) in ceilings.items():
        src = f"{kname.split('_fused')[0]}_fused.py"
        dur_us = sum(d for (_, d, s, c) in evs
                     if src in s and c == "custom-call")
        if dur_us == 0:      # kernel path not taken (CPU etc.)
            continue
        t_mem = nbytes / (peak_gbs * 1e9)
        t_mxu = flops / (peak_tflops * 1e12)    # bf16 padded-k flops
        bound = max(t_mem, t_mxu)
        results[kname] = {
            "time_ms": round(dur_us / 1e3, 3),
            "analytic_gb": round(nbytes / 1e9, 3),
            "analytic_gflop_bf16_padded": round(flops / 1e9, 1),
            "binding_ceiling": "mxu_bf16" if t_mxu > t_mem else "memory",
            "roofline_fraction": round(bound / (dur_us / 1e6), 3),
        }

    # ---- stage-level numbers (XLA-visible traffic) -----------------------
    def xla_visible(fn, args, prog_us, label):
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        nbytes = float(c.get("bytes accessed", 0.0))
        flops = float(c.get("flops", 0.0))
        dt = prog_us / 1e6
        t_mem = nbytes / (peak_gbs * 1e9)
        t_fl = flops / (peak_tflops * 1e12)
        results[label] = {
            "time_ms": round(prog_us / 1e3, 2),
            "cols_per_s": round(ncol / dt, 1),
            "xla_visible_gbs": round(nbytes / dt / 1e9, 1),
            "binding_ceiling": "memory" if t_mem > t_fl else "compute",
            "roofline_fraction_xla_visible": round(
                max(t_mem, t_fl) / dt, 3),
        }

    xla_visible(lambda *a: go(*a), go_args, prog_us,
                "gas_optics_stage(taumol+setcoef+planck)")

    full = jax.jit(lambda s, t, g, c, a: radiation(setup, s, t, g, c, a))
    prog_full, _ = trace_device_events(full, batch, "e2e")
    xla_visible(lambda *a: full(*a), batch, prog_full,
                "cloudless_e2e(gas+two_stream+adding)")

    for name, r in results.items():
        print(f"{name}:")
        for k, v in r.items():
            print(f"   {k}: {v}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
