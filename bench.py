#!/usr/bin/env python
"""Benchmark harness: columns/sec on the 137-level LW+SW workload.

Runs on whatever jax.devices() provides (the real TPU chip under axon).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md), so
vs_baseline is measured against ECRAD_BASELINE_COLS_PER_SEC if set in the
environment, else 1.0 (self-referential first measurement).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def tile_columns(pytree, factor):
    return jax.tree.map(
        lambda x: (jnp.tile(x, (factor,) + (1,) * (x.ndim - 1))
                   if hasattr(x, "ndim") and x.ndim > 0 else x), pytree)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ecrad_tpu.config import RadiationConfig, Solver, Overlap
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input

    input_nc = "/root/reference/test/ifs/ecrad_meridian.nc"
    sl, thermo, gas, cloud, aer = read_input(input_nc)

    # benchmark config: the most complete solver currently validated
    solver = os.environ.get("ECRAD_BENCH_SOLVER", "auto")
    kwargs = dict(
        use_aerosols=False,
        do_nearest_spectral_sw_albedo=False,
        sw_albedo_wavelength_bound=(0.25e-6, 0.44e-6, 0.69e-6, 1.19e-6,
                                    2.38e-6),
        i_sw_albedo_index=(1, 2, 3, 4, 5, 6),
        do_nearest_spectral_lw_emiss=True,
        lw_emiss_wavelength_bound=(8.0e-6, 13.0e-6),
        i_lw_emiss_index=(1, 2, 1),
    )
    solver_enum = Solver.CLOUDLESS
    metric_name = "cloudless_columns_per_sec_chip"
    if solver == "auto":
        solver = "McICA"
    if solver == "McICA":
        solver_enum = Solver.MCICA
        metric_name = "mcica_columns_per_sec_chip"
        kwargs["i_overlap_scheme"] = Overlap.EXPONENTIAL_EXPONENTIAL
        kwargs["directory_name"] = "/root/reference/data"
    elif solver == "Tripleclouds":
        solver_enum = Solver.TRIPLECLOUDS
        metric_name = "tripleclouds_columns_per_sec_chip"
        kwargs["directory_name"] = "/root/reference/data"
    elif solver == "Homogeneous":
        solver_enum = Solver.HOMOGENEOUS
        metric_name = "homogeneous_columns_per_sec_chip"
        kwargs["directory_name"] = "/root/reference/data"
    elif solver == "SPARTACUS":
        solver_enum = Solver.SPARTACUS
        metric_name = "spartacus_columns_per_sec_chip"
        kwargs["directory_name"] = "/root/reference/data"

    cfg = RadiationConfig(i_solver_sw=solver_enum, i_solver_lw=solver_enum,
                          **kwargs)
    setup = setup_radiation(cfg)

    # 2048 columns by default; SPARTACUS stores per-layer region-coupled
    # matrices ((nlev, 3, 3, ncol, ng) histories) so it benches at 512
    default_tile = "16" if solver == "SPARTACUS" else "64"
    factor = int(os.environ.get("ECRAD_BENCH_TILE", default_tile))
    batch = tile_columns((sl, thermo, gas, cloud, aer), factor)
    ncol = batch[0].cos_sza.shape[0]

    fn = jax.jit(lambda s, t, g, c, a: radiation(setup, s, t, g, c, a))
    # warmup/compile; fetch a scalar to force execution (through the
    # axon relay, block_until_ready alone does not wait)
    out = fn(*batch)
    float(out.lw_up[0, 0])

    nrepeat = int(os.environ.get("ECRAD_BENCH_REPEAT", "10"))
    times = []
    for _ in range(nrepeat):
        t0 = time.perf_counter()
        out = fn(*batch)
        float(out.lw_up[0, 0])
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    cols_per_sec = ncol / elapsed
    baseline = float(os.environ.get("ECRAD_BASELINE_COLS_PER_SEC", "0"))
    vs_baseline = cols_per_sec / baseline if baseline > 0 else 1.0
    print(json.dumps({
        "metric": metric_name,
        "value": round(cols_per_sec, 1),
        "unit": "columns/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
