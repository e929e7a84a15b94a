#!/usr/bin/env python
"""Benchmark harness: columns/sec on the 137-level LW+SW workload.

Runs on whatever jax.devices() provides (the real TPU chip under axon).
Prints one JSON line per benched solver; the LAST line is the headline
(McICA, the IFS operational configuration). `vs_baseline` compares
against the LATEST recorded round in BASELINE.json
("measured_r<N>_cols_per_sec_chip", highest N), so a regression vs the
previous round shows up as vs_baseline < 1 in the driver-captured
artifact.

With "all" (the default), two extra artifact lines are appended before
the headline when a real accelerator is attached: a kernel-equivalence
pass/fail (tools/check_kernel_equivalence.py: Pallas vs jnp fallback on
hardware) and the roofline fractions (tools/roofline.py), so a solver
or kernel regression is visible in the per-round BENCH record.

Environment:
  ECRAD_BENCH_SOLVER   Cloudless|Homogeneous|McICA|Tripleclouds|
                       SPARTACUS|all   (default: all)
  ECRAD_BENCH_TILE     batch = tile * 32 meridian columns
  ECRAD_BENCH_REPEAT   timing repeats (default 10, min taken)
  ECRAD_BENCH_EXTRAS   0 disables the equivalence/roofline lines
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


SOLVERS = ["Cloudless", "Homogeneous", "Tripleclouds", "SPARTACUS",
           "McICA"]          # McICA last: headline line


def bench_solver(solver, inputs, baselines):
    from ecrad_tpu.config import Overlap, RadiationConfig, Solver
    from ecrad_tpu.interface import radiation, setup_radiation

    kwargs = dict(
        use_aerosols=False,
        do_nearest_spectral_sw_albedo=False,
        sw_albedo_wavelength_bound=(0.25e-6, 0.44e-6, 0.69e-6, 1.19e-6,
                                    2.38e-6),
        i_sw_albedo_index=(1, 2, 3, 4, 5, 6),
        do_nearest_spectral_lw_emiss=True,
        lw_emiss_wavelength_bound=(8.0e-6, 13.0e-6),
        i_lw_emiss_index=(1, 2, 1),
        directory_name="/root/reference/data",
    )
    solver_enum = {
        "Cloudless": Solver.CLOUDLESS, "Homogeneous": Solver.HOMOGENEOUS,
        "McICA": Solver.MCICA, "Tripleclouds": Solver.TRIPLECLOUDS,
        "SPARTACUS": Solver.SPARTACUS}[solver]
    if solver == "McICA":
        kwargs["i_overlap_scheme"] = Overlap.EXPONENTIAL_EXPONENTIAL
    cfg = RadiationConfig(i_solver_sw=solver_enum,
                          i_solver_lw=solver_enum, **kwargs)
    setup = setup_radiation(cfg)

    # 2048 columns for all solvers. Round 4's fused adding-sweep
    # kernels changed the SPARTACUS batch calculus: 512 was fastest
    # when the scans were VPU-bound XLA ops (round 2/3), but with the
    # sweeps in VMEM-resident Pallas kernels the measured curve is
    # 256: 4485, 512: 5951, 1024: 6402, 2048: 6680 cols/s (histories
    # at 2048 cols are ~5.7 GB of the 16 GB HBM).
    default_tile = "64"
    factor = int(os.environ.get("ECRAD_BENCH_TILE", default_tile))
    batch = tile_columns(inputs, factor)
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
    base = baselines.get(solver.lower(), 0.0)
    env_base = float(os.environ.get("ECRAD_BASELINE_COLS_PER_SEC", "0"))
    if env_base > 0:
        base = env_base
    vs_baseline = cols_per_sec / base if base else 1.0
    return {
        "metric": f"{solver.lower()}_columns_per_sec_chip",
        "value": round(cols_per_sec, 1),
        "unit": "columns/s",
        "vs_baseline": round(vs_baseline, 3),
    }


ROOFLINE_BASE = {
    # stage fractions: round-2 values (ROOFLINE_r02.json)
    "roofline_gas_optics_stage": 0.817,
    "roofline_cloudless_e2e": 0.622,
    # kernel fractions: round-3 start on the NEW ceiling basis (bf16
    # padded-k flops of the folded single-matmul products at bf16 peak;
    # round 2's 0.21/0.312 were f32-equivalent flops at peak/6 and are
    # not comparable)
    "roofline_taumol_lw_fused": 0.302,
    "roofline_taumol_sw_fused": 0.232,
}


def golden_check_line(inputs):
    """Run the meridian SPARTACUS config on the attached chip and
    compare all flux fields against the CPU regression golden
    (tests/goldens/spartacus_meridian.npz) — the end-to-end analogue of
    the reference's golden-file strategy (test/ifs/Makefile:12-63), so
    production-path validation does not rest on kernel-unit
    equivalence alone. value = max relative error over fields;
    vs_baseline = 1.0 iff within tolerance (5e-4: TPU-vs-CPU f32
    reduction-order and transcendental differences measured ~1e-4)."""
    from ecrad_tpu.config import Solver, load_config_from_namelist
    from ecrad_tpu.interface import radiation, setup_radiation
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "tests", "goldens",
                        "spartacus_meridian.npz")
    golden = np.load(path)
    cfg = load_config_from_namelist(
        "/root/reference/test/ifs/configCY47R1.nam",
        directory_name="/root/reference/data",
        do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
        do_canopy_fluxes_lw=False, i_solver_sw=Solver.SPARTACUS,
        i_solver_lw=Solver.SPARTACUS, do_3d_effects=True)
    setup = setup_radiation(cfg)
    flux = jax.jit(lambda *a: radiation(setup, *a))(*inputs)
    worst = 0.0
    for key in golden.files:
        got = np.asarray(getattr(flux, key))
        want = golden[key]
        scale = max(np.abs(want).max(), 1.0)
        worst = max(worst, float(np.abs(got - want).max() / scale))
    tol = 5e-4
    return {"metric": "spartacus_tpu_vs_golden", "value": worst,
            "unit": "max_rel_err", "vs_baseline": float(worst < tol)}


def run_extras(inputs):
    """Kernel-equivalence + TPU-vs-golden + roofline artifact lines
    (subprocess / guarded so a failure there cannot take down the
    solver lines)."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    baselines = ROOFLINE_BASE
    lines = []

    try:
        lines.append(golden_check_line(inputs))
    except Exception as e:
        sys.stderr.write(f"spartacus golden check failed: {e}\n")
        lines.append({"metric": "spartacus_tpu_vs_golden", "value": -1.0,
                      "unit": "max_rel_err", "vs_baseline": 0.0})

    ok = 0
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(here, "tools",
                                          "check_kernel_equivalence.py")],
            capture_output=True, timeout=1800)
        ok = 1 if r.returncode == 0 else 0
        if not ok:
            sys.stderr.write(r.stdout.decode()[-2000:]
                             + r.stderr.decode()[-2000:])
    except Exception as e:
        sys.stderr.write(f"kernel equivalence run failed: {e}\n")
    lines.append({"metric": "kernel_equivalence_on_hw", "value": ok,
                  "unit": "pass", "vs_baseline": float(ok)})

    try:
        r = subprocess.run(
            [sys.executable, os.path.join(here, "tools", "roofline.py")],
            capture_output=True, timeout=1800)
        data = json.loads(r.stdout.decode().strip().splitlines()[-1])
        for key, label in (
                ("gas_optics_stage(taumol+setcoef+planck)",
                 "roofline_gas_optics_stage"),
                ("cloudless_e2e(gas+two_stream+adding)",
                 "roofline_cloudless_e2e")):
            frac = data[key].get("roofline_fraction_xla_visible",
                                 data[key].get("roofline_fraction"))
            base = baselines.get(label, 0.0)
            lines.append({
                "metric": label, "value": frac,
                "unit": "fraction_of_roofline",
                "vs_baseline": round(frac / base, 3) if base else 1.0})
        for key in ("taumol_lw_fused", "taumol_sw_fused"):
            base = baselines.get(f"roofline_{key}", 0.0)
            frac = data[key]["roofline_fraction"]
            lines.append({
                "metric": f"roofline_{key}", "value": frac,
                "unit": "fraction_of_analytic_ceiling",
                "vs_baseline": round(frac / base, 3) if base else 1.0})
    except Exception as e:
        sys.stderr.write(f"roofline run failed: {e}\n")
    return lines


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ecrad_tpu.io.input_reader import read_input

    try:
        with open(os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "BASELINE.json")) as f:
            rec = json.load(f)
        # ratchet: compare against the most recent recorded round
        keys = sorted(k for k in rec
                      if k.startswith("measured_r")
                      and k.endswith("_cols_per_sec_chip"))
        baselines = rec.get(keys[-1], {}) if keys else {}
        baselines = {k: float(v) for k, v in baselines.items()
                     if isinstance(v, (int, float))}
    except Exception:
        baselines = {}

    inputs = read_input("/root/reference/test/ifs/ecrad_meridian.nc")

    which = os.environ.get("ECRAD_BENCH_SOLVER", "all")
    solvers = SOLVERS if which == "all" else [which]
    # extras run FIRST so the per-solver lines sit immediately before
    # the headline and survive the driver's tail capture (the round-3
    # record lost them to truncated extras output); everything printed
    # is also written to BENCH_ARTIFACT.json as a durable record
    emitted = []

    def emit(line):
        emitted.append(line)
        print(json.dumps(line), flush=True)

    if (which == "all"
            and os.environ.get("ECRAD_BENCH_EXTRAS", "1") != "0"
            and jax.devices()[0].platform != "cpu"):
        for line in run_extras(inputs):
            emit(line)
    for solver in solvers:
        emit(bench_solver(solver, inputs, baselines))
    try:
        with open(os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "BENCH_ARTIFACT.json"),
                "w") as f:
            json.dump(emitted, f, indent=1)
    except Exception:
        pass


if __name__ == "__main__":
    main()
