#!/usr/bin/env python
"""Per-op device-time profile of a solver's full radiation() step.

Runs one jitted step on the attached TPU under jax.profiler.trace and
prints the top ops by total device time (trace-event pid==3 rows are
the device timeline through the axon relay; see CLAUDE.md). This is the
tool that answers "where do the milliseconds actually go" — XLA cost
analysis cannot see Pallas-internal traffic and logical bytes ignore
padding, so measured device time is the only trustworthy signal.

Usage: python tools/profile_ops.py [Solver] [tile] [top_n]
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax


def device_events(tracedir):
    """Yield (name, dur_us, args) device events from the newest trace."""
    files = sorted(glob.glob(os.path.join(
        tracedir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        raise SystemExit(f"no trace under {tracedir}")
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # device pids: process_name metadata announces TPU/device threads
    dev_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm or nm.startswith("Device"):
                dev_pids.add(ev["pid"])
    if not dev_pids:
        dev_pids = {3}
    for ev in trace["traceEvents"]:
        if (ev.get("ph") == "X" and ev.get("pid") in dev_pids
                and "dur" in ev):
            yield (ev.get("name", "?"), float(ev["dur"]),
                   ev.get("args", {}))


def main():
    from bench import tile_columns
    from ecrad_tpu.config import Overlap, RadiationConfig, Solver
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input

    which = sys.argv[1] if len(sys.argv) > 1 else "McICA"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

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
    s = {"Cloudless": Solver.CLOUDLESS, "Homogeneous": Solver.HOMOGENEOUS,
         "McICA": Solver.MCICA, "Tripleclouds": Solver.TRIPLECLOUDS,
         "SPARTACUS": Solver.SPARTACUS}[which]
    if which == "McICA":
        kwargs["i_overlap_scheme"] = Overlap.EXPONENTIAL_EXPONENTIAL
    cfg = RadiationConfig(i_solver_sw=s, i_solver_lw=s, **kwargs)
    setup = setup_radiation(cfg)

    inputs = read_input("/root/reference/test/ifs/ecrad_meridian.nc")
    batch = tile_columns(inputs, tile)
    ncol = batch[0].cos_sza.shape[0]

    fn = jax.jit(lambda *a: radiation(setup, *a))
    out = fn(*batch)
    float(out.lw_up[0, 0])        # force through the relay

    tracedir = os.environ.get("ECRAD_TRACE_DIR", "/tmp/ecrad_trace")
    with jax.profiler.trace(tracedir):
        out = fn(*batch)
        float(out.lw_up[0, 0])

    bycat = collections.Counter()
    bysrc = collections.Counter()
    calls = collections.Counter()
    program = 0.0
    for name, dur, a in device_events(tracedir):
        cat = a.get("hlo_category", "?")
        if name.startswith("jit"):
            program = max(program, dur)     # the whole jitted module
            continue
        bycat[cat] += dur
        if cat == "while":                  # bodies also appear as ops
            continue
        bysrc[a.get("source", "<none>")] += dur
        calls[a.get("source", "<none>")] += 1
    print(f"{which} tile={tile} ncol={ncol}: program device time "
          f"{program / 1e3:.2f} ms -> {ncol / (program / 1e6):.0f} "
          "cols/s")
    print("-- by HLO category (while double-counts its body ops) --")
    for cat, dur in bycat.most_common(12):
        print(f"   {cat:<28} {dur / 1e3:9.3f} ms")
    print("-- by source line (excl. while wrappers) --")
    for src, dur in bysrc.most_common(top_n):
        s = src.replace("/root/repo/tools/../", "")
        print(f"{s[-68:]:<68} {dur / 1e3:9.3f} {calls[src]:6d}")


if __name__ == "__main__":
    main()
