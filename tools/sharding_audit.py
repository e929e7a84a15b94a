#!/usr/bin/env python
"""Measure, don't assert, the scaling story (round-4 verdict task 5).

Two artifacts, both produced on an 8-virtual-device CPU mesh (real
multi-chip hardware is not attached in this environment):

1. **Collective audit**: compile the column-sharded radiation step for
   the 8-device mesh and scan the optimized HLO for cross-device
   collectives (all-reduce / all-gather / reduce-scatter /
   collective-permute / all-to-all). SURVEY §2.8's design claim — the
   physics is embarrassingly parallel over columns, collectives only
   at I/O — must show up as ZERO collectives in the compiled hot
   step. (The reference's analogue: its OpenMP block loop is
   communication-free, driver/ecrad_driver.F90:277-305.)

2. **Virtual-device scaling**: parallel/scaling.py::scaling_benchmark
   at 1/2/4/8 virtual devices. CAVEAT recorded with the numbers:
   virtual CPU devices share one host's cores, so efficiency is a
   software-overhead proxy (sharding machinery, dispatch), not a
   hardware scaling measurement — real multi-chip must wait for
   hardware.

Prints one JSON line; bench.py runs this in a CPU subprocess and
forwards the artifact lines into BENCH.

    python tools/sharding_audit.py
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__" and os.environ.get("ECRAD_AUDIT_CHILD") != "1":
    # re-exec with a clean CPU environment (the axon sitecustomize
    # freezes the TPU backend before XLA_FLAGS can act)
    import subprocess
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or os.path.dirname(HERE)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        ).strip()
    env["ECRAD_AUDIT_CHILD"] = "1"
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env)
    sys.exit(r.returncode)

sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402
import jax  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def audit_collectives():
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.parallel.sharding import column_mesh, shard_columns

    mesh = column_mesh(jax.devices()[:8])
    setup = setup_radiation(ge._flagship_config())
    args = shard_columns(ge._example_inputs(ncol=16, nlev=10), mesh)
    fn = jax.jit(lambda *a: radiation(setup, *a),
                 out_shardings=NamedSharding(mesh, P("columns")))
    compiled = fn.lower(*args).compile()
    hlo = compiled.as_text()
    counts = {}
    for name in COLLECTIVES:
        # match op invocations ("= all-reduce(") not metadata strings
        n = len(re.findall(rf"=\s*{name}", hlo)) \
            + len(re.findall(rf"=\s*\w+\s+{name}\(", hlo))
        if n:
            counts[name] = n
    return counts


def virtual_scaling():
    import __graft_entry__ as ge
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.parallel.scaling import scaling_benchmark

    setup = setup_radiation(ge._flagship_config())
    inputs = ge._example_inputs(ncol=256, nlev=20)
    return scaling_benchmark(
        lambda *a: radiation(setup, *a), inputs,
        device_counts=[1, 2, 4, 8], nrepeat=3)


def main():
    counts = audit_collectives()
    rows = virtual_scaling()
    out = {
        "collective_ops_in_hot_step": counts,
        "collective_audit_pass": not counts,
        "virtual_scaling": [
            {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in r.items()} for r in rows],
        "caveat": ("virtual CPU devices share one host; efficiency is "
                   "a software-overhead proxy, not hardware scaling"),
    }
    print(json.dumps(out))
    return 0 if not counts else 1


if __name__ == "__main__":
    sys.exit(main())
