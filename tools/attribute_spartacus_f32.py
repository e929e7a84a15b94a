#!/usr/bin/env python
"""Stage-by-stage f32 error attribution for the SPARTACUS solvers.

Round-4 verdict: SPARTACUS f32 output sits 5-10 W/m2 from f64 truth at
cloudy columns on BOTH backends (lw_dn worst), ~50x the rest of the
pipeline — an intrinsic f32 conditioning problem, not a kernel bug.
This tool attributes it: the whole pipeline runs in f64 with exactly
ONE stage computed in f32 (inputs cast down, stage in f32, outputs
cast back up):

    reftrans — the per-level Gamma-assembly -> expm -> solve pipeline
               (ops/spartacus_reftrans.py lw/sw_reftrans_levels)
    expm     — only the matrix exponentials inside reftrans
               (solvers/matrix.py expm_g / expm_sw_g)
    adding   — the two sequential adding sweeps
               (ops/spartacus_adding.py, forced via
               ECRAD_SPARTACUS_ADDING=interpret so the CPU run takes
               the same function seam as the TPU kernels)

plus all_f64 (floor) and all_f32 (the production precision).
Errors are max-abs W/m2 vs the all-f64 run over the meridian case.

    python tools/attribute_spartacus_f32.py [--stages s1,s2,...]
"""
import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

FIELDS = ("lw_up", "lw_dn", "sw_up", "sw_dn", "sw_dn_direct")


def _cast_tree(tree, dt):
    return jax.tree.map(
        lambda x: x.astype(dt)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def f32_stage(fn):
    """Wrap a stage fn: float args cast to f32, output cast back to
    f64. Non-array args (cfg, bools, ints) pass through untouched."""
    def wrapped(*args, **kw):
        args = tuple(
            _cast_tree(a, jnp.float32)
            if isinstance(a, (jnp.ndarray, jax.Array, tuple, list))
            else a for a in args)
        out = fn(*args, **kw)
        return _cast_tree(out, jnp.float64)
    return wrapped


def run(patches=(), adding_env=""):
    """Run the SPARTACUS meridian case in f64 with the given
    (module, attr) stage functions wrapped to f32."""
    from ecrad_tpu.config import Solver, load_config_from_namelist
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input
    inputs = read_input("/root/reference/test/ifs/ecrad_meridian.nc")
    cfg = load_config_from_namelist(
        "/root/reference/test/ifs/configCY47R1.nam",
        directory_name="/root/reference/data",
        do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
        do_canopy_fluxes_lw=False, i_solver_sw=Solver.SPARTACUS,
        i_solver_lw=Solver.SPARTACUS, do_3d_effects=True,
        dtype="float64")
    setup = setup_radiation(cfg)

    saved = []
    old_env = os.environ.get("ECRAD_SPARTACUS_ADDING")
    try:
        if adding_env:
            os.environ["ECRAD_SPARTACUS_ADDING"] = adding_env
        for mod, attr in patches:
            saved.append((mod, attr, getattr(mod, attr)))
            setattr(mod, attr, f32_stage(getattr(mod, attr)))
        return jax.jit(lambda *a: radiation(setup, *a))(*inputs)
    finally:
        for mod, attr, fn in saved:
            setattr(mod, attr, fn)
        if adding_env:
            if old_env is None:
                os.environ.pop("ECRAD_SPARTACUS_ADDING", None)
            else:
                os.environ["ECRAD_SPARTACUS_ADDING"] = old_env


def run_f32():
    from ecrad_tpu.config import Solver, load_config_from_namelist
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input
    inputs = read_input("/root/reference/test/ifs/ecrad_meridian.nc")
    cfg = load_config_from_namelist(
        "/root/reference/test/ifs/configCY47R1.nam",
        directory_name="/root/reference/data",
        do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
        do_canopy_fluxes_lw=False, i_solver_sw=Solver.SPARTACUS,
        i_solver_lw=Solver.SPARTACUS, do_3d_effects=True,
        dtype="float32")
    setup = setup_radiation(cfg)
    return jax.jit(lambda *a: radiation(setup, *a))(*inputs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="")
    args = ap.parse_args()

    import ecrad_tpu.ops.spartacus_adding as sa
    import ecrad_tpu.ops.spartacus_reftrans as srt
    import ecrad_tpu.solvers.spartacus_lw as slw
    import ecrad_tpu.solvers.spartacus_sw as ssw

    cases = {
        "all_f64": dict(),
        "lw_reftrans_f32": dict(
            patches=[(slw, "lw_reftrans_levels")]),
        "sw_reftrans_f32": dict(
            patches=[(ssw, "sw_reftrans_levels")]),
        "expm_f32": dict(
            patches=[(srt, "expm_reftrans_lw_g"),
                     (srt, "expm_reftrans_sw_g")]),
        "lw_adding_f32": dict(
            patches=[(sa, "lw_adding_sweeps")],
            adding_env="interpret"),
        "sw_adding_f32": dict(
            patches=[(sa, "sw_adding_sweeps")],
            adding_env="interpret"),
        "all_f32": None,
    }
    wanted = ([s.strip() for s in args.stages.split(",") if s.strip()]
              or list(cases))

    base = None
    print(f"{'variant':18s} " + " ".join(f"{f:>12s}" for f in FIELDS)
          + "   (max abs W/m2 vs all_f64)")
    for name in wanted:
        spec = cases[name]
        flux = run_f32() if spec is None else run(**spec)
        if name == "all_f64" or base is None:
            base = {f: np.asarray(getattr(flux, f), np.float64)
                    for f in FIELDS}
            if name == "all_f64":
                print(f"{name:18s} " + " ".join(
                    f"{0.0:12.4f}" for _ in FIELDS))
                continue
        errs = [np.abs(np.asarray(getattr(flux, f), np.float64)
                       - base[f]).max() for f in FIELDS]
        print(f"{name:18s} " + " ".join(f"{e:12.4f}" for e in errs))


if __name__ == "__main__":
    main()
