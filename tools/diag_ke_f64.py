#!/usr/bin/env python
"""Diagnose the spartacus kernel-vs-fallback divergence against an f64
CPU truth: is the kernel or the XLA fallback closer to the truth at the
disagreeing elements?

Phase 1 (this script, CPU x64): recompute the check's exact random case
in f64 and save the outputs. Phase 2 (check_kernel_equivalence.py on
TPU) loads them and gates kernel error vs truth against fallback error
vs truth.
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


def make_case():
    """EXACTLY the random case of check_kernel_equivalence.py
    check_spartacus_reftrans (same seed/draw order)."""
    rng = np.random.RandomState(7)
    nreg, nlev, ng, ncol = 3, 7, 16, 133

    def r(*shape, lo=0.0, hi=1.0):
        return (lo + (hi - lo) * rng.rand(*shape)).astype(np.float32)

    od = r(nlev, nreg, ng, ncol, hi=6.0)
    ssa = r(nlev, nreg, ng, ncol, lo=0.05, hi=0.999)
    gg = r(nlev, nreg, ng, ncol, hi=0.8)
    trd = r(nlev, nreg, nreg, 1, ncol, hi=0.5)
    trf = r(nlev, nreg, nreg, 1, ncol, hi=0.5)
    mu0 = (0.05 + 0.95 * rng.rand(ncol)).astype(np.float32)
    mu0[::17] = 1e-10
    use3d = rng.rand(nlev, ng, ncol) > 0.4
    use3d[0] = False
    clear = rng.rand(nlev, ncol) > 0.7
    se = r(nlev, ng, ncol, lo=0.5, hi=1.0)
    pt = r(nlev, ng, ncol, hi=40.0)
    pb = r(nlev, ng, ncol, hi=40.0)
    fr = r(nlev, nreg, 1, ncol)
    return (od, ssa, gg, trd, trf, mu0, use3d, clear, se, pt, pb, fr)


def main():
    from ecrad_tpu.config import RadiationConfig
    from ecrad_tpu.ops.spartacus_reftrans import (lw_reftrans_levels,
                                                  sw_reftrans_levels)
    cfg = RadiationConfig()
    (od, ssa, gg, trd, trf, mu0, use3d, clear, se, pt, pb,
     fr) = make_case()

    def f64(x):
        return jnp.asarray(np.asarray(x, np.float64))

    sw = sw_reftrans_levels(cfg, 3, f64(od), f64(ssa), f64(gg),
                            f64(trd), f64(trf), f64(mu0),
                            jnp.asarray(use3d), jnp.asarray(clear),
                            False)
    lw = lw_reftrans_levels(cfg, 3, f64(od), f64(ssa), f64(gg),
                            f64(trd), f64(se), f64(pt), f64(pb),
                            f64(fr), jnp.asarray(use3d),
                            jnp.asarray(clear), False)
    out = {}
    for name, a in zip(("sw_R", "sw_T", "sw_RD", "sw_TD", "sw_TDD"), sw):
        out[name] = np.asarray(a)
    for name, a in zip(("lw_R", "lw_T", "lw_SU", "lw_SD"), lw):
        out[name] = np.asarray(a)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "goldens",
                        "ke_spartacus_f64.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
