#!/usr/bin/env python
"""Assert the Pallas gather-interp kernel matches the jnp.take fallback
on the attached TPU, for plain, eta, and mixed section lists.

Run on real hardware: python tools/check_kernel_equivalence.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ecrad_tpu.ops.gather_interp import (EtaSection, Section,
                                         eval_sections)


FAILURES = []


def main():
    rng = np.random.RandomState(0)
    n = 2048 * 9 + 133          # deliberately not a tile multiple

    def rand_plain(r, k, g):
        return Section(
            rng.rand(r, g).astype(np.float32),
            [jnp.asarray(rng.randint(0, r, n).astype(np.int32))
             for _ in range(k)],
            [jnp.asarray(rng.rand(n).astype(np.float32))
             for _ in range(k)])

    def rand_eta(r1, r2, g, gos, eos):
        return EtaSection(
            rng.rand(r1, r2, g).astype(np.float32),
            [jnp.asarray(rng.randint(0, r1 - 1, n).astype(np.int32))
             for _ in range(2)],
            [[(o, jnp.asarray(rng.rand(n).astype(np.float32)))
              for o in gos] for _ in range(2)],
            [jnp.asarray(rng.randint(1, r2 - 2, n).astype(np.int32))
             for _ in range(2)],
            [[(o, jnp.asarray(rng.rand(n).astype(np.float32)))
              for o in eos] for _ in range(2)])

    cases = {
        "plain": [rand_plain(65, 4, 12)],
        "eta_lw_absa": [rand_eta(65, 9, 12, (0, 1), (-1, 0, 1, 2))],
        "eta_lw_absb": [rand_eta(235, 5, 12, (0, 1), (0, 1))],
        "mixed": [rand_plain(10, 2, 12), rand_eta(19, 9, 12, (0, 1),
                                                  (0, 1)),
                  rand_plain(300, 4, 12)],
    }
    for name, secs in cases.items():
        ref = np.asarray(eval_sections(secs, n, use_pallas=False))
        got = np.asarray(eval_sections(secs, n, use_pallas=True))
        err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-30)
        status = "OK" if err < 5e-6 else "FAIL"
        print(f"{name}: rel err {err:.2e}  {status}")
        if err >= 5e-6:
            FAILURES.append(name)

    check_fused_taumol()
    check_spartacus_reftrans()
    check_adding_sweeps()
    # collect-then-assert so every comparison runs (a first-failure
    # abort left the LW kernel unverified on hardware in round 3)
    assert not FAILURES, f"kernel equivalence failures: {FAILURES}"
    print("kernel equivalence OK")


def check_adding_sweeps():
    """Fused adding-sweep Pallas kernels vs the lax.scan fallback,
    COMPILED on the attached accelerator with real meridian inputs
    (round-4 verdict: these kernels' only hardware validation was the
    e2e golden line). Covers ops/adding_fused.py level sweeps (ICA
    SW 3-sweep + LW 2-sweep via Homogeneous, Tripleclouds region
    sweeps) and ops/spartacus_adding.py up/down sweeps. Both paths
    consume identical reftrans histories on the same backend, so the
    comparison is tight (~f32 fusion-order wiggle only). Reference
    semantics: radiation_adding_ica_sw.F90:85-143,
    radiation_spartacus_sw.F90:930-1650."""
    from ecrad_tpu.config import Solver, load_config_from_namelist
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input

    inputs = read_input("/root/reference/test/ifs/ecrad_meridian.nc")

    def run(solver, kernel_mode, **kw):
        cfg = load_config_from_namelist(
            "/root/reference/test/ifs/configCY47R1.nam",
            directory_name="/root/reference/data",
            do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
            do_canopy_fluxes_lw=False, i_solver_sw=solver,
            i_solver_lw=solver, **kw)
        setup = setup_radiation(cfg)
        mode = "kernel" if kernel_mode else "scan"
        old = {k: os.environ.get(k) for k in
               ("ECRAD_ADDING", "ECRAD_SPARTACUS_ADDING")}
        try:
            os.environ["ECRAD_ADDING"] = mode
            os.environ["ECRAD_SPARTACUS_ADDING"] = mode
            return jax.jit(lambda *a: radiation(setup, *a))(*inputs)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for name, solver, kw in (
            ("adding_ica(homogeneous)", Solver.HOMOGENEOUS, {}),
            ("adding_tc(tripleclouds)", Solver.TRIPLECLOUDS, {}),
            ("spartacus_adding", Solver.SPARTACUS,
             {"do_3d_effects": True})):
        kf = run(solver, True, **kw)
        sf = run(solver, False, **kw)
        for field in ("lw_up", "lw_dn", "sw_up", "sw_dn"):
            a = np.asarray(getattr(kf, field))
            b = np.asarray(getattr(sf, field))
            scale = max(np.abs(b).max(), 1e-30)
            err = np.abs(a - b).max() / scale
            ok = err < 2e-5
            print(f"{name}.{field}: kernel-vs-scan rel err {err:.2e}"
                  f"  {'OK' if ok else 'FAIL'}")
            if not ok:
                FAILURES.append(f"{name}.{field}")


def check_spartacus_reftrans():
    """Fused SPARTACUS per-layer reftrans kernels (SW + LW) vs the jnp
    scan fallback. Both paths run the identical cell math; the kernel
    uses the static capped-norm squaring count, the fallback the
    dynamic batch max — per-lane masking makes them the same FMA
    sequence, so the comparison is tight."""
    from ecrad_tpu.config import RadiationConfig
    from ecrad_tpu.ops.spartacus_reftrans import (lw_reftrans_levels,
                                                  sw_reftrans_levels)

    cfg = RadiationConfig()
    rng = np.random.RandomState(7)
    nreg, nlev, ng, ncol = 3, 7, 16, 133    # ng*ncol not a tile multiple

    def r(*shape, lo=0.0, hi=1.0):
        return jnp.asarray(
            (lo + (hi - lo) * rng.rand(*shape)).astype(np.float32))

    od = r(nlev, nreg, ng, ncol, hi=6.0)
    ssa = r(nlev, nreg, ng, ncol, lo=0.05, hi=0.999)
    gg = r(nlev, nreg, ng, ncol, hi=0.8)
    trd = r(nlev, nreg, nreg, 1, ncol, hi=0.5)
    trf = r(nlev, nreg, nreg, 1, ncol, hi=0.5)
    mu0 = (0.05 + 0.95 * rng.rand(ncol)).astype(np.float32)
    # exercise the sub-horizon path: mu0 at the driver's 1e-10 clamp
    # (capped od/mu0 Gamma assembly) — these columns must still be
    # bit-equivalent between kernel and fallback
    mu0[::17] = 1e-10
    mu0 = jnp.asarray(mu0)
    use3d = jnp.asarray(rng.rand(nlev, ng, ncol) > 0.4)
    use3d = use3d.at[0].set(False)          # a no-3D level hits skip()
    clear = jnp.asarray(rng.rand(nlev, ncol) > 0.7)

    # f64 CPU truth for this exact case (tools/diag_ke_f64.py). The
    # direct-reflectance and LW source outputs amplify backend
    # transcendental ULP differences (Meador-Weaver k*mu0 resonance
    # 1/(1-k^2 mu0^2) capped at ~1e6, Planck-difference cancellation),
    # so Mosaic-vs-XLA disagreement up to ~1e-4 there is NOT a kernel
    # bug; the meaningful gate is that the kernel sits as close to the
    # f64 truth as the XLA fallback does.
    truth_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests",
        "goldens", "ke_spartacus_f64.npz")
    truth = np.load(truth_path) if os.path.exists(truth_path) else None

    def cmp(name, a, b, tol):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        err = np.abs(a - b).max() / scale
        key = name.replace("spartacus_", "")
        if err < tol:
            print(f"{name}: rel err {err:.2e}  OK")
            return
        if truth is not None and key in truth.files:
            t = truth[key]
            kerr = np.abs(a - t).max() / scale
            ferr = np.abs(b - t).max() / scale
            ok = kerr <= max(tol, 2.0 * ferr)
            print(f"{name}: rel err {err:.2e} kernel_vs_f64 "
                  f"{kerr:.2e} fallback_vs_f64 {ferr:.2e}  "
                  f"{'OK' if ok else 'FAIL'}")
            if not ok:
                FAILURES.append(name)
            return
        print(f"{name}: rel err {err:.2e}  FAIL")
        FAILURES.append(name)

    # all arrays as traced jit ARGUMENTS: a closed-over fallback side
    # could be constant-folded by the HLO evaluator off-device,
    # weakening the kernel-vs-device-fallback guarantee (ADVICE r3)
    run = jax.jit(lambda up, *a: sw_reftrans_levels(cfg, nreg, *a, up),
                  static_argnums=0)
    for name, a, b in zip(
            ("sw_R", "sw_T", "sw_RD", "sw_TD", "sw_TDD"),
            run(True, od, ssa, gg, trd, trf, mu0, use3d, clear),
            run(False, od, ssa, gg, trd, trf, mu0, use3d, clear)):
        cmp(f"spartacus_{name}", a, b, 2e-5)

    se = r(nlev, ng, ncol, lo=0.5, hi=1.0)
    pt = r(nlev, ng, ncol, hi=40.0)
    pb = r(nlev, ng, ncol, hi=40.0)
    fr = r(nlev, nreg, 1, ncol)
    runl = jax.jit(lambda up, *a: lw_reftrans_levels(cfg, nreg, *a, up),
                   static_argnums=0)
    for name, a, b in zip(
            ("lw_R", "lw_T", "lw_SU", "lw_SD"),
            runl(True, od, ssa, gg, trd, se, pt, pb, fr, use3d, clear),
            runl(False, od, ssa, gg, trd, se, pt, pb, fr, use3d, clear)):
        cmp(f"spartacus_{name}", a, b, 2e-5)


def check_fused_taumol():
    """Fused all-band taumol kernels: Pallas path vs the identical jnp
    body, on real meridian setcoef inputs (the fallback path is itself
    pinned against the per-band Sections in tests/test_taumol_fused.py)."""
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.optics.rrtmg.gas_optics import GAS_INDEX, load_tables
    from ecrad_tpu.optics.rrtmg.setcoef import prepare_gases, setcoef
    from ecrad_tpu.optics.rrtmg.taumol_lw_fused import taumol_lw_fused
    from ecrad_tpu.optics.rrtmg.taumol_sw_fused import taumol_sw_fused

    _, thermo, gas, _, _ = read_input(
        "/root/reference/test/ifs/ecrad_meridian.nc")
    t = load_tables()
    p_hl, t_hl, gmr = (thermo.pressure_hl, thermo.temperature_hl,
                       gas.mixing_ratio)
    p_fl = 0.5 * (p_hl[:, :-1] + p_hl[:, 1:])
    t_fl = 0.5 * (t_hl[:, :-1] + t_hl[:, 1:])

    def g(nm):
        return gmr[:, :, GAS_INDEX[nm]]

    gc = prepare_gases(p_hl, p_fl, t_fl, g("h2o"), g("co2"), g("ch4"),
                       g("n2o"), g("cfc11"), g("cfc12"), g("hcfc22"),
                       g("ccl4"), g("o3"))
    c = setcoef(gc, t["preflog"], t["tref"], t["chi_mls"])

    # tolerance: the Pallas kernels run the 3-pass bf16x2 class matmuls
    # (taumol_lw_fused._dot) while the jnp fallback runs native HIGHEST
    # — measured 3.7e-4 max / 5e-5 p99.9 relative on tau, with NO
    # end-to-end flux degradation vs the reference golden. Gate at 5e-4.
    for name, fn in (("taumol_lw_fused", taumol_lw_fused),
                     ("taumol_sw_fused", taumol_sw_fused)):
        run = jax.jit(lambda co, up, tf: fn(co, t, use_pallas=up,
                                            toa_first=tf),
                      static_argnums=(1, 2))
        ref = run(c, False, False)
        for toa in (False, True):
            got = run(c, True, toa)
            for i, (x, y) in enumerate(zip(jax.tree.leaves(got),
                                           jax.tree.leaves(ref))):
                x, y = np.asarray(x), np.asarray(y)
                if toa and x.ndim == 3:       # level-flipped layout
                    x = x[:, ::-1]
                mask = np.abs(y) > 1e-8
                rel = (np.abs(x - y)[mask] / np.abs(y)[mask]).max() \
                    if mask.any() else 0.0
                ok = np.abs(x - y).max() < 1e-6 or rel < 5e-4
                print(f"{name}[{i}] toa_first={toa}: maxabs "
                      f"{np.abs(x - y).max():.2e} rel {rel:.2e}  "
                      f"{'OK' if ok else 'FAIL'}")
                if not ok:
                    FAILURES.append(f"{name}[{i}] toa_first={toa}")


if __name__ == "__main__":
    main()
