"""Fused ICA adding kernels (ops/adding_fused.py) vs the lax.scan path.

Pure elementwise recurrences, so interpret mode on CPU must match the
scan to float-associativity tolerance.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture()
def rnd():
    return np.random.RandomState(3)


def _rand(rng, *shape, lo=0.0, hi=1.0):
    return jnp.asarray(
        (lo + (hi - lo) * rng.rand(*shape)).astype(np.float32))


def _with_mode(mode, fn):
    prev = os.environ.get("ECRAD_ADDING")
    os.environ["ECRAD_ADDING"] = mode
    try:
        return fn()
    finally:
        if prev is None:
            os.environ.pop("ECRAD_ADDING", None)
        else:
            os.environ["ECRAD_ADDING"] = prev


def _cmp(a, b, tol=2e-6):
    for x, y in zip(a, b):
        x, y = np.asarray(x), np.asarray(y)
        rel = np.abs(x - y).max() / max(np.abs(y).max(), 1e-30)
        assert rel < tol, rel


def test_adding_sw_fused(rnd):
    from ecrad_tpu.solvers.adding import adding_sw
    nlev, ng, ncol = 17, 12, 67         # ncol not a lane-tile multiple
    r = _rand(rnd, nlev, ng, ncol, hi=0.4)
    t = _rand(rnd, nlev, ng, ncol, lo=0.3, hi=0.6)
    rd = _rand(rnd, nlev, ng, ncol, hi=0.3)
    tdd = _rand(rnd, nlev, ng, ncol, hi=0.4)
    tdir = _rand(rnd, nlev, ng, ncol, lo=0.2, hi=0.9)
    inc = _rand(rnd, ng, ncol, hi=1300.0)
    ad = _rand(rnd, ng, ncol, hi=0.8)
    adir = _rand(rnd, ng, ncol, hi=0.8)
    mu0 = _rand(rnd, ncol, lo=0.05)
    args = (r, t, rd, tdd, tdir, inc, ad, adir, mu0)
    ref = _with_mode("scan", lambda: adding_sw(*args, gfirst=True))
    got = _with_mode("interpret", lambda: adding_sw(*args, gfirst=True))
    _cmp(got, ref)


def test_adding_lw_fused(rnd):
    from ecrad_tpu.solvers.adding import adding_lw
    nlev, ng, ncol = 17, 12, 67
    r = _rand(rnd, nlev, ng, ncol, hi=0.3)
    t = _rand(rnd, nlev, ng, ncol, lo=0.3, hi=0.6)
    su = _rand(rnd, nlev, ng, ncol, hi=20.0)
    sd = _rand(rnd, nlev, ng, ncol, hi=20.0)
    emis = _rand(rnd, ng, ncol, hi=400.0)
    alb = _rand(rnd, ng, ncol, hi=0.2)
    args = (r, t, su, sd, emis, alb)
    ref = _with_mode("scan", lambda: adding_lw(*args, gfirst=True))
    got = _with_mode("interpret", lambda: adding_lw(*args, gfirst=True))
    _cmp(got, ref)


def test_lw_no_scattering_fused(rnd):
    from ecrad_tpu.solvers.adding import lw_no_scattering_fluxes
    nlev, ng, ncol = 17, 12, 67
    t = _rand(rnd, nlev, ng, ncol, lo=0.3, hi=0.9)
    su = _rand(rnd, nlev, ng, ncol, hi=20.0)
    sd = _rand(rnd, nlev, ng, ncol, hi=20.0)
    emis = _rand(rnd, ng, ncol, hi=400.0)
    alb = _rand(rnd, ng, ncol, hi=0.2)
    args = (t, su, sd, emis, alb)
    ref = _with_mode(
        "scan", lambda: lw_no_scattering_fluxes(*args, gfirst=True))
    got = _with_mode(
        "interpret", lambda: lw_no_scattering_fluxes(*args, gfirst=True))
    _cmp(got, ref)


def test_tripleclouds_fused_matches_scan():
    """Tripleclouds fused region sweeps (tc_sw_sweeps / tc_lw_sweeps)
    vs the production lax.scan over the full radiation() path."""
    import jax
    from ecrad_tpu.config import Solver, load_config_from_namelist
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input

    path = "/root/reference/test/ifs/ecrad_meridian.nc"
    if not os.path.exists(path):
        pytest.skip("reference inputs unavailable")
    inputs = read_input(path)
    ncol0 = inputs[0].cos_sza.shape[0]

    def sub(tree, n=16):
        return jax.tree.map(
            lambda x: x[:n] if hasattr(x, "ndim") and x.ndim >= 1
            and x.shape[0] == ncol0 else x, tree)

    inputs = tuple(sub(t) for t in inputs)
    cfg = load_config_from_namelist(
        "/root/reference/test/ifs/configCY47R1.nam",
        directory_name="/root/reference/data",
        do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
        do_canopy_fluxes_lw=False, i_solver_sw=Solver.TRIPLECLOUDS,
        i_solver_lw=Solver.TRIPLECLOUDS, do_lw_derivatives=True)
    setup = setup_radiation(cfg)
    ref = _with_mode("scan", lambda: radiation(setup, *inputs))
    got = _with_mode("interpret", lambda: radiation(setup, *inputs))
    for key in ("lw_up", "lw_dn", "sw_up", "sw_dn", "sw_dn_direct"):
        a = np.asarray(getattr(ref, key))
        b = np.asarray(getattr(got, key))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert rel < 2e-5, f"{key}: rel {rel:.2e}"
