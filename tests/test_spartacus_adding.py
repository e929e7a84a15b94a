"""Fused SPARTACUS adding-sweep kernels vs the production lax.scan.

The Pallas kernels (ops/spartacus_adding.py) run the same per-level
math as the scan bodies in solvers/spartacus_{sw,lw}.py but with the
unrolled mm_gu forms (Mosaic has no non-minor-axis reductions), so the
outputs agree to sum-reassociation tolerance. Exercised here in
interpret mode on CPU over the full radiation() path; the compiled
kernels are validated end-to-end on hardware by bench.py's
spartacus_tpu_vs_golden line.
"""
import os

import numpy as np
import jax
import pytest

IFS_IN = "/root/reference/test/ifs/ecrad_meridian.nc"

pytestmark = pytest.mark.skipif(not os.path.exists(IFS_IN),
                                reason="reference inputs unavailable")


def test_adding_kernel_matches_scan():
    from ecrad_tpu.config import Solver, load_config_from_namelist
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input

    inputs = read_input(IFS_IN)
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
        do_canopy_fluxes_lw=False, i_solver_sw=Solver.SPARTACUS,
        i_solver_lw=Solver.SPARTACUS, do_3d_effects=True,
        do_lw_derivatives=True)
    setup = setup_radiation(cfg)

    prev = os.environ.get("ECRAD_SPARTACUS_ADDING")
    try:
        os.environ["ECRAD_SPARTACUS_ADDING"] = "scan"
        f_scan = radiation(setup, *inputs)
        os.environ["ECRAD_SPARTACUS_ADDING"] = "interpret"
        f_kern = radiation(setup, *inputs)
    finally:
        if prev is None:
            os.environ.pop("ECRAD_SPARTACUS_ADDING", None)
        else:
            os.environ["ECRAD_SPARTACUS_ADDING"] = prev

    for key in ("lw_up", "lw_dn", "sw_up", "sw_dn", "sw_dn_direct",
                "lw_derivatives"):
        a = np.asarray(getattr(f_scan, key))
        b = np.asarray(getattr(f_kern, key))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert rel < 2e-5, f"{key}: rel {rel:.2e}"
