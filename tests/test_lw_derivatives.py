"""LW derivative forms (radiation_lw_derivatives.F90) for all solvers.

Unit tests reduce the region/matrix forms to the ICA form under identity
overlap and diagonal transmittance; integration tests assert that every
solver emits `lw_derivatives` and that the deterministic Tripleclouds
form agrees with the reference golden (which used McICA) and with our
McICA run.
"""
import jax
import numpy as np
import pytest

from ecrad_tpu.solvers.lw_derivatives import (
    lw_derivatives_ica, lw_derivatives_matrix, lw_derivatives_region)

INPUT = "/root/reference/test/ifs/ecrad_meridian.nc"
NAMELIST = "/root/reference/test/ifs/configCY47R1.nam"
GOLDEN = ("/root/reference/test/ifs/"
          "ecrad_meridian_default_out_REFERENCE.nc")


def _identity_overlap(nlev, nreg, ncol):
    um = np.zeros((nlev + 1, nreg, nreg, ncol, 1), np.float32)
    for r in range(nreg):
        um[:, r, r] = 1.0
    return um


def test_region_form_reduces_to_ica():
    """With identity overlap and all flux in region 1, the region form
    must equal the ICA recurrence on region-1 transmittance."""
    rng = np.random.default_rng(0)
    ncol, nlev, ng, nreg = 4, 9, 5, 3
    trans = rng.uniform(0.2, 0.99, (nlev, nreg, ncol, ng)).astype(
        np.float32)
    fup = rng.uniform(0.5, 2.0, (ncol, ng)).astype(np.float32)
    um = _identity_overlap(nlev, nreg, ncol)
    d_reg = np.asarray(lw_derivatives_region(trans, um, fup))
    # ICA expects (ncol, nlev, ng) on region-1 transmittance
    t_ica = np.moveaxis(trans[:, 0], 0, 1)
    d_ica = np.asarray(lw_derivatives_ica(t_ica, fup))
    np.testing.assert_allclose(d_reg, d_ica, rtol=1e-6, atol=1e-7)


def test_matrix_form_reduces_to_region():
    """Diagonal transmittance matrices must reproduce the region form,
    including under a non-trivial overlap matrix."""
    rng = np.random.default_rng(1)
    ncol, nlev, ng, nreg = 3, 7, 4, 3
    trans_r = rng.uniform(0.2, 0.99, (nlev, nreg, ncol, ng)).astype(
        np.float32)
    tmat = np.zeros((nlev, nreg, nreg, ncol, ng), np.float32)
    for r in range(nreg):
        tmat[:, r, r] = trans_r[:, r]
    fup = rng.uniform(0.5, 2.0, (ncol, ng)).astype(np.float32)
    um = _identity_overlap(nlev, nreg, ncol)
    # mix a bit of region exchange in (rows sum arbitrary; the forms
    # must agree regardless)
    um[:, 0, 1] = 0.3
    um[:, 1, 1] = 0.7
    d_mat = np.asarray(lw_derivatives_matrix(tmat, um, fup))
    d_reg = np.asarray(lw_derivatives_region(trans_r, um, fup))
    np.testing.assert_allclose(d_mat, d_reg, rtol=1e-6, atol=1e-7)


def test_ica_surface_is_one_and_monotone():
    rng = np.random.default_rng(2)
    trans = rng.uniform(0.3, 0.999, (5, 12, 8)).astype(np.float32)
    fup = rng.uniform(0.5, 2.0, (5, 8)).astype(np.float32)
    d = np.asarray(lw_derivatives_ica(trans, fup))
    np.testing.assert_allclose(d[:, -1], 1.0)
    # transmittances < 1 -> derivative decreases monotonically upward
    assert (np.diff(d, axis=1) >= -1e-7).all()


@pytest.fixture(scope="module")
def meridian(test_ifs_dir):
    from ecrad_tpu.config import load_config_from_namelist
    from ecrad_tpu.io.input_reader import read_input
    cfg = load_config_from_namelist(
        NAMELIST, directory_name="/root/reference/data",
        do_save_spectral_flux=False,
        do_canopy_fluxes_sw=False, do_canopy_fluxes_lw=False)
    inputs = read_input(INPUT)
    return cfg, inputs


def _run(cfg, inputs, solver):
    from dataclasses import replace
    from ecrad_tpu.config import Solver
    from ecrad_tpu.interface import radiation, setup_radiation
    c = replace(cfg, i_solver_lw=Solver[solver], i_solver_sw=Solver[solver])
    setup = setup_radiation(c)
    flux = jax.jit(lambda *a: radiation(setup, *a))(*inputs)
    return np.asarray(flux.lw_derivatives)


def test_all_solvers_emit_derivatives(meridian):
    cfg, inputs = meridian
    ncol = inputs[1].pressure_hl.shape[0]
    for solver in ("CLOUDLESS", "HOMOGENEOUS", "MCICA", "TRIPLECLOUDS"):
        d = _run(cfg, inputs, solver)
        assert d.shape == (ncol, 138), solver
        np.testing.assert_allclose(d[:, -1], 1.0, err_msg=solver)
        assert np.isfinite(d).all() and (d >= 0).all() \
            and (d <= 1 + 1e-6).all(), solver


def test_tripleclouds_derivative_vs_golden(meridian):
    """Tripleclouds is deterministic; its region-form derivative must
    track the golden (McICA) derivative closely — measured mean 0.0048 /
    max 0.041 — with both mean AND max bounds."""
    from ecrad_tpu.io.netcdf import NetcdfFile
    cfg, inputs = meridian
    d = _run(cfg, inputs, "TRIPLECLOUDS")
    golden = NetcdfFile(GOLDEN).read("lw_derivative")
    err = np.abs(d - golden)
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.08, err.max()


def test_mcica_tripleclouds_consistency(meridian):
    """The ICA and region forms are different discretizations of the same
    quantity; across the meridian they must agree in the mean."""
    cfg, inputs = meridian
    d_mc = _run(cfg, inputs, "MCICA")
    d_tc = _run(cfg, inputs, "TRIPLECLOUDS")
    err = np.abs(d_mc - d_tc)
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.10, err.max()
