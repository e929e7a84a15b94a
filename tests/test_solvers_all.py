"""Cross-solver consistency on the reference meridian case + SPARTACUS
entrapment variants + monochromatic solver sanity (the reference's
driver/test_solver.F90 analogue)."""
import jax
import numpy as np
import pytest

from ecrad_tpu.config import (Entrapment, GasModel, RadiationConfig,
                              Solver, load_config_from_namelist)
from ecrad_tpu.interface import radiation, setup_radiation
from ecrad_tpu.io.input_reader import read_input

INPUT = "/root/reference/test/ifs/ecrad_meridian.nc"
NAMELIST = "/root/reference/test/ifs/configCY47R1.nam"


@pytest.fixture(scope="module")
def inputs(test_ifs_dir):
    return read_input(INPUT)


def run_solver(inputs, solver, **kw):
    cfg = load_config_from_namelist(
        NAMELIST, directory_name="/root/reference/data",
        do_save_spectral_flux=False, do_canopy_fluxes_sw=False,
        do_canopy_fluxes_lw=False, i_solver_sw=solver,
        i_solver_lw=solver, **kw)
    setup = setup_radiation(cfg)
    return jax.jit(lambda *a: radiation(setup, *a))(*inputs)


@pytest.fixture(scope="module")
def mcica_flux(inputs):
    return run_solver(inputs, Solver.MCICA)


@pytest.mark.parametrize("solver,kw,sw_tol", [
    (Solver.TRIPLECLOUDS, {}, 16.0),
    # Homogeneous treats partial cloud as overcast -> larger SW diffs
    (Solver.HOMOGENEOUS, {}, 60.0),
    (Solver.SPARTACUS, {"do_3d_effects": True}, 16.0),
    (Solver.SPARTACUS, {"do_3d_effects": False}, 16.0),
])
def test_solver_consistency(inputs, mcica_flux, solver, kw, sw_tol):
    """All solvers agree with McICA at the solver-difference level."""
    flux = run_solver(inputs, solver, **kw)
    for name, tol_mean in [("lw_up", 8.0), ("lw_dn", 8.0),
                           ("sw_up", sw_tol), ("sw_dn", sw_tol)]:
        a = np.asarray(getattr(flux, name))
        b = np.asarray(getattr(mcica_flux, name))
        assert np.isfinite(a).all(), f"{solver} {name} not finite"
        err = np.abs(a - b).mean()
        assert err < tol_mean, f"{solver} {kw} {name}: mean err {err}"
    # clear-sky should agree tightly across solvers
    for name in ("lw_up_clear", "sw_dn_clear"):
        a = np.asarray(getattr(flux, name))
        b = np.asarray(getattr(mcica_flux, name))
        assert np.abs(a - b).max() < 2.5, f"{solver} {name}"


@pytest.mark.parametrize("entrapment", [
    Entrapment.ZERO, Entrapment.EDGE_ONLY, Entrapment.EXPLICIT,
    Entrapment.EXPLICIT_NON_FRACTAL, Entrapment.MAXIMUM])
def test_spartacus_entrapment_variants(inputs, entrapment):
    flux = run_solver(inputs, Solver.SPARTACUS, do_3d_effects=True,
                      i_3d_sw_entrapment=entrapment)
    for name in ("lw_up", "sw_up", "sw_dn"):
        a = np.asarray(getattr(flux, name))
        assert np.isfinite(a).all(), f"{entrapment} {name}"
        assert (a >= -1.0).all()
    # TOA energy balance: up < dn for SW
    day = np.asarray(inputs[0].cos_sza) > 0
    assert (np.asarray(flux.sw_up[:, 0])[day]
            <= np.asarray(flux.sw_dn[:, 0])[day] + 1e-2).all()


def test_monochromatic_homogeneous():
    """Monochromatic gas model + homogeneous solver vs analytic expectation
    (analogue of driver/test_solver.F90:10-105)."""
    import jax.numpy as jnp
    from ecrad_tpu.types import (Cloud, GasConcs, SingleLevel,
                                 Thermodynamics)
    ncol, nlev = 8, 1
    cfg = RadiationConfig(
        i_gas_model=GasModel.MONOCHROMATIC,
        i_solver_sw=Solver.HOMOGENEOUS, i_solver_lw=Solver.HOMOGENEOUS,
        mono_sw_total_od=0.0, mono_lw_total_od=0.0,
        do_lw_cloud_scattering=False)
    setup = setup_radiation(cfg)
    mu0 = np.linspace(0.1, 1.0, ncol)
    sl = SingleLevel(
        cos_sza=jnp.asarray(mu0, jnp.float32),
        skin_temperature=jnp.full(ncol, 288.0),
        sw_albedo=jnp.full((ncol, 1), 0.2),
        lw_emissivity=jnp.full((ncol, 1), 1.0),
        solar_irradiance=1361.0,
        iseed=jnp.arange(ncol, dtype=jnp.int32))
    thermo = Thermodynamics(
        pressure_hl=jnp.tile(jnp.asarray([1.0, 1e5]), (ncol, 1)),
        temperature_hl=jnp.full((ncol, 2), 288.0))
    gas = GasConcs.create(ncol, nlev)
    cloud = Cloud.create_zero(ncol, nlev)
    flux = jax.jit(lambda *a: radiation(setup, *a))(sl, thermo, gas,
                                                    cloud)
    # no atmosphere, no cloud: sw_dn at surface = S0*mu0; up = albedo*dn
    np.testing.assert_allclose(np.asarray(flux.sw_dn[:, -1]),
                               1361.0 * mu0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(flux.sw_up[:, -1]),
                               0.2 * 1361.0 * mu0, rtol=1e-4)
    # LW: black surface at 288K -> up = sigma T^4 everywhere (transparent)
    sigma_t4 = 5.670374419e-8 * 288.0 ** 4
    np.testing.assert_allclose(np.asarray(flux.lw_up), sigma_t4,
                               rtol=1e-4)


def test_monochromatic_cloud():
    """One overcast scattering cloud layer: SW reflection increases."""
    import jax.numpy as jnp
    from ecrad_tpu.types import (Cloud, GasConcs, SingleLevel,
                                 Thermodynamics)
    ncol, nlev = 2, 3
    cfg = RadiationConfig(
        i_gas_model=GasModel.MONOCHROMATIC,
        i_solver_sw=Solver.HOMOGENEOUS, i_solver_lw=Solver.HOMOGENEOUS,
        do_lw_cloud_scattering=False)
    setup = setup_radiation(cfg)
    sl = SingleLevel(
        cos_sza=jnp.full(ncol, 0.7),
        skin_temperature=jnp.full(ncol, 288.0),
        sw_albedo=jnp.full((ncol, 1), 0.05),
        lw_emissivity=jnp.full((ncol, 1), 1.0),
        solar_irradiance=1361.0,
        iseed=jnp.arange(ncol, dtype=jnp.int32))
    p = jnp.tile(jnp.asarray([1.0, 3e4, 7e4, 1e5]), (ncol, 1))
    thermo = Thermodynamics(pressure_hl=p,
                            temperature_hl=jnp.full((ncol, 4), 275.0))
    gas = GasConcs.create(ncol, nlev)
    cloud = Cloud.create_zero(ncol, nlev)
    # cloud in layer 1 for column 1 only
    cloud = cloud.replace(
        fraction=cloud.fraction.at[1, 1].set(1.0),
        q_liq=cloud.q_liq.at[1, 1].set(2e-4),
        fractional_std=jnp.zeros((ncol, nlev)),
        overlap_param=jnp.full((ncol, nlev - 1), 0.9))
    flux = jax.jit(lambda *a: radiation(setup, *a))(sl, thermo, gas,
                                                    cloud)
    up = np.asarray(flux.sw_up[:, 0])
    assert up[1] > up[0] + 10.0  # cloudy column reflects much more
