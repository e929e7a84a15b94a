"""Reversed (height-increasing) input handling inside radiation().

Reference parity: radiation_interface.F90:283-290 detects
pressure-decreasing profiles and runs radiation_reverse (:475-617),
which flips every level-bearing input, runs the normal TOA-first
pipeline and flips the flux profiles back. A host model calling
radiation() programmatically with flipped profiles must get the same
(flipped) results — not garbage.

Two paths are exercised:
  - eager (concrete inputs): the orientation check is a Python bool and
    the flip is a plain jnp.flip — results are BIT-identical to the
    canonical orientation.
  - jitted (traced inputs): the check is a traced select. XLA's CPU
    backend unswitches the uniform predicate into two loop versions
    whose codegen (FMA contraction) can differ in the last bits, so the
    comparison is a tight allclose (<= 1e-3 W/m2 on ~1000 W/m2 fluxes),
    not bit equality. Direct-beam and per-g LW surface fields come out
    bit-exact regardless.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

INPUT = "/root/reference/test/ifs/ecrad_meridian.nc"
NAMELIST = "/root/reference/test/ifs/configCY47R1.nam"

PROFILE_FIELDS = [
    "lw_up", "lw_dn", "sw_up", "sw_dn", "sw_dn_direct",
    "lw_up_clear", "lw_dn_clear", "sw_up_clear", "sw_dn_clear",
    "lw_derivatives",
]
SURFACE_FIELDS = [
    "lw_dn_surf_g", "sw_dn_diffuse_surf_g", "sw_dn_direct_surf_g",
    "cloud_cover_lw", "cloud_cover_sw",
]


def _flip_inputs(thermo, gas, cloud, aer):
    def fl(x, axis=1):
        return None if x is None else jnp.flip(x, axis)

    thermo_r = thermo.replace(
        pressure_hl=fl(thermo.pressure_hl),
        temperature_hl=fl(thermo.temperature_hl),
        h2o_sat_liq=fl(thermo.h2o_sat_liq))
    gas_r = gas.replace(mixing_ratio=fl(gas.mixing_ratio))
    cloud_r = cloud.replace(
        q_liq=fl(cloud.q_liq), q_ice=fl(cloud.q_ice),
        re_liq=fl(cloud.re_liq), re_ice=fl(cloud.re_ice),
        fraction=fl(cloud.fraction),
        fractional_std=fl(cloud.fractional_std),
        overlap_param=fl(cloud.overlap_param),
        inv_cloud_effective_size=fl(cloud.inv_cloud_effective_size),
        inv_inhom_effective_size=fl(cloud.inv_inhom_effective_size))
    aer_r = aer.replace(mixing_ratio=fl(aer.mixing_ratio))
    return thermo_r, gas_r, cloud_r, aer_r


@pytest.fixture(scope="module")
def runs(test_ifs_dir):
    from ecrad_tpu.config import load_config_from_namelist
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input_reader import read_input

    cfg = load_config_from_namelist(
        NAMELIST, directory_name="/root/reference/data",
        do_save_spectral_flux=False,
        do_canopy_fluxes_sw=False, do_canopy_fluxes_lw=False)
    sl, thermo, gas, cloud, aer = read_input(INPUT)
    setup = setup_radiation(cfg)
    jf = jax.jit(lambda *a: radiation(setup, *a))
    f_norm_jit = jf(sl, thermo, gas, cloud, aer)
    thermo_r, gas_r, cloud_r, aer_r = _flip_inputs(thermo, gas, cloud, aer)
    f_rev_jit = jf(sl, thermo_r, gas_r, cloud_r, aer_r)
    # eager: concrete pressure_hl -> static flip path. The flip itself
    # is bit-exact, so eager-normal vs eager-reversed must match
    # bitwise (jit-vs-eager of the same pipeline would not: fusion).
    f_norm_eager = radiation(setup, sl, thermo, gas, cloud, aer)
    f_rev_eager = radiation(setup, sl, thermo_r, gas_r, cloud_r, aer_r)
    return f_norm_jit, f_rev_jit, f_norm_eager, f_rev_eager


@pytest.mark.parametrize("field", PROFILE_FIELDS)
def test_profiles_flip_back_eager_bitexact(runs, field):
    _, _, f_norm, f_rev = runs
    a = np.asarray(getattr(f_norm, field))
    b = np.flip(np.asarray(getattr(f_rev, field)), 1)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("field", SURFACE_FIELDS)
def test_surface_fields_eager_bitexact(runs, field):
    _, _, f_norm, f_rev = runs
    np.testing.assert_array_equal(np.asarray(getattr(f_norm, field)),
                                  np.asarray(getattr(f_rev, field)))


@pytest.mark.parametrize("field", PROFILE_FIELDS)
def test_profiles_flip_back_jit(runs, field):
    f_norm, f_rev, _, _ = runs
    a = np.asarray(getattr(f_norm, field))
    b = np.flip(np.asarray(getattr(f_rev, field)), 1)
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-6)


@pytest.mark.parametrize("field", SURFACE_FIELDS)
def test_surface_fields_jit(runs, field):
    f_norm, f_rev, _, _ = runs
    np.testing.assert_allclose(np.asarray(getattr(f_norm, field)),
                               np.asarray(getattr(f_rev, field)),
                               atol=1e-3, rtol=1e-6)
