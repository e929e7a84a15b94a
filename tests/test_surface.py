"""Surface/canopy subsystem tests.

Mirrors the reference's test/surface cases (mls_flat / mls_forest /
mls_london1, test/surface/Makefile:14-31) as pytest: the flat-tile case
must reduce exactly to the simple-surface path, canopy boundary
conditions must obey limiting cases, and the partitioned facet fluxes
must be finite and energy-consistent.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecrad_tpu.config import RadiationConfig, Solver
from ecrad_tpu.interface import radiation, setup_radiation
from ecrad_tpu.surface import (SurfaceDescription, calc_boundary_conditions,
                               partition_fluxes, read_surface)
from ecrad_tpu.surface.properties import (ITileFlat, ITileUrban3D,
                                          ITileVegetation,
                                          facet_region_indices,
                                          input_has_tiled_surface)

SURF_DIR = "/root/reference/test/surface"


@pytest.fixture(scope="module")
def setup_full_lw(reference_data_dir):
    cfg = RadiationConfig(
        i_solver_sw=Solver.MCICA, i_solver_lw=Solver.MCICA,
        use_aerosols=False, directory_name=reference_data_dir,
        do_canopy_fluxes_sw=True, do_canopy_fluxes_lw=True,
        use_canopy_full_spectrum_lw=True)
    return setup_radiation(cfg)


def _surface(reps, ncol=4, nalb=1, nem=1, seed=0):
    rng = np.random.RandomState(seed)
    nfacet = sum({1: 1, 2: 1, 3: 3}[r] for r in reps)
    ntile = len(reps)
    frac = rng.dirichlet(np.ones(ntile), size=ncol)
    return SurfaceDescription(
        skin_temperature=jnp.asarray(
            288.0 + rng.uniform(-5, 5, (ncol, nfacet)), jnp.float32),
        sw_albedo=jnp.asarray(
            rng.uniform(0.05, 0.4, (ncol, nfacet, nalb)), jnp.float32),
        lw_emissivity=jnp.asarray(
            rng.uniform(0.9, 1.0, (ncol, nfacet, nem)), jnp.float32),
        tile_fraction=jnp.asarray(frac, jnp.float32),
        canopy_depth=jnp.full((ncol, ntile), 12.0, jnp.float32),
        canopy_temperature=jnp.full((ncol, ntile), 290.0, jnp.float32),
        building_fraction=jnp.full((ncol, ntile), 0.4, jnp.float32),
        building_normalized_perimeter=jnp.full((ncol, ntile), 0.1,
                                               jnp.float32),
        vegetation_optical_depth=jnp.full((ncol, ntile), 3.0, jnp.float32),
        vegetation_sw_albedo=jnp.full((ncol, ntile, nalb), 0.15,
                                      jnp.float32),
        vegetation_lw_emissivity=jnp.full((ncol, ntile, nem), 0.98,
                                          jnp.float32),
        representation=tuple(reps))


def test_facet_region_indices():
    # radsurf_properties.F90:249-269 assignment order
    ground, roof, wall, region = facet_region_indices(
        (ITileFlat, ITileVegetation, ITileUrban3D))
    assert ground == {0: 0, 1: 1, 2: 2}
    assert roof[2] == 3 and wall[2] == 4
    assert region == {0: None, 1: 0, 2: 1}


def test_read_surface_files():
    if not os.path.isdir(SURF_DIR):
        pytest.skip("reference surface tests not available")
    surf = read_surface(os.path.join(SURF_DIR, "mls_london1.nc"))
    assert surf.representation == (1, 2, 3)
    assert surf.nfacet == 5 and surf.nregion == 2
    assert input_has_tiled_surface(os.path.join(SURF_DIR, "mls_flat.nc"))


def test_flat_tile_reduces_to_simple(setup_full_lw):
    """A 100% flat tile must give exactly the facet albedo/emission."""
    surf = _surface([ITileFlat, ITileVegetation], ncol=3)
    surf = surf.replace(tile_fraction=jnp.asarray(
        [[1.0, 0.0]] * 3, jnp.float32))
    bc = calc_boundary_conditions(setup_full_lw, surf,
                                  jnp.full(3, 0.5, jnp.float32))
    np.testing.assert_allclose(np.asarray(bc.sw_albedo_diffuse),
                               np.asarray(surf.sw_albedo[:, 0, :]),
                               rtol=1e-6)
    # emission consistent with emissivity * planck: ratio emiss/emission
    # must equal the flat facet's
    em = np.asarray(bc.lw_emission).sum(-1)
    sb = 5.670374419e-8
    t0 = np.asarray(surf.skin_temperature[:, 0])
    expected = np.asarray(surf.lw_emissivity[:, 0, 0]) * sb * t0 ** 4
    np.testing.assert_allclose(em, expected, rtol=0.01)


def test_vegetation_limits(setup_full_lw):
    """od->0: canopy transparent (ground albedo); od large: veg albedo
    dominates the direct reflectance."""
    surf = _surface([ITileVegetation], ncol=2)
    mu0 = jnp.full(2, 0.6, jnp.float32)
    thin = surf.replace(vegetation_optical_depth=jnp.full((2, 1), 1e-6,
                                                          jnp.float32))
    bc = calc_boundary_conditions(setup_full_lw, thin, mu0)
    np.testing.assert_allclose(np.asarray(bc.sw_albedo_diffuse),
                               np.asarray(surf.sw_albedo[:, 0, :]),
                               atol=1e-4)
    thick = surf.replace(vegetation_optical_depth=jnp.full((2, 1), 50.0,
                                                           jnp.float32))
    bc2 = calc_boundary_conditions(setup_full_lw, thick, mu0)
    # thick canopy: ground invisible; albedo set by canopy scattering only
    alb = np.asarray(bc2.sw_albedo_diffuse)
    assert np.all(alb < np.asarray(surf.sw_albedo[:, 0, :]) + 0.05)
    assert np.all(alb >= 0.0) and np.all(alb <= 1.0)


def test_urban_bc_bounds(setup_full_lw):
    surf = _surface([ITileUrban3D], ncol=3, seed=1)
    bc = calc_boundary_conditions(setup_full_lw, surf,
                                  jnp.asarray([0.1, 0.5, 0.9], jnp.float32))
    for arr in (bc.sw_albedo_diffuse, bc.sw_albedo_direct,
                bc.lw_emissivity):
        a = np.asarray(arr)
        assert np.isfinite(a).all()
        assert (a >= 0.0).all() and (a <= 1.0).all()
    # street canyon traps radiation: effective albedo below the weighted
    # mean of facet albedos
    facet_mean = np.asarray(surf.sw_albedo).mean()
    assert np.asarray(bc.sw_albedo_diffuse).mean() < facet_mean + 1e-6


@pytest.mark.skipif(not os.path.isdir(SURF_DIR),
                    reason="reference surface tests not available")
def test_end_to_end_surface_cases(setup_full_lw, tmp_path):
    """Run the full pipeline on the reference's surface test inputs."""
    from ecrad_tpu.io.input_reader import read_input
    for case in ("mls_flat", "mls_forest", "mls_london1"):
        path = os.path.join(SURF_DIR, case + ".nc")
        single_level, thermo, gas, cloud, aerosol = read_input(path)
        surf = read_surface(path)
        bc = calc_boundary_conditions(setup_full_lw, surf,
                                      single_level.cos_sza)
        single_level = single_level.replace(
            sw_albedo=bc.sw_albedo_diffuse,
            sw_albedo_direct=bc.sw_albedo_direct,
            lw_emissivity=bc.lw_emissivity,
            lw_emission=bc.lw_emission)
        flux = jax.jit(lambda *a: radiation(setup_full_lw, *a))(
            single_level, thermo, gas, cloud, aerosol)
        sflux = partition_fluxes(surf, bc.intermediate, flux)
        for name in ("lw_dn_facet", "lw_up_facet", "sw_dn_facet",
                     "sw_up_facet", "sw_dn_direct_facet",
                     "lw_abs_canopy", "sw_abs_canopy"):
            arr = np.asarray(getattr(sflux, name))
            assert np.isfinite(arr).all(), f"{case}:{name} not finite"
        # facet up <= dn + emission headroom; SW up <= SW dn
        sw_dn = np.asarray(sflux.sw_dn_facet)
        sw_up = np.asarray(sflux.sw_up_facet)
        assert (sw_up <= sw_dn + 1e-3).all(), case
        # flat ground facet of mls cases must match the atmospheric
        # surface fluxes exactly (tile 0 is flat)
        np.testing.assert_allclose(np.asarray(sflux.sw_dn_facet)[:, 0],
                                   np.asarray(flux.sw_dn)[:, -1],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sflux.lw_dn_facet)[:, 0],
                                   np.asarray(flux.lw_dn)[:, -1],
                                   rtol=1e-5)


def test_driver_cli_surface(tmp_path):
    if not os.path.isdir(SURF_DIR):
        pytest.skip("reference surface tests not available")
    from ecrad_tpu.driver import main
    out = tmp_path / "out.nc"
    surf_out = tmp_path / "surf.nc"
    nam = tmp_path / "config.nam"
    nam.write_text("""
&radiation_driver
iverbose = 1
/
&radiation
do_sw = true
do_lw = true
directory_name = "/root/reference/data"
sw_solver_name = "McICA"
lw_solver_name = "McICA"
use_aerosols = false
use_canopy_full_spectrum_lw = true
gas_model_name = "RRTMG-IFS"
/
""")
    rc = main([str(nam), os.path.join(SURF_DIR, "mls_forest.nc"),
               str(out), str(surf_out)])
    assert rc == 0
    assert out.exists() and surf_out.exists()
    from ecrad_tpu.io.netcdf import NetcdfFile
    with NetcdfFile(str(surf_out)) as f:
        assert f.exists("flux_dn_lw_facet")
        assert f.exists("absorption_sw_canopy")
        v = f.read("flux_dn_sw_facet")
        assert np.isfinite(v).all()
