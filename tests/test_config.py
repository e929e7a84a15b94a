import os

from ecrad_tpu.config import (
    Entrapment,
    GasModel,
    IceModel,
    LiquidModel,
    Overlap,
    RadiationConfig,
    Solver,
    load_config_from_namelist,
    load_driver_config_from_namelist,
    parse_namelist,
)

CY47R1 = "/root/reference/test/ifs/configCY47R1.nam"


def test_defaults_match_reference():
    cfg = RadiationConfig()
    assert cfg.i_solver_sw == Solver.MCICA
    assert cfg.i_overlap_scheme == Overlap.EXPONENTIAL_RANDOM
    assert cfg.i_liq_model == LiquidModel.SOCRATES
    assert cfg.i_ice_model == IceModel.BARAN
    assert cfg.nregions == 3
    assert cfg.cloud_inhom_decorr_scaling == 0.5
    assert cfg.max_gas_od_3d == 8.0


def test_parse_reference_namelist():
    if not os.path.exists(CY47R1):
        import pytest
        pytest.skip("reference namelist unavailable")
    cfg = load_config_from_namelist(CY47R1)
    assert cfg.i_gas_model == GasModel.RRTMG_IFS
    assert cfg.i_solver_sw == Solver.MCICA
    assert cfg.i_solver_lw == Solver.MCICA
    assert cfg.i_overlap_scheme == Overlap.EXPONENTIAL_EXPONENTIAL
    assert cfg.i_ice_model == IceModel.FU
    assert cfg.i_3d_sw_entrapment == Entrapment.EXPLICIT
    assert cfg.use_aerosols is True
    assert cfg.do_lw_derivatives is True
    assert cfg.n_aerosol_types == 12
    assert cfg.i_aerosol_type_map[:6] == (-1, -2, -3, 1, 2, 3)
    assert cfg.cloud_fraction_threshold == 0.001e-3
    assert cfg.do_nearest_spectral_sw_albedo is False
    assert cfg.sw_albedo_wavelength_bound[:5] == (
        0.25e-6, 0.44e-6, 0.69e-6, 1.19e-6, 2.38e-6)
    assert cfg.i_sw_albedo_index[:6] == (1, 2, 3, 4, 5, 6)
    assert cfg.i_lw_emiss_index[:3] == (1, 2, 1)
    # consolidated paths
    assert cfg.aerosol_optics_file.endswith(
        "aerosol_ifs_rrtm_46R1_with_NI_AM.nc")
    assert cfg.ice_optics_file.endswith("fu_ice_scattering_rrtm.nc")

    drv = load_driver_config_from_namelist(CY47R1)
    assert drv.nblocksize == 8
    assert drv.cloud_separation_scale_toa == 14000.0


def test_parse_namelist_text():
    groups = parse_namelist("""
&radiation
do_sw = false,
n_regions = 2
sw_solver_name = "Tripleclouds",
/
""")
    assert groups["radiation"]["do_sw"] is False
    assert groups["radiation"]["n_regions"] == 2
    cfg = load_config_from_namelist("""
&radiation
do_sw = false,
n_regions = 2
sw_solver_name = "Tripleclouds",
/
""")
    assert cfg.do_sw is False
    assert cfg.nregions == 2
    assert cfg.i_solver_sw == Solver.TRIPLECLOUDS


def test_do_clouds_derived():
    """do_clouds mirrors radiation_config.F90:898-900: true iff an
    active spectral region runs a non-Cloudless solver."""
    from ecrad_tpu.config import RadiationConfig
    assert RadiationConfig().do_clouds
    assert not RadiationConfig(i_solver_sw=Solver.CLOUDLESS,
                               i_solver_lw=Solver.CLOUDLESS).do_clouds
    # LW disabled, SW cloudless -> no clouds even with a cloudy LW solver
    assert not RadiationConfig(i_solver_sw=Solver.CLOUDLESS,
                               do_lw=False).do_clouds
    assert RadiationConfig(i_solver_sw=Solver.CLOUDLESS).do_clouds
