"""Driver-level features: reversed input, diagnostic dumps, config print.

Reference parity: radiation_reverse (radiation_interface.F90:283-290,
:475-617), do_save_inputs / do_save_radiative_properties
(radiation_save.F90:411,719; driver/ecrad_driver.F90:217-223),
print_config (radiation_config.F90:1127).
"""
import os

import numpy as np
import pytest

IFS_IN = "/root/reference/test/ifs/ecrad_meridian.nc"

needs_ref = pytest.mark.skipif(not os.path.exists(IFS_IN),
                               reason="reference test files unavailable")


def _reversed_copy(src, dst):
    from ecrad_tpu.io.netcdf import NetcdfFile, write_netcdf
    with NetcdfFile(src) as f:
        names = f.variables()
        sp = f._sp
        dims, variables = {}, {}
        for n in names:
            v = sp.variables[n]
            arr = f.read(n)
            for ax, dn in enumerate(v.dimensions):
                if "level" in dn:
                    arr = np.flip(arr, axis=ax)
            variables[n] = (v.dimensions, np.asarray(arr))
            for dn, s in zip(v.dimensions, np.shape(arr)):
                dims.setdefault(dn, s)
    write_netcdf(dst, dims, variables)


@needs_ref
def test_reversed_input_roundtrip(tmp_path):
    """Height-increasing input must give exactly the flipped fluxes of
    the height-decreasing run."""
    from ecrad_tpu.driver import main
    from ecrad_tpu.io.netcdf import NetcdfFile
    rev_in = tmp_path / "rev.nc"
    _reversed_copy(IFS_IN, str(rev_in))
    nam = tmp_path / "c.nam"
    nam.write_text("""
&radiation_driver
iverbose = 1
iendcol = 8
/
&radiation
directory_name = "/root/reference/data"
sw_solver_name = "Tripleclouds"
lw_solver_name = "Tripleclouds"
use_aerosols = false
gas_model_name = "RRTMG-IFS"
/
""")
    out_f = tmp_path / "fwd.nc"
    out_r = tmp_path / "rev_out.nc"
    assert main([str(nam), IFS_IN, str(out_f)]) == 0
    assert main([str(nam), str(rev_in), str(out_r)]) == 0
    with NetcdfFile(str(out_f)) as f:
        fwd = f.read("flux_dn_sw")
    with NetcdfFile(str(out_r)) as f:
        rev = f.read("flux_dn_sw")
    np.testing.assert_array_equal(fwd, np.flip(rev, 1))


@needs_ref
def test_save_inputs_roundtrip(tmp_path, monkeypatch):
    """inputs.nc written by do_save_inputs must be re-readable and
    reproduce the same driver inputs."""
    monkeypatch.chdir(tmp_path)
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.io.output import save_inputs
    parts = read_input(IFS_IN)
    save_inputs("inputs.nc", *parts)
    parts2 = read_input("inputs.nc")
    np.testing.assert_allclose(np.asarray(parts[1].pressure_hl),
                               np.asarray(parts2[1].pressure_hl),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(parts[3].fraction),
                               np.asarray(parts2[3].fraction), atol=1e-7)
    np.testing.assert_allclose(np.asarray(parts[2].get("h2o")),
                               np.asarray(parts2[2].get("h2o")),
                               rtol=1e-5)


@needs_ref
def test_save_radiative_properties(tmp_path):
    from ecrad_tpu.config import RadiationConfig, Solver
    from ecrad_tpu.interface import setup_radiation
    from ecrad_tpu.io.input_reader import read_input
    from ecrad_tpu.io.netcdf import NetcdfFile
    from ecrad_tpu.io.output import save_radiative_properties
    sl, thermo, gas, cloud, aer = read_input(IFS_IN)
    cfg = RadiationConfig(i_solver_sw=Solver.CLOUDLESS,
                          i_solver_lw=Solver.CLOUDLESS,
                          use_aerosols=False,
                          directory_name="/root/reference/data")
    setup = setup_radiation(cfg)
    path = tmp_path / "props.nc"
    save_radiative_properties(str(path), setup, sl, thermo, gas)
    with NetcdfFile(str(path)) as f:
        od_lw = f.read("od_lw")
        assert od_lw.shape[2] == 140
        assert np.isfinite(od_lw).all() and (od_lw >= 0).all()
        assert f.exists("incoming_sw") and f.exists("planck_hl")


def test_describe_config():
    from ecrad_tpu.config import RadiationConfig, describe_config
    text = describe_config(RadiationConfig())
    assert "i_solver_sw" in text and "MCICA" in text
    assert "cloud_fraction_threshold" in text


def test_spectral_clear_and_canopy_outputs(tmp_path):
    """Clear-sky spectral profiles + canopy-top fluxes reach the output
    file under the reference variable names (radiation_save.F90)."""
    import jax.numpy as jnp
    from ecrad_tpu.io.netcdf import NetcdfFile
    from ecrad_tpu.io.output import save_fluxes
    from ecrad_tpu.types import Flux
    ncol, nlev, nb = 3, 5, 14
    f32 = lambda *s: jnp.ones(s, jnp.float32)
    flux = Flux(
        lw_up=f32(ncol, nlev + 1), lw_dn=f32(ncol, nlev + 1),
        sw_up=f32(ncol, nlev + 1), sw_dn=f32(ncol, nlev + 1),
        sw_dn_direct=f32(ncol, nlev + 1),
        sw_up_band_clear=f32(ncol, nlev + 1, nb),
        sw_dn_band_clear=f32(ncol, nlev + 1, nb),
        sw_dn_direct_band_clear=f32(ncol, nlev + 1, nb),
        lw_up_band_clear=f32(ncol, nlev + 1, 16),
        lw_dn_band_clear=f32(ncol, nlev + 1, 16),
        sw_dn_surf_band=f32(ncol, nb),
        sw_dn_direct_surf_band=f32(ncol, nb),
        sw_dn_diffuse_surf_canopy=f32(ncol, 6),
        sw_dn_direct_surf_canopy=f32(ncol, 6),
        lw_dn_surf_canopy=f32(ncol, 3),
    )
    path = tmp_path / "out.nc"
    save_fluxes(str(path), flux)
    with NetcdfFile(str(path)) as f:
        for name in ("spectral_flux_up_sw_clear",
                     "spectral_flux_dn_sw_clear",
                     "spectral_flux_dn_direct_sw_clear",
                     "spectral_flux_up_lw_clear",
                     "spectral_flux_dn_lw_clear",
                     "spectral_flux_dn_sw_surf",
                     "spectral_flux_dn_direct_sw_surf",
                     "canopy_flux_dn_diffuse_sw_surf",
                     "canopy_flux_dn_direct_sw_surf",
                     "canopy_flux_dn_lw_surf"):
            assert f.exists(name), name


@needs_ref
def test_hdf5_output(tmp_path):
    """do_write_hdf5 writes a NetCDF4/HDF5 deflated file whose fluxes
    match the classic-format output bit-for-bit (easy_netcdf.F90
    NF90_HDF5 mode; ecrad_driver_config.F90:92)."""
    from ecrad_tpu.driver import main
    from ecrad_tpu.io.netcdf import NetcdfFile, _is_hdf5
    nam = tmp_path / "c.nam"
    nam.write_text("""
&radiation_driver
iverbose = 1
iendcol = 4
do_write_hdf5 = true
/
&radiation
do_sw = true
do_lw = true
directory_name = "/root/reference/data"
/
""")
    nam2 = tmp_path / "c2.nam"
    nam2.write_text(nam.read_text().replace("do_write_hdf5 = true", ""))
    out_h5 = tmp_path / "out_h5.nc"
    out_nc = tmp_path / "out_nc.nc"
    assert main([str(nam), IFS_IN, str(out_h5)]) == 0
    assert main([str(nam2), IFS_IN, str(out_nc)]) == 0
    assert _is_hdf5(str(out_h5)) and not _is_hdf5(str(out_nc))
    with NetcdfFile(str(out_h5)) as fh, NetcdfFile(str(out_nc)) as fc:
        for var in ("flux_up_lw", "flux_dn_sw", "flux_dn_direct_sw"):
            np.testing.assert_array_equal(fh.read(var), fc.read(var))
    # deflate actually engaged: h5py reports gzip compression
    import h5py
    with h5py.File(str(out_h5), "r") as f:
        assert f["flux_up_lw"].compression == "gzip"


@needs_ref
def test_entrapment_data_dump(tmp_path):
    """do_print_entrapment_data captures SPARTACUS SW migration
    distances + top-of-layer region fluxes and the driver writes them
    in the reference's fort.101/fort.102 format
    (PRINT_ENTRAPMENT_DATA, Makefile:54-60)."""
    from ecrad_tpu.driver import main
    nam = tmp_path / "c.nam"
    nam.write_text("""
&radiation_driver
iverbose = 1
iendcol = 4
/
&radiation
do_sw = true
do_lw = false
sw_solver_name = "SPARTACUS"
do_3d_effects = true
do_print_entrapment_data = true
directory_name = "/root/reference/data"
/
""")
    out = tmp_path / "out.nc"
    assert main([str(nam), IFS_IN, str(out)]) == 0
    f101 = (tmp_path / "out.nc.fort.101").read_text().splitlines()
    f102 = (tmp_path / "out.nc.fort.102").read_text().splitlines()
    assert len(f101) == 4 * 137 and len(f102) == 4 * 137
    # 2 indices + 9 (f101) / 6 (f102) float fields for nreg=3
    assert len(f101[0].split()) == 11
    assert len(f102[0].split()) == 8
    vals = np.array([float(x) for x in f102[0].split()[2:]])
    assert np.isfinite(vals).all()
