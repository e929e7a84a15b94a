"""Analysis package: loading, derived fields, comparison, plotting.

Reference parity: practical/ecradplot (io/plot) + compare_output*.py.
"""
import os

import numpy as np
import pytest

IFS_IN = "/root/reference/test/ifs/ecrad_meridian.nc"
IFS_REF = "/root/reference/test/ifs/ecrad_meridian_default_out_REFERENCE.nc"

needs_ref = pytest.mark.skipif(not os.path.exists(IFS_IN),
                               reason="reference test files unavailable")


@needs_ref
def test_load_and_derive():
    from ecrad_tpu.analysis import derive_fields, load_fluxes, load_inputs
    inputs = load_inputs(IFS_IN)
    assert "pressure_fl" in inputs
    assert inputs["pressure_fl"].shape[1] == \
        inputs["pressure_hl"].shape[1] - 1
    ds = derive_fields(load_fluxes(IFS_REF), inputs)
    for var in ("flux_net_lw", "heating_rate_lw", "heating_rate_sw",
                "cloud_radiative_effect_lw", "cloud_radiative_effect_sw"):
        assert var in ds, var
        assert np.isfinite(ds[var]).all(), var
    # LW cooling in the troposphere on average
    assert ds["heating_rate_lw"].mean() < 0.0
    # heating-rate formula cross-check against the flux divergence
    c = 24 * 3600 * 9.81 / 1004.0
    net = ds["flux_net_lw"]
    dp = np.diff(inputs["pressure_hl"], axis=1)
    expected = -c * np.diff(net, axis=1) / dp
    np.testing.assert_allclose(ds["heating_rate_lw"], expected)


@needs_ref
def test_compare_identical_is_zero(tmp_path):
    from ecrad_tpu.analysis import compare_outputs, format_report
    from ecrad_tpu.analysis.io import load_fluxes, load_inputs
    inputs = load_inputs(IFS_IN)
    ref = load_fluxes(IFS_REF)
    stats = compare_outputs(inputs, ref, ref)
    assert stats, "no variables compared"
    for var, s in stats.items():
        assert s["max_abs"] == 0.0, var
    report = format_report(stats)
    assert "flux_up_lw" in report


@needs_ref
def test_compare_cli(tmp_path, capsys):
    from ecrad_tpu.analysis.compare import main
    rc = main([IFS_IN, IFS_REF, IFS_REF, "--tolerance", "0.5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PASS" in out


@needs_ref
def test_plot_output(tmp_path):
    pytest.importorskip("matplotlib")
    from ecrad_tpu.analysis.plot import plot_output
    dst = tmp_path / "overview.png"
    plot_output(IFS_IN, IFS_REF, str(dst))
    assert dst.exists() and dst.stat().st_size > 10000
    dst2 = tmp_path / "diff.png"
    plot_output(IFS_IN, IFS_REF, str(dst2), reference_nc=IFS_REF)
    assert dst2.exists()
