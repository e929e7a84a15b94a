"""Longwave gas optical depths: the 16 RRTMG-IFS bands, vectorized.

Semantics mirror ifsrrtm/rrtm_taumol{1..16}.F90 (RRTMG_LW v4.85 as used by
the IFS): per-band major-species k-table interpolation (with the 3-point
eta scheme near pure-species limits), self/foreign water continuum, minor
gases with chi-ratio adjustments, CFC/CCl4 cross-sections, and Planck
fractions. Output is (ncol, nlev, 140) optical depth + Planck fraction,
levels surface-first (flipped to ecRad order by the bridge).

Instead of the reference's per-layer tropo/strato control flow, both
branches are expressed with one combined [ABSA; ABSB] table and a per-cell
tropopause mask — branch-free and XLA-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .setcoef import Coeffs

ONEMINUS = 1.0 - 1.0e-6


def _take(tab, idx):
    """tab (n, ng); idx (...,) int32 -> (..., ng)."""
    return jnp.take(tab, jnp.clip(idx, 0, tab.shape[0] - 1), axis=0)


def _lin(tab, ind0, frac):
    """Linear interpolation along a table's first axis.

    ind0 is the 0-based lower index; returns tab[ind0] +
    frac*(tab[ind0+1]-tab[ind0]) with shape (..., ng)."""
    t0 = _take(tab, ind0)
    t1 = _take(tab, ind0 + 1)
    return t0 + frac[..., None] * (t1 - t0)


def _self_for(c: Coeffs, selfref, forref):
    """Water-vapour self + foreign continuum terms (tropo self only)."""
    tauself = c.selffac[..., None] * _lin(selfref, c.indself - 1, c.selffrac)
    tauself = jnp.where(c.tropo[..., None], tauself, 0.0)
    taufor = c.forfac[..., None] * _lin(forref, c.indfor - 1, c.forfrac)
    return tauself, taufor


def _major_noeta(c: Coeffs, absa, absb, colgas_a, colgas_b):
    """Major-species term for bands without a binary species.

    colgas_a/b: (ncol, nlev) column amounts used below/above tropopause.
    """
    tab = jnp.concatenate([absa, absb], axis=0)
    na = absa.shape[0]
    r0a = (c.jp - 1) * 5 + (c.jt - 1)
    r1a = c.jp * 5 + (c.jt1 - 1)
    r0b = na + (c.jp - 13) * 5 + (c.jt - 1)
    r1b = na + (c.jp - 12) * 5 + (c.jt1 - 1)
    r0 = jnp.where(c.tropo, r0a, r0b)
    r1 = jnp.where(c.tropo, r1a, r1b)
    colgas = jnp.where(c.tropo, colgas_a, colgas_b)
    tau = colgas[..., None] * (
        c.fac00[..., None] * _take(tab, r0)
        + c.fac10[..., None] * _take(tab, r0 + 1)
        + c.fac01[..., None] * _take(tab, r1)
        + c.fac11[..., None] * _take(tab, r1 + 1))
    return tau


def _eta_index(specparm, mult):
    """js (0-based), fs for an eta interpolation with `mult` intervals."""
    specparm = jnp.minimum(specparm, ONEMINUS)
    specmult = mult * specparm
    js = jnp.floor(specmult).astype(jnp.int32)
    fs = specmult - js.astype(specmult.dtype)
    return specparm, js, fs


def _eta_weights_tropo(specparm, fs, facp0, facp1):
    """The 3-point eta scheme weights (rrtm_taumol3.F90:141-198).

    Returns (offsets[8], weights (..., 8)) covering both jt rows; offsets
    are relative to the 0-based row ((jp-1)*5+(jt-1))*9 + js.
    """
    p_lo = fs - 1.0
    p4_lo = p_lo ** 4
    fk0_lo, fk1_lo, fk2_lo = p4_lo, 1.0 - p_lo - 2.0 * p4_lo, p_lo + p4_lo
    p_hi = -fs
    p4_hi = p_hi ** 4
    fk0_hi, fk1_hi, fk2_hi = p4_hi, 1.0 - p_hi - 2.0 * p4_hi, p_hi + p4_hi

    lo = specparm < 0.125
    hi = specparm > 0.875
    zero = jnp.zeros_like(fs)

    # weights at offsets (-1, 0, 1, 2) for the fac*0 row
    wm1 = jnp.where(hi, fk2_hi, zero)
    w0 = jnp.where(lo, fk0_lo, jnp.where(hi, fk1_hi, 1.0 - fs))
    w1 = jnp.where(lo, fk1_lo, jnp.where(hi, fk0_hi, fs))
    w2 = jnp.where(lo, fk2_lo, zero)

    offsets = np.array([-1, 0, 1, 2, 8, 9, 10, 11], dtype=np.int32)
    weights = jnp.stack([
        wm1 * facp0, w0 * facp0, w1 * facp0, w2 * facp0,
        wm1 * facp1, w0 * facp1, w1 * facp1, w2 * facp1,
    ], axis=-1)
    return offsets, weights


def _major_eta(c: Coeffs, absa, absb, col1, col2_a_rat, col2_a_rat1,
               col2_b_rat, col2_b_rat1, col2, neta_b=5):
    """Major term for binary-species bands.

    speccomb = col1 + rat*col2 (rat differs for the two temperature rows
    and between tropo/strat). absb may be None (A-only bands) or have
    neta_b=1 (no eta above the tropopause).
    """
    dtype = col1.dtype
    # --- troposphere: 9-eta with 3-point end treatment ----------------
    speccomb = col1 + col2_a_rat * col2
    specparm, js, fs = _eta_index(col1 / speccomb, 8.0)
    speccomb1 = col1 + col2_a_rat1 * col2
    specparm1, js1, fs1 = _eta_index(col1 / speccomb1, 8.0)

    row0_a = ((c.jp - 1) * 5 + (c.jt - 1)) * 9 + js
    row1_a = (c.jp * 5 + (c.jt1 - 1)) * 9 + js1
    off0, w0 = _eta_weights_tropo(specparm, fs, c.fac00, c.fac10)
    off1, w1 = _eta_weights_tropo(specparm1, fs1, c.fac01, c.fac11)

    def gather_sum(tab, row, offs, w):
        rows = row[..., None] + offs  # (..., 8)
        vals = _take(tab, rows.reshape(*rows.shape[:-1], -1))  # (...,8,ng)
        return (w[..., None] * vals).sum(axis=-2)

    tau_a = (speccomb[..., None] * gather_sum(absa, row0_a, off0, w0)
             + speccomb1[..., None] * gather_sum(absa, row1_a, off1, w1))

    if absb is None:
        return tau_a, (js, fs, js1, fs1)

    # --- stratosphere ---------------------------------------------------
    if neta_b == 1:
        colgas_b = col1  # unused; caller handles no-eta strat separately
        raise ValueError("use _major_noeta for neta_b=1 bands")
    speccomb_b = col1 + col2_b_rat * col2
    specparm_b, jsb, fsb = _eta_index(col1 / speccomb_b, 4.0)
    speccomb1_b = col1 + col2_b_rat1 * col2
    specparm1_b, jsb1, fsb1 = _eta_index(col1 / speccomb1_b, 4.0)

    row0_b = ((c.jp - 13) * 5 + (c.jt - 1)) * 5 + jsb
    row1_b = ((c.jp - 12) * 5 + (c.jt1 - 1)) * 5 + jsb1

    def strat_term(tab, row, fs_, f0, f1):
        return ((1.0 - fs_)[..., None]
                * (f0[..., None] * _take(tab, row)
                   + f1[..., None] * _take(tab, row + 5))
                + fs_[..., None]
                * (f0[..., None] * _take(tab, row + 1)
                   + f1[..., None] * _take(tab, row + 6)))

    tau_b = (speccomb_b[..., None]
             * strat_term(absb, row0_b, fsb, c.fac00, c.fac10)
             + speccomb1_b[..., None]
             * strat_term(absb, row1_b, fsb1, c.fac01, c.fac11))

    tau = jnp.where(c.tropo[..., None], tau_a, tau_b)
    return tau, (js, fs, js1, fs1)


def _pfrac_eta(fracref, col1, rat, col2, mult):
    """Eta-interpolated Planck fraction. fracref: (ng, neta)."""
    speccomb = col1 + rat * col2
    _, jpl, fpl = _eta_index(col1 / speccomb, float(mult))
    frt = fracref.T  # (neta, ng)
    return _lin(frt, jpl, fpl)


def _minor_eta(ktab, jm, fm, indminor, minorfrac):
    """Minor-gas absorption with eta dependence. ktab: (neta, 19, ng)."""
    neta, nt, ng = ktab.shape
    flat = ktab.reshape(neta * nt, ng)
    row = jm * nt + (indminor - 1)
    m1 = _take(flat, row) + fm[..., None] * (
        _take(flat, row + nt) - _take(flat, row))
    m2 = _take(flat, row + 1) + fm[..., None] * (
        _take(flat, row + nt + 1) - _take(flat, row + 1))
    return m1 + minorfrac[..., None] * (m2 - m1)


def _minor_noeta(ktab, indminor, minorfrac):
    """Minor-gas absorption, no eta. ktab: (19, ng)."""
    return _lin(ktab, indminor - 1, minorfrac)


def _chi_adjust(col, coldry, chi_row, jp, thresh, base, expo,
                ref_is_chi=True, chi_const=None):
    """Chi-ratio based column adjustment for minor gases
    (e.g. rrtm_taumol3.F90:115-122)."""
    ref = chi_const if chi_const is not None else chi_row[jp]  # chi at jp+1
    chi = col / coldry
    rat = 1.0e20 * chi / ref
    adjfac = base + jnp.maximum(rat - base, 1e-30) ** expo
    adjcol = adjfac * ref * coldry * 1.0e-20
    return jnp.where(rat > thresh, adjcol, col)


def taumol_lw(c: Coeffs, t: dict):
    """All 16 LW bands. Returns (tau, pfrac), each (ncol, nlev, 140)."""
    chi = jnp.asarray(t["chi_mls"], c.colh2o.dtype)  # (7, 59)
    taus, fracs = [], []
    trop = c.tropo[..., None]

    def chi_at(gas_1b, jp_1b):
        # chi_mls(gas, jp) with Fortran 1-based indices
        return float(np.asarray(t["chi_mls"])[gas_1b - 1, jp_1b - 1])

    # ---------------- band 1: h2o, minor N2 --------------------------------
    selfref, forref = t["lw1_selfref"], t["lw1_forref"]
    tauself, taufor = _self_for(c, selfref, forref)
    major = _major_noeta(c, t["lw1_absa"], t["lw1_absb"], c.colh2o, c.colh2o)
    scalen2 = c.colbrd * c.scaleminorn2
    taun2_a = scalen2[..., None] * _minor_noeta(
        t["lw1_kao_mn2"], c.indminor, c.minorfrac)
    taun2_b = scalen2[..., None] * _minor_noeta(
        t["lw1_kbo_mn2"], c.indminor, c.minorfrac)
    taun2 = jnp.where(trop, taun2_a, taun2_b)
    corradj_a = jnp.where(c.pavel < 250.0,
                          1.0 - 0.15 * (250.0 - c.pavel) / 154.4, 1.0)
    corradj_b = 1.0 - 0.15 * (c.pavel / 95.6)
    corradj = jnp.where(c.tropo, corradj_a, corradj_b)
    taus.append(corradj[..., None] * (major + tauself + taufor + taun2))
    fr = jnp.where(trop, jnp.asarray(t["lw1_fracrefa"], major.dtype),
                   jnp.asarray(t["lw1_fracrefb"], major.dtype))
    fracs.append(jnp.broadcast_to(fr, major.shape))

    # ---------------- band 2: h2o ------------------------------------------
    tauself, taufor = _self_for(c, t["lw2_selfref"], t["lw2_forref"])
    major = _major_noeta(c, t["lw2_absa"], t["lw2_absb"], c.colh2o, c.colh2o)
    corradj = 1.0 - 0.05 * (c.pavel - 100.0) / 900.0
    tau_a = corradj[..., None] * (major + tauself + taufor)
    tau_b = major + taufor
    taus.append(jnp.where(trop, tau_a, tau_b))
    fr = jnp.where(trop, jnp.asarray(t["lw2_fracrefa"], major.dtype),
                   jnp.asarray(t["lw2_fracrefb"], major.dtype))
    fracs.append(jnp.broadcast_to(fr, major.shape))

    # ---------------- band 3: h2o+co2, minor n2o ---------------------------
    tauself, taufor = _self_for(c, t["lw3_selfref"], t["lw3_forref"])
    major, _ = _major_eta(c, t["lw3_absa"], t["lw3_absb"],
                          c.colh2o, c.rat_h2oco2, c.rat_h2oco2_1,
                          c.rat_h2oco2, c.rat_h2oco2_1, c.colco2)
    # minor N2O, eta-dependent (A: 9 eta, B: 5 eta)
    refm_a = chi_at(1, 3) / chi_at(2, 3)
    refm_b = chi_at(1, 13) / chi_at(2, 13)
    _, jm_a, fm_a = _eta_index(
        c.colh2o / (c.colh2o + refm_a * c.colco2), 8.0)
    _, jm_b, fm_b = _eta_index(
        c.colh2o / (c.colh2o + refm_b * c.colco2), 4.0)
    absn2o_a = _minor_eta(t["lw3_kao_mn2o"], jm_a, fm_a,
                          c.indminor, c.minorfrac)
    absn2o_b = _minor_eta(t["lw3_kbo_mn2o"], jm_b, fm_b,
                          c.indminor, c.minorfrac)
    absn2o = jnp.where(trop, absn2o_a, absn2o_b)
    adjcoln2o = _chi_adjust(c.coln2o, c.coldry, chi[3], c.jp,
                            1.5, 0.5, 0.65)
    taus.append(jnp.where(trop, major + tauself + taufor, major + taufor)
                + adjcoln2o[..., None] * absn2o)
    pf_a = _pfrac_eta(jnp.asarray(t["lw3_fracrefa"], major.dtype),
                      c.colh2o, chi_at(1, 9) / chi_at(2, 9), c.colco2, 8.0)
    pf_b = _pfrac_eta(jnp.asarray(t["lw3_fracrefb"], major.dtype),
                      c.colh2o, chi_at(1, 13) / chi_at(2, 13), c.colco2, 4.0)
    fracs.append(jnp.where(trop, pf_a, pf_b))

    # ---------------- band 4: h2o+co2 / o3+co2 -----------------------------
    tauself, taufor = _self_for(c, t["lw4_selfref"], t["lw4_forref"])
    # tropo: h2o+co2; strat: o3+co2 (different first species!)
    major_a, _ = _major_eta(c, t["lw4_absa"], None,
                            c.colh2o, c.rat_h2oco2, c.rat_h2oco2_1,
                            None, None, c.colco2)
    # strat part with o3+co2
    speccomb_b = c.colo3 + c.rat_o3co2 * c.colco2
    _, jsb, fsb = _eta_index(c.colo3 / speccomb_b, 4.0)
    speccomb1_b = c.colo3 + c.rat_o3co2_1 * c.colco2
    _, jsb1, fsb1 = _eta_index(c.colo3 / speccomb1_b, 4.0)
    absb = t["lw4_absb"]
    row0_b = ((c.jp - 13) * 5 + (c.jt - 1)) * 5 + jsb
    row1_b = ((c.jp - 12) * 5 + (c.jt1 - 1)) * 5 + jsb1

    def strat_term(tab, row, fs_, f0, f1):
        return ((1.0 - fs_)[..., None]
                * (f0[..., None] * _take(tab, row)
                   + f1[..., None] * _take(tab, row + 5))
                + fs_[..., None]
                * (f0[..., None] * _take(tab, row + 1)
                   + f1[..., None] * _take(tab, row + 6)))

    major_b = (speccomb_b[..., None]
               * strat_term(absb, row0_b, fsb, c.fac00, c.fac10)
               + speccomb1_b[..., None]
               * strat_term(absb, row1_b, fsb1, c.fac01, c.fac11))
    tau4 = jnp.where(trop, major_a + tauself + taufor, major_b)
    # empirical strat adjustment (rrtm_taumol4.F90: g 8..14, 1-based)
    ng4 = tau4.shape[-1]
    scale = np.ones(ng4)
    for g_1b, f in zip(range(8, 15), (0.92, 0.88, 1.07, 1.1, 0.99,
                                      0.88, 0.943)):
        if g_1b <= ng4:
            scale[g_1b - 1] = f
    tau4 = jnp.where(trop, tau4, tau4 * jnp.asarray(scale, tau4.dtype))
    taus.append(tau4)
    pf_a = _pfrac_eta(jnp.asarray(t["lw4_fracrefa"], tau4.dtype),
                      c.colh2o, chi_at(1, 11) / chi_at(2, 11), c.colco2, 8.0)
    pf_b = _pfrac_eta(jnp.asarray(t["lw4_fracrefb"], tau4.dtype),
                      c.colo3, chi_at(3, 13) / chi_at(2, 13), c.colco2, 4.0)
    fracs.append(jnp.where(trop, pf_a, pf_b))

    # ---------------- band 5: h2o+co2 / o3+co2, minor o3, ccl4 -------------
    tauself, taufor = _self_for(c, t["lw5_selfref"], t["lw5_forref"])
    major_a, _ = _major_eta(c, t["lw5_absa"], None,
                            c.colh2o, c.rat_h2oco2, c.rat_h2oco2_1,
                            None, None, c.colco2)
    refm_a = chi_at(1, 7) / chi_at(2, 7)
    _, jmo3, fmo3 = _eta_index(
        c.colh2o / (c.colh2o + refm_a * c.colco2), 8.0)
    abso3 = _minor_eta(t["lw5_kao_mo3"], jmo3, fmo3, c.indminor, c.minorfrac)
    speccomb_b = c.colo3 + c.rat_o3co2 * c.colco2
    _, jsb, fsb = _eta_index(c.colo3 / speccomb_b, 4.0)
    speccomb1_b = c.colo3 + c.rat_o3co2_1 * c.colco2
    _, jsb1, fsb1 = _eta_index(c.colo3 / speccomb1_b, 4.0)
    absb = t["lw5_absb"]
    row0_b = ((c.jp - 13) * 5 + (c.jt - 1)) * 5 + jsb
    row1_b = ((c.jp - 12) * 5 + (c.jt1 - 1)) * 5 + jsb1
    major_b = (speccomb_b[..., None]
               * strat_term(absb, row0_b, fsb, c.fac00, c.fac10)
               + speccomb1_b[..., None]
               * strat_term(absb, row1_b, fsb1, c.fac01, c.fac11))
    ccl4 = jnp.asarray(t["lw5_ccl4"], major_a.dtype)
    tau_a = (major_a + tauself + taufor
             + c.colo3[..., None] * abso3 + c.wx_ccl4[..., None] * ccl4)
    tau_b = major_b + c.wx_ccl4[..., None] * ccl4
    taus.append(jnp.where(trop, tau_a, tau_b))
    pf_a = _pfrac_eta(jnp.asarray(t["lw5_fracrefa"], major_a.dtype),
                      c.colh2o, chi_at(1, 5) / chi_at(2, 5), c.colco2, 8.0)
    pf_b = _pfrac_eta(jnp.asarray(t["lw5_fracrefb"], major_a.dtype),
                      c.colo3, chi_at(3, 43) / chi_at(2, 43), c.colco2, 4.0)
    fracs.append(jnp.where(trop, pf_a, pf_b))

    # ---------------- band 6: h2o; minor co2; cfc11, cfc12 ------------------
    tauself, taufor = _self_for(c, t["lw6_selfref"], t["lw6_forref"])
    r0a = (c.jp - 1) * 5 + (c.jt - 1)
    r1a = c.jp * 5 + (c.jt1 - 1)
    absa = t["lw6_absa"]
    major_a = c.colh2o[..., None] * (
        c.fac00[..., None] * _take(absa, r0a)
        + c.fac10[..., None] * _take(absa, r0a + 1)
        + c.fac01[..., None] * _take(absa, r1a)
        + c.fac11[..., None] * _take(absa, r1a + 1))
    absco2 = _minor_noeta(t["lw6_kao_mco2"], c.indminor, c.minorfrac)
    adjcolco2 = _chi_adjust(c.colco2, c.coldry, chi[1], c.jp,
                            3.0, 2.0, 0.77)
    cfc11 = jnp.asarray(t["lw6_cfc11adj"], major_a.dtype)
    cfc12 = jnp.asarray(t["lw6_cfc12"], major_a.dtype)
    cfc_term = (c.wx_cfc11[..., None] * cfc11
                + c.wx_cfc12[..., None] * cfc12)
    tau_a = (major_a + tauself + taufor
             + adjcolco2[..., None] * absco2 + cfc_term)
    taus.append(jnp.where(trop, tau_a, cfc_term))
    fr = jnp.asarray(t["lw6_fracrefa"], major_a.dtype)
    fracs.append(jnp.broadcast_to(fr, tau_a.shape))

    # ---------------- band 7: h2o+o3; minor co2 -----------------------------
    tauself, taufor = _self_for(c, t["lw7_selfref"], t["lw7_forref"])
    major_a, _ = _major_eta(c, t["lw7_absa"], None,
                            c.colh2o, c.rat_h2oo3, c.rat_h2oo3_1,
                            None, None, c.colo3)
    refm_a = chi_at(1, 3) / chi_at(3, 3)
    _, jmco2, fmco2 = _eta_index(
        c.colh2o / (c.colh2o + refm_a * c.colo3), 8.0)
    absco2_a = _minor_eta(t["lw7_kao_mco2"], jmco2, fmco2,
                          c.indminor, c.minorfrac)
    absco2_b = _minor_noeta(t["lw7_kbo_mco2"], c.indminor, c.minorfrac)
    adj_a = _chi_adjust(c.colco2, c.coldry, chi[1], c.jp, 3.0, 3.0, 0.79)
    adj_b = _chi_adjust(c.colco2, c.coldry, chi[1], c.jp, 3.0, 2.0, 0.79)
    major_b = _major_noeta(c, t["lw7_absa"][:1] * 0.0, t["lw7_absb"],
                           jnp.zeros_like(c.colo3), c.colo3)
    tau_a = (major_a + tauself + taufor + adj_a[..., None] * absco2_a)
    tau_b = major_b + adj_b[..., None] * absco2_b
    tau7 = jnp.where(trop, tau_a, tau_b)
    # empirical strat scaling (rrtm_taumol7.F90: g 6..11 of 12, 1-based)
    ng7 = tau7.shape[-1]
    scale = np.ones(ng7)
    for g_1b, f in zip(range(6, 12), (0.92, 0.88, 1.07, 1.1, 0.99, 0.855)):
        scale[g_1b - 1] = f
    tau7 = jnp.where(trop, tau7, tau7 * jnp.asarray(scale, tau7.dtype))
    taus.append(tau7)
    pf_a = _pfrac_eta(jnp.asarray(t["lw7_fracrefa"], tau7.dtype),
                      c.colh2o, chi_at(1, 3) / chi_at(3, 3), c.colo3, 8.0)
    fr_b = jnp.asarray(t["lw7_fracrefb"], tau7.dtype)
    fracs.append(jnp.where(trop, pf_a, jnp.broadcast_to(fr_b, tau7.shape)))

    # ---------------- band 8: h2o / o3; minors co2,o3,n2o; cfc12, cfc22 ----
    tauself, taufor = _self_for(c, t["lw8_selfref"], t["lw8_forref"])
    major = _major_noeta(c, t["lw8_absa"], t["lw8_absb"], c.colh2o, c.colo3)
    adjco2 = _chi_adjust(c.colco2, c.coldry, chi[1], c.jp, 3.0, 2.0, 0.65)
    absco2_a = _minor_noeta(t["lw8_kao_mco2"], c.indminor, c.minorfrac)
    absco2_b = _minor_noeta(t["lw8_kbo_mco2"], c.indminor, c.minorfrac)
    abso3_a = _minor_noeta(t["lw8_kao_mo3"], c.indminor, c.minorfrac)
    absn2o_a = _minor_noeta(t["lw8_kao_mn2o"], c.indminor, c.minorfrac)
    absn2o_b = _minor_noeta(t["lw8_kbo_mn2o"], c.indminor, c.minorfrac)
    cfc12 = jnp.asarray(t["lw8_cfc12"], major.dtype)
    cfc22 = jnp.asarray(t["lw8_cfc22adj"], major.dtype)
    cfc_term = (c.wx_cfc12[..., None] * cfc12
                + c.wx_cfc22[..., None] * cfc22)
    tau_a = (major + tauself + taufor + adjco2[..., None] * absco2_a
             + c.colo3[..., None] * abso3_a
             + c.coln2o[..., None] * absn2o_a + cfc_term)
    tau_b = (major + adjco2[..., None] * absco2_b
             + c.coln2o[..., None] * absn2o_b + cfc_term)
    taus.append(jnp.where(trop, tau_a, tau_b))
    fr = jnp.where(trop, jnp.asarray(t["lw8_fracrefa"], major.dtype),
                   jnp.asarray(t["lw8_fracrefb"], major.dtype))
    fracs.append(jnp.broadcast_to(fr, major.shape))

    # ---------------- band 9: h2o+ch4; minor n2o ----------------------------
    tauself, taufor = _self_for(c, t["lw9_selfref"], t["lw9_forref"])
    major_a, _ = _major_eta(c, t["lw9_absa"], None,
                            c.colh2o, c.rat_h2och4, c.rat_h2och4_1,
                            None, None, c.colch4)
    refm_a = chi_at(1, 3) / chi_at(6, 3)
    _, jmn2o, fmn2o = _eta_index(
        c.colh2o / (c.colh2o + refm_a * c.colch4), 8.0)
    absn2o_a = _minor_eta(t["lw9_kao_mn2o"], jmn2o, fmn2o,
                          c.indminor, c.minorfrac)
    absn2o_b = _minor_noeta(t["lw9_kbo_mn2o"], c.indminor, c.minorfrac)
    adjn2o = _chi_adjust(c.coln2o, c.coldry, chi[3], c.jp, 1.5, 0.5, 0.65)
    major_b = _major_noeta(c, t["lw9_absa"][:1] * 0.0, t["lw9_absb"],
                           jnp.zeros_like(c.colch4), c.colch4)
    tau_a = major_a + tauself + taufor + adjn2o[..., None] * absn2o_a
    tau_b = major_b + adjn2o[..., None] * absn2o_b
    taus.append(jnp.where(trop, tau_a, tau_b))
    pf_a = _pfrac_eta(jnp.asarray(t["lw9_fracrefa"], tau_a.dtype),
                      c.colh2o, chi_at(1, 9) / chi_at(6, 9), c.colch4, 8.0)
    fr_b = jnp.asarray(t["lw9_fracrefb"], tau_a.dtype)
    fracs.append(jnp.where(trop, pf_a, jnp.broadcast_to(fr_b, tau_a.shape)))

    # ---------------- band 10: h2o ------------------------------------------
    tauself, taufor = _self_for(c, t["lw10_selfref"], t["lw10_forref"])
    major = _major_noeta(c, t["lw10_absa"], t["lw10_absb"],
                         c.colh2o, c.colh2o)
    taus.append(jnp.where(trop, major + tauself + taufor, major + taufor))
    fr = jnp.where(trop, jnp.asarray(t["lw10_fracrefa"], major.dtype),
                   jnp.asarray(t["lw10_fracrefb"], major.dtype))
    fracs.append(jnp.broadcast_to(fr, major.shape))

    # ---------------- band 11: h2o; minor o2 --------------------------------
    tauself, taufor = _self_for(c, t["lw11_selfref"], t["lw11_forref"])
    major = _major_noeta(c, t["lw11_absa"], t["lw11_absb"],
                         c.colh2o, c.colh2o)
    scaleo2 = c.colo2 * c.scaleminor
    tauo2_a = scaleo2[..., None] * _minor_noeta(
        t["lw11_kao_mo2"], c.indminor, c.minorfrac)
    tauo2_b = scaleo2[..., None] * _minor_noeta(
        t["lw11_kbo_mo2"], c.indminor, c.minorfrac)
    tau_a = major + tauself + taufor + tauo2_a
    tau_b = major + taufor + tauo2_b
    taus.append(jnp.where(trop, tau_a, tau_b))
    fr = jnp.where(trop, jnp.asarray(t["lw11_fracrefa"], major.dtype),
                   jnp.asarray(t["lw11_fracrefb"], major.dtype))
    fracs.append(jnp.broadcast_to(fr, major.shape))

    # ---------------- band 12: h2o+co2 (A only) -----------------------------
    tauself, taufor = _self_for(c, t["lw12_selfref"], t["lw12_forref"])
    major_a, _ = _major_eta(c, t["lw12_absa"], None,
                            c.colh2o, c.rat_h2oco2, c.rat_h2oco2_1,
                            None, None, c.colco2)
    tau_a = major_a + tauself + taufor
    taus.append(jnp.where(trop, tau_a, jnp.zeros_like(tau_a)))
    pf_a = _pfrac_eta(jnp.asarray(t["lw12_fracrefa"], tau_a.dtype),
                      c.colh2o, chi_at(1, 10) / chi_at(2, 10), c.colco2, 8.0)
    fracs.append(jnp.where(trop, pf_a, jnp.zeros_like(pf_a)))

    # ---------------- band 13: h2o+n2o; minors co2, co; strat o3 ------------
    tauself, taufor = _self_for(c, t["lw13_selfref"], t["lw13_forref"])
    major_a, _ = _major_eta(c, t["lw13_absa"], None,
                            c.colh2o, c.rat_h2on2o, c.rat_h2on2o_1,
                            None, None, c.coln2o)
    refm_a = chi_at(1, 1) / chi_at(4, 1)
    _, jmco2, fmco2 = _eta_index(
        c.colh2o / (c.colh2o + refm_a * c.coln2o), 8.0)
    absco2 = _minor_eta(t["lw13_kao_mco2"], jmco2, fmco2,
                        c.indminor, c.minorfrac)
    adjco2 = _chi_adjust(c.colco2, c.coldry, chi[1], c.jp, 3.0, 2.0, 0.68,
                         chi_const=3.55e-4)
    refm_a3 = chi_at(1, 3) / chi_at(4, 3)
    _, jmco, fmco = _eta_index(
        c.colh2o / (c.colh2o + refm_a3 * c.coln2o), 8.0)
    absco = _minor_eta(t["lw13_kao_mco"], jmco, fmco,
                       c.indminor, c.minorfrac)
    # CO column: computed from coldry & chi in reference? The reference
    # passes COLCO (Z_COLCO); IFS has no CO gas in WKL(5) (prepare_gases
    # leaves it 0) so COLCO=0 -> the CO term vanishes; keep 0 for parity.
    colco = jnp.zeros_like(c.colh2o)
    abso3_b = _minor_noeta(t["lw13_kbo_mo3"], c.indminor, c.minorfrac)
    tau_a = (major_a + tauself + taufor + adjco2[..., None] * absco2
             + colco[..., None] * absco)
    tau_b = c.colo3[..., None] * abso3_b
    taus.append(jnp.where(trop, tau_a, tau_b))
    pf_a = _pfrac_eta(jnp.asarray(t["lw13_fracrefa"], tau_a.dtype),
                      c.colh2o, chi_at(1, 5) / chi_at(4, 5), c.coln2o, 8.0)
    fr_b = jnp.asarray(t["lw13_fracrefb"], tau_a.dtype)
    fracs.append(jnp.where(trop, pf_a, jnp.broadcast_to(fr_b, tau_a.shape)))

    # ---------------- band 14: co2 ------------------------------------------
    tauself, taufor = _self_for(c, t["lw14_selfref"], t["lw14_forref"])
    major = _major_noeta(c, t["lw14_absa"], t["lw14_absb"],
                         c.colco2, c.colco2)
    taus.append(jnp.where(trop, major + tauself + taufor, major))
    fr = jnp.where(trop, jnp.asarray(t["lw14_fracrefa"], major.dtype),
                   jnp.asarray(t["lw14_fracrefb"], major.dtype))
    fracs.append(jnp.broadcast_to(fr, major.shape))

    # ---------------- band 15: n2o+co2; minor n2 (A only) -------------------
    tauself, taufor = _self_for(c, t["lw15_selfref"], t["lw15_forref"])
    major_a, _ = _major_eta(c, t["lw15_absa"], None,
                            c.coln2o, c.rat_n2oco2, c.rat_n2oco2_1,
                            None, None, c.colco2)
    refm_a = chi_at(4, 1) / chi_at(2, 1)
    _, jmn2, fmn2 = _eta_index(
        c.coln2o / (c.coln2o + refm_a * c.colco2), 8.0)
    scalen2 = c.colbrd * c.scaleminor
    taun2 = scalen2[..., None] * _minor_eta(
        t["lw15_kao_mn2"], jmn2, fmn2, c.indminor, c.minorfrac)
    tau_a = major_a + tauself + taufor + taun2
    taus.append(jnp.where(trop, tau_a, jnp.zeros_like(tau_a)))
    pf_a = _pfrac_eta(jnp.asarray(t["lw15_fracrefa"], tau_a.dtype),
                      c.coln2o, chi_at(4, 1) / chi_at(2, 1), c.colco2, 8.0)
    fracs.append(jnp.where(trop, pf_a, jnp.zeros_like(pf_a)))

    # ---------------- band 16: h2o+ch4 / ch4 --------------------------------
    tauself, taufor = _self_for(c, t["lw16_selfref"], t["lw16_forref"])
    major_a, _ = _major_eta(c, t["lw16_absa"], None,
                            c.colh2o, c.rat_h2och4, c.rat_h2och4_1,
                            None, None, c.colch4)
    major_b = _major_noeta(c, t["lw16_absa"][:1] * 0.0, t["lw16_absb"],
                           jnp.zeros_like(c.colch4), c.colch4)
    tau_a = major_a + tauself + taufor
    taus.append(jnp.where(trop, tau_a, major_b))
    pf_a = _pfrac_eta(jnp.asarray(t["lw16_fracrefa"], tau_a.dtype),
                      c.colh2o, chi_at(1, 6) / chi_at(6, 6), c.colch4, 8.0)
    fr_b = jnp.asarray(t["lw16_fracrefb"], tau_a.dtype)
    fracs.append(jnp.where(trop, pf_a, jnp.broadcast_to(fr_b, tau_a.shape)))

    tau = jnp.concatenate(taus, axis=-1)
    pfrac = jnp.concatenate(fracs, axis=-1)
    return tau, pfrac
