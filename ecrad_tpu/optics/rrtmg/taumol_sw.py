"""Shortwave gas + Rayleigh optical depths: the 14 RRTMG-IFS bands.

Semantics mirror ifsrrtm/srtm_taumol{16..29}.F90 and the dispatch in
ifsrrtm/srtm_gas_optical_depth.F90: per band, tau_gas and tau_rayleigh per
g-point plus the top-of-atmosphere solar source (SFLUXZEN) taken at the
layer where the pressure-interpolation index crosses the band's reference
level (LAYREFFR / LAYSOLFR logic).

Arrays are (ncol, nlev) surface-first. Instead of compressing to daylight
columns (reference gathers cols with mu0>0) we compute everywhere and let
the solver mask night columns — predication beats gathers on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .setcoef import Coeffs

ONEMINUS = 1.0 - 1.0e-6


def _take(tab, idx):
    return jnp.take(tab, jnp.clip(idx, 0, tab.shape[0] - 1), axis=0)


def _lin(tab, ind0, frac):
    t0 = _take(tab, ind0)
    t1 = _take(tab, ind0 + 1)
    return t0 + frac[..., None] * (t1 - t0)


def _self_for(c: Coeffs, selfref, forref):
    tauself = c.selffac[..., None] * _lin(selfref, c.indself - 1, c.selffrac)
    tauself = jnp.where(c.tropo[..., None], tauself, 0.0)
    taufor = c.forfac[..., None] * _lin(forref, c.indfor - 1, c.forfrac)
    return tauself, taufor


def _eta(col1, speccomb, mult):
    specparm = jnp.minimum(col1 / speccomb, ONEMINUS)
    specmult = mult * specparm
    js = jnp.floor(specmult).astype(jnp.int32)
    fs = specmult - js.astype(specmult.dtype)
    return js, fs


def _major_noeta_rows(c, nspa, nspb):
    r0a = ((c.jp - 1) * 5 + (c.jt - 1)) * nspa
    r1a = (c.jp * 5 + (c.jt1 - 1)) * nspa
    r0b = ((c.jp - 13) * 5 + (c.jt - 1)) * nspb
    r1b = ((c.jp - 12) * 5 + (c.jt1 - 1)) * nspb
    return r0a, r1a, r0b, r1b


def _interp2(tab, r0, r1, f00, f10, f01, f11, stride):
    """2-point (jt) interpolation: fac00*T[r0] + fac10*T[r0+stride] + ..."""
    return (f00[..., None] * _take(tab, r0)
            + f10[..., None] * _take(tab, r0 + stride)
            + f01[..., None] * _take(tab, r1)
            + f11[..., None] * _take(tab, r1 + stride))


def _interp_eta(tab, row, fs, f0, f1, stride):
    """SW eta interpolation (2-point in eta):
    (1-fs)*(f0*T[row] + f1*T[row+stride]) + fs*(f0*T[row+1]+f1*T[row+1+s])
    """
    return ((1.0 - fs)[..., None] * (f0[..., None] * _take(tab, row)
                                     + f1[..., None] * _take(tab,
                                                             row + stride))
            + fs[..., None] * (f0[..., None] * _take(tab, row + 1)
                               + f1[..., None] * _take(tab,
                                                       row + 1 + stride)))


def _first_true(mask, default_idx):
    """Index of first True along the level axis (axis=1), else default."""
    any_ = mask.any(axis=1)
    idx = jnp.argmax(mask, axis=1)
    return jnp.where(any_, idx, default_idx)


def _laysolfr_strat(c: Coeffs, layreffr: int):
    """Strat-referenced bands (16,27,28,29): first strat layer where jp
    crosses layreffr; default = top layer (srtm_taumol16.F90)."""
    jp_prev = jnp.concatenate([c.jp[:, :1], c.jp[:, :-1]], axis=1)
    crossing = (jp_prev < layreffr) & (c.jp >= layreffr) & (~c.tropo)
    nlev = c.jp.shape[1]
    return _first_true(crossing, nlev - 1)


def _laysolfr_tropo(c: Coeffs, layreffr: int):
    """Tropo-referenced bands (18-25): laysolfr = min(lay+1, laytrop) at
    the tropo layer where jp crosses layreffr; default = laytrop."""
    laytrop_idx = c.tropo.sum(axis=1) - 1  # 0-based last tropo layer
    jp_next = jnp.concatenate([c.jp[:, 1:], c.jp[:, -1:]], axis=1)
    crossing = (c.jp < layreffr) & (jp_next >= layreffr) & c.tropo
    lay = _first_true(crossing, laytrop_idx)
    found = crossing.any(axis=1)
    return jnp.where(found, jnp.minimum(lay + 1, laytrop_idx), laytrop_idx)


def _at_layer(arr2d, lay):
    """Gather per-column values at per-column layer index: (ncol,nlev)->(ncol,)"""
    return jnp.take_along_axis(arr2d, lay[:, None], axis=1)[:, 0]


def _sflux_1d(sfluxref, ncol, dtype):
    return jnp.broadcast_to(jnp.asarray(sfluxref, dtype), (ncol,
                                                           len(sfluxref)))


def _sflux_eta(sfluxref, js_lay, fs_lay):
    """sfluxref: (ng, neta); js/fs per column at the solfr layer."""
    tabt = jnp.asarray(sfluxref).T  # (neta, ng)
    return _lin(tabt, js_lay, fs_lay)


def taumol_sw(c: Coeffs, t: dict):
    """All 14 SW bands. Returns (taug, taur, sfluxzen):
    taug/taur (ncol, nlev, 112), sfluxzen (ncol, 112)."""
    dtype = c.colh2o.dtype
    ncol, nlev = c.colh2o.shape
    trop = c.tropo[..., None]
    f00, f10, f01, f11 = c.fac00_sw, c.fac10_sw, c.fac01_sw, c.fac11_sw
    taugs, taurs, sfluxes = [], [], []

    def band_eta_tropo(absa, col1, col2, strrat):
        speccomb = col1 + strrat * col2
        js, fs = _eta(col1, speccomb, 8.0)
        row0 = ((c.jp - 1) * 5 + (c.jt - 1)) * 9 + js
        row1 = (c.jp * 5 + (c.jt1 - 1)) * 9 + js
        tau = speccomb[..., None] * (
            (1.0 - fs)[..., None] * (
                f00[..., None] * _take(absa, row0)
                + f10[..., None] * _take(absa, row0 + 9)
                + f01[..., None] * _take(absa, row1)
                + f11[..., None] * _take(absa, row1 + 9))
            + fs[..., None] * (
                f00[..., None] * _take(absa, row0 + 1)
                + f10[..., None] * _take(absa, row0 + 10)
                + f01[..., None] * _take(absa, row1 + 1)
                + f11[..., None] * _take(absa, row1 + 10)))
        return tau, js, fs

    def band_eta_strat(absb, col1, col2, strrat):
        speccomb = col1 + strrat * col2
        js, fs = _eta(col1, speccomb, 4.0)
        row0 = ((c.jp - 13) * 5 + (c.jt - 1)) * 5 + js
        row1 = ((c.jp - 12) * 5 + (c.jt1 - 1)) * 5 + js
        tau = speccomb[..., None] * (
            (1.0 - fs)[..., None] * (
                f00[..., None] * _take(absb, row0)
                + f10[..., None] * _take(absb, row0 + 5)
                + f01[..., None] * _take(absb, row1)
                + f11[..., None] * _take(absb, row1 + 5))
            + fs[..., None] * (
                f00[..., None] * _take(absb, row0 + 1)
                + f10[..., None] * _take(absb, row0 + 6)
                + f01[..., None] * _take(absb, row1 + 1)
                + f11[..., None] * _take(absb, row1 + 6)))
        return tau, js, fs

    def band_noeta(absa, absb, col_a, col_b):
        r0a, r1a, r0b, r1b = _major_noeta_rows(c, 1, 1)
        tau_a = col_a[..., None] * _interp2(absa, r0a, r1a,
                                            f00, f10, f01, f11, 1)
        if absb is None:
            return tau_a, jnp.zeros_like(tau_a)
        tau_b = col_b[..., None] * _interp2(absb, r0b, r1b,
                                            f00, f10, f01, f11, 1)
        return tau_a, tau_b

    # ====================== band 16 (2600-3250): h2o+ch4 / ch4 ==========
    tauself, taufor = _self_for(c, t["sw16_selfref"], t["sw16_forref"])
    absa, absb = t["sw16_absa"], t["sw16_absb"]
    tau_a, js, fs = band_eta_tropo(absa, c.colh2o, c.colch4,
                                   float(t["sw16_strrat1"]))
    r0a, r1a, r0b, r1b = _major_noeta_rows(c, 1, 1)
    tau_b = c.colch4[..., None] * _interp2(absb, r0b, r1b,
                                           f00, f10, f01, f11, 1)
    taug = jnp.where(trop, tau_a + tauself + taufor, tau_b)
    taur = (c.colmol * float(t["sw16_rayl"]))[..., None] * jnp.ones(
        (1, 1, absa.shape[1]), dtype)
    lay = _laysolfr_strat(c, int(t["sw16_layreffr"]))
    sflux = _sflux_1d(t["sw16_sfluxref"], ncol, dtype)
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 17: h2o+co2 / h2o+co2 ===================
    tauself, taufor = _self_for(c, t["sw17_selfref"], t["sw17_forref"])
    absa, absb = t["sw17_absa"], t["sw17_absb"]
    strrat = float(t["sw17_strrat"])
    tau_a, js_a, fs_a = band_eta_tropo(absa, c.colh2o, c.colco2, strrat)
    tau_b, js_b, fs_b = band_eta_strat(absb, c.colh2o, c.colco2, strrat)
    taug = jnp.where(trop, tau_a + tauself + taufor, tau_b + taufor)
    taur = (c.colmol * float(t["sw17_rayl"]))[..., None] * jnp.ones(
        (1, 1, absa.shape[1]), dtype)
    lay = _laysolfr_strat(c, int(t["sw17_layreffr"]))
    sflux = _sflux_eta(t["sw17_sfluxref"], _at_layer(js_b, lay),
                       _at_layer(fs_b, lay))
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== bands 18/19/21: eta tropo + (no)eta strat ====
    for band, col2_name, strat_eta in ((18, "colch4", False),
                                       (19, "colco2", False),
                                       (21, "colco2", True)):
        k = f"sw{band}"
        tauself, taufor = _self_for(c, t[f"{k}_selfref"], t[f"{k}_forref"])
        absa, absb = t[f"{k}_absa"], t[f"{k}_absb"]
        strrat = float(t[f"{k}_strrat"])
        col2 = getattr(c, col2_name)
        tau_a, js_a, fs_a = band_eta_tropo(absa, c.colh2o, col2, strrat)
        if strat_eta:
            tau_b, _, _ = band_eta_strat(absb, c.colh2o, col2, strrat)
            tau_b = tau_b + taufor
        else:
            r0a, r1a, r0b, r1b = _major_noeta_rows(c, 1, 1)
            tau_b = col2[..., None] * _interp2(absb, r0b, r1b,
                                               f00, f10, f01, f11, 1)
        taug = jnp.where(trop, tau_a + tauself + taufor, tau_b)
        taur = (c.colmol * float(t[f"{k}_rayl"]))[..., None] * jnp.ones(
            (1, 1, absa.shape[1]), dtype)
        lay = _laysolfr_tropo(c, int(t[f"{k}_layreffr"]))
        sflux = _sflux_eta(t[f"{k}_sfluxref"], _at_layer(js_a, lay),
                           _at_layer(fs_a, lay))
        taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 20: h2o + ch4 cross-section =============
    tauself, taufor = _self_for(c, t["sw20_selfref"], t["sw20_forref"])
    absa, absb = t["sw20_absa"], t["sw20_absb"]
    tau_a, tau_b = band_noeta(absa, absb, c.colh2o, c.colh2o)
    absch4 = jnp.asarray(t["sw20_absch4"], dtype)
    ch4_term = c.colch4[..., None] * absch4
    taug = jnp.where(trop, tau_a + tauself + taufor + ch4_term,
                     tau_b + taufor + ch4_term)
    taur = (c.colmol * float(t["sw20_rayl"]))[..., None] * jnp.ones(
        (1, 1, absa.shape[1]), dtype)
    lay = _laysolfr_tropo(c, int(t["sw20_layreffr"]))
    sflux = _sflux_1d(t["sw20_sfluxref"], ncol, dtype)
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)
    # (band 20 ordering: comes after 18/19 but before 21 in spectral
    # order; reorder at the end)

    # ====================== band 22: h2o+o2 / o2 =========================
    tauself, taufor = _self_for(c, t["sw22_selfref"], t["sw22_forref"])
    absa, absb = t["sw22_absa"], t["sw22_absb"]
    o2adj = 1.6
    o2cont = (4.35e-4 * c.colo2 / (350.0 * 2.0))[..., None]
    strrat = float(t["sw22_strrat"])
    # speccomb = colh2o + o2adj*strrat*colo2 (srtm_taumol22.F90)
    tau_a, js_a, fs_a = band_eta_tropo(absa, c.colh2o, o2adj * c.colo2,
                                       strrat)
    r0a, r1a, r0b, r1b = _major_noeta_rows(c, 1, 1)
    tau_b = (c.colo2 * o2adj)[..., None] * _interp2(
        absb, r0b, r1b, f00, f10, f01, f11, 1)
    taug = jnp.where(trop, tau_a + tauself + taufor + o2cont,
                     tau_b + o2cont)
    taur = (c.colmol * float(t["sw22_rayl"]))[..., None] * jnp.ones(
        (1, 1, absa.shape[1]), dtype)
    lay = _laysolfr_tropo(c, int(t["sw22_layreffr"]))
    sflux = _sflux_eta(t["sw22_sfluxref"], _at_layer(js_a, lay),
                       _at_layer(fs_a, lay))
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 23: h2o only, per-g rayleigh ============
    tauself, taufor = _self_for(c, t["sw23_selfref"], t["sw23_forref"])
    absa = t["sw23_absa"]
    r0a, r1a, _, _ = _major_noeta_rows(c, 1, 1)
    givfac = float(t["sw23_givfac"])
    tau_a = c.colh2o[..., None] * (
        givfac * _interp2(absa, r0a, r1a, f00, f10, f01, f11, 1))
    taug = jnp.where(trop, tau_a + tauself + taufor, 0.0)
    raylc = jnp.asarray(t["sw23_rayl"], dtype)
    taur = c.colmol[..., None] * raylc
    lay = _laysolfr_tropo(c, int(t["sw23_layreffr"]))
    sflux = _sflux_1d(t["sw23_sfluxref"], ncol, dtype)
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 24: h2o+o2 / o2, o3 cross-sections ======
    tauself, taufor = _self_for(c, t["sw24_selfref"], t["sw24_forref"])
    absa, absb = t["sw24_absa"], t["sw24_absb"]
    strrat = float(t["sw24_strrat"])
    tau_a, js_a, fs_a = band_eta_tropo(absa, c.colh2o, c.colo2, strrat)
    abso3a = jnp.asarray(t["sw24_abso3a"], dtype)
    abso3b = jnp.asarray(t["sw24_abso3b"], dtype)
    r0a, r1a, r0b, r1b = _major_noeta_rows(c, 1, 1)
    tau_b = c.colo2[..., None] * _interp2(absb, r0b, r1b,
                                          f00, f10, f01, f11, 1)
    taug = jnp.where(trop,
                     tau_a + tauself + taufor
                     + c.colo3[..., None] * abso3a,
                     tau_b + c.colo3[..., None] * abso3b)
    rayla = jnp.asarray(t["sw24_rayla"], dtype).T  # (9, ng)
    raylb = jnp.asarray(t["sw24_raylb"], dtype)
    taur_a = c.colmol[..., None] * _lin(rayla, js_a, fs_a)
    taur_b = c.colmol[..., None] * raylb
    taur = jnp.where(trop, taur_a, taur_b)
    lay = _laysolfr_tropo(c, int(t["sw24_layreffr"]))
    sflux = _sflux_eta(t["sw24_sfluxref"], _at_layer(js_a, lay),
                       _at_layer(fs_a, lay))
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 25: h2o + o3 cross-sections =============
    absa = t["sw25_absa"]
    r0a, r1a, _, _ = _major_noeta_rows(c, 1, 1)
    tau_a = c.colh2o[..., None] * _interp2(absa, r0a, r1a,
                                           f00, f10, f01, f11, 1)
    abso3a = jnp.asarray(t["sw25_abso3a"], dtype)
    abso3b = jnp.asarray(t["sw25_abso3b"], dtype)
    taug = jnp.where(trop, tau_a + c.colo3[..., None] * abso3a,
                     c.colo3[..., None] * abso3b)
    raylc = jnp.asarray(t["sw25_rayl"], dtype)
    taur = c.colmol[..., None] * raylc
    lay = _laysolfr_tropo(c, int(t["sw25_layreffr"]))
    sflux = _sflux_1d(t["sw25_sfluxref"], ncol, dtype)
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 26: pure rayleigh =======================
    ng26 = len(np.asarray(t["sw26_sfluxref"]))
    taug = jnp.zeros((ncol, nlev, ng26), dtype)
    raylc = jnp.asarray(t["sw26_rayl"], dtype)
    taur = c.colmol[..., None] * raylc
    sflux = _sflux_1d(t["sw26_sfluxref"], ncol, dtype)
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 27: o3 ===================================
    absa, absb = t["sw27_absa"], t["sw27_absb"]
    tau_a, tau_b = band_noeta(absa, absb, c.colo3, c.colo3)
    taug = jnp.where(trop, tau_a, tau_b)
    raylc = jnp.asarray(t["sw27_rayl"], dtype)
    taur = c.colmol[..., None] * raylc
    lay = _laysolfr_strat(c, int(t["sw27_layreffr"]))
    sflux = float(t["sw27_scalekur"]) * _sflux_1d(t["sw27_sfluxref"],
                                                  ncol, dtype)
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 28: o3+o2 ================================
    absa, absb = t["sw28_absa"], t["sw28_absb"]
    strrat = float(t["sw28_strrat"])
    tau_a, js_a, fs_a = band_eta_tropo(absa, c.colo3, c.colo2, strrat)
    tau_b, js_b, fs_b = band_eta_strat(absb, c.colo3, c.colo2, strrat)
    taug = jnp.where(trop, tau_a, tau_b)
    taur = (c.colmol * float(t["sw28_rayl"]))[..., None] * jnp.ones(
        (1, 1, absa.shape[1]), dtype)
    lay = _laysolfr_strat(c, int(t["sw28_layreffr"]))
    sflux = _sflux_eta(t["sw28_sfluxref"], _at_layer(js_b, lay),
                       _at_layer(fs_b, lay))
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # ====================== band 29: h2o / co2 + cross-sections ==========
    tauself, taufor = _self_for(c, t["sw29_selfref"], t["sw29_forref"])
    absa, absb = t["sw29_absa"], t["sw29_absb"]
    tau_a, tau_b = band_noeta(absa, absb, c.colh2o, c.colco2)
    absh2o = jnp.asarray(t["sw29_absh2o"], dtype)
    absco2 = jnp.asarray(t["sw29_absco2"], dtype)
    taug = jnp.where(trop,
                     tau_a + tauself + taufor
                     + c.colco2[..., None] * absco2,
                     tau_b + c.colh2o[..., None] * absh2o)
    taur = (c.colmol * float(t["sw29_rayl"]))[..., None] * jnp.ones(
        (1, 1, absa.shape[1]), dtype)
    lay = _laysolfr_strat(c, int(t["sw29_layreffr"]))
    sflux = _sflux_1d(t["sw29_sfluxref"], ncol, dtype)
    taugs.append(taug), taurs.append(taur), sfluxes.append(sflux)

    # Assemble in band order 16..29. The loop above appended in order:
    # 16, 17, 18, 19, 21, 20, 22, 23, 24, 25, 26, 27, 28, 29 — reorder.
    order = [0, 1, 2, 3, 5, 4, 6, 7, 8, 9, 10, 11, 12, 13]
    taug = jnp.concatenate([taugs[i] for i in order], axis=-1)
    taur = jnp.concatenate([taurs[i] for i in order], axis=-1)
    sflux = jnp.concatenate([sfluxes[i] for i in order], axis=-1)
    return taug, taur, sflux
