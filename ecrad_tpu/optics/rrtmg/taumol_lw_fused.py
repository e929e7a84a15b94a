"""Fused all-band LW taumol: one kernel launch for all 16 RRTMG bands.

The per-band Section machinery (taumol_lw.py) launches one Pallas kernel
per band and materializes dozens of per-cell (N,) row/weight arrays in
HBM per band — that XLA-side weight computation plus its HBM traffic is
the binding cost of the whole gas-optics stage (CLAUDE.md). This module
instead computes every row/weight *inside* one kernel from the ~45
setcoef fields, evaluating all 16 bands' k-table interpolation with a
handful of large MXU products.

Key algebraic point (why the fusion works): the (jp, jt) grid one-hot
matrix A is the SAME for every band — band-specific factors (speccomb,
column amounts, tropopause gates) are per-cell scalars, and a per-cell
column scaling commutes with the table matmul:
    T_b^T @ (A * s_b[None, :]) == (T_b^T @ A) * s_b[None, :]
so ALL bands' tropospheric major lookups collapse into two matmuls
(one per temperature family) against a concatenation of every band's
absa table, followed by cheap per-band column scalings; likewise for
the stratospheric tables, the self/foreign continuum, and the minor
gases. Per-band work is reduced to VPU epilogues (eta-axis
contractions, chi-ratio adjustments, empirical corrections).

Semantics mirror ifsrrtm/rrtm_taumol{1..16}.F90 exactly as encoded in
taumol_lw.py; equivalence between the two paths is asserted by
tests/test_taumol_fused.py. The per-g stratospheric correction factors
of bands 4 and 7 (rrtm_taumol4.F90, rrtm_taumol7.F90) are folded into
the stratospheric tables offline (the strat tau of those bands consists
only of table-backed terms, so scaling the tables is exact).

The body is pure jnp (iota compares + dot_general + elementwise), so
the CPU path simply calls it directly; the TPU path wraps it in a
pallas_call over cell tiles with all tables resident in VMEM (~0.8 MB).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .setcoef import Coeffs, chi_rows_at

ONEMINUS = 1.0 - 1.0e-6

# Per-band g counts and offsets into the 140-g output
NG = [10, 12, 16, 14, 16, 8, 12, 8, 12, 6, 8, 8, 4, 2, 2, 2]
G_OFF = np.concatenate([[0], np.cumsum(NG)]).tolist()

ETA_TROPO = [3, 4, 5, 7, 9, 12, 13, 15, 16]     # absa with 9-point eta
NOETA_TROPO = [1, 2, 6, 8, 10, 11, 14]          # absa (65, ng)
ETA_STRAT = [3, 4, 5]                           # absb with 5-point eta
NOETA_STRAT = [1, 2, 7, 8, 9, 10, 11, 14, 16]   # absb (235, ng)

# Foreign continuum gating: these bands apply it in the troposphere only
FOR_GATED = [4, 5, 6, 7, 8, 9, 12, 13, 14, 15, 16]
FOR_UNGATED = [1, 2, 3, 10, 11]

# Empirical per-g strat corrections (taumol_lw.py bands 4 and 7)
STRAT_G_SCALE = {
    4: {g: f for g, f in zip(range(8, 15),
                             (0.92, 0.88, 1.07, 1.1, 0.99, 0.88, 0.943))},
    7: {g: f for g, f in zip(range(6, 12),
                             (0.92, 0.88, 1.07, 1.1, 0.99, 0.855))},
}

F32 = np.float32


def _strat_scaled(t, band):
    """absb (or strat minor) table with the band's per-g factors folded."""
    tab = np.asarray(t[f"lw{band}_absb"], F32).copy()
    for g_1b, f in STRAT_G_SCALE.get(band, {}).items():
        if g_1b <= tab.shape[1]:
            tab[:, g_1b - 1] *= f
    return tab


class LwFusedTables(NamedTuple):
    """Concatenated numpy tables (all oriented for (R_out, R_in) @
    (R_in, tile) products) plus static row-offset metadata.

    *_cat are f32, used by the HIGHEST-precision fallback path; *_fold
    are the same tables pre-split [hi | lo | hi] in bfloat16 for the
    in-kernel single-matmul 3-pass emulation (see _dot_fold). Small
    tables sharing output g-rows are merged along k so the whole
    self/foreign/minor/Planck-fraction family costs a few MXU products
    instead of many k<32 launches that each pad k to 128."""
    tropo_cat: np.ndarray      # (828, 65)
    strat_cat: np.ndarray      # (302, 235)
    sf_cat: np.ndarray         # (140, 32): self | self(b2) | for_ung |
    #                            for_ung(b2) | for_gated
    minor_cat: np.ndarray      # (750, 19): minor (112) over minor_eta
    pf_cat: np.ndarray         # (140, 96): pf_tropo | pf_strat
    tropo_fold: np.ndarray     # (828, 195) bf16
    strat_fold: np.ndarray     # (302, 705) bf16
    sf_fold: np.ndarray        # (140, 96) bf16
    minor_fold: np.ndarray     # (750, 57) bf16
    pf_fold: np.ndarray        # (140, 288) bf16
    const_vecs: np.ndarray     # (4, 140): ccl4, cfc11, cfc12, cfc22
    pf_a_const: np.ndarray     # (140,)
    pf_b_const: np.ndarray     # (140,)
    meta: dict                 # static offsets (python ints only)
    # ECRAD_TAUMOL_ETA_FOLD experiment tables (None unless enabled)
    tropo_joint: np.ndarray = None   # (86, 585): eta bands, joint (e,p)
    tropo_noeta: np.ndarray = None   # (54, 65): noeta bands only


def _fold_table(tab):
    """[hi | lo | hi] bf16 split of an f32 table for _dot_fold."""
    import ml_dtypes
    hi = tab.astype(ml_dtypes.bfloat16)
    lo = (tab - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.concatenate([hi, lo, hi], axis=1)


def _place(vec_by_band, width=140):
    out = np.zeros(width, F32)
    for band, vec in vec_by_band.items():
        o = G_OFF[band - 1]
        out[o:o + len(vec)] = np.asarray(vec, F32)
    return out


_CACHE: Dict[int, LwFusedTables] = {}


def build_lw_fused(t) -> LwFusedTables:
    if id(t) in _CACHE:
        return _CACHE[id(t)]

    meta = {}

    # ---- tropospheric major concat (rows: eta bands as (9*ng) blocks in
    # (eta-major, g-minor) order; noeta bands as (ng) blocks) ------------
    blocks = []
    off = 0
    tropo_off = {}
    for b in range(1, 17):
        tab = np.asarray(t[f"lw{b}_absa"], F32)
        if b in ETA_TROPO:
            blk = tab.reshape(65, 9 * NG[b - 1]).T    # (9ng, 65)
        else:
            blk = tab.T                               # (ng, 65)
        tropo_off[b] = off
        off += blk.shape[0]
        blocks.append(blk)
    tropo_cat = np.concatenate(blocks, axis=0)
    meta["tropo_off"] = tropo_off
    meta["tropo_rows"] = off

    # ETA_FOLD experiment tables: joint (g, e*65+p) layout per eta
    # band + a noeta-only concat with its own offsets
    jblocks, njblocks = [], []
    joff, njoff = {}, {}
    jo = njo = 0
    for b in range(1, 17):
        tab = np.asarray(t[f"lw{b}_absa"], F32)
        ng = NG[b - 1]
        if b in ETA_TROPO:
            # (65, 9, ng) -> (ng, 9, 65) -> (ng, 585)
            blk = tab.reshape(65, 9, ng).transpose(2, 1, 0).reshape(
                ng, 9 * 65)
            joff[b] = jo
            jo += ng
            jblocks.append(blk)
        else:
            njoff[b] = njo
            njo += ng
            njblocks.append(tab.T)
    meta["tropo_joint_off"] = joff
    meta["tropo_noeta_off"] = njoff
    tropo_joint = np.ascontiguousarray(np.concatenate(jblocks, 0))
    tropo_noeta = np.ascontiguousarray(np.concatenate(njblocks, 0))

    # ---- stratospheric major concat ------------------------------------
    blocks = []
    off = 0
    strat_off = {}
    for b in range(1, 17):
        if b in ETA_STRAT:
            tab = _strat_scaled(t, b)
            blk = tab.reshape(235, 5 * NG[b - 1]).T   # (5ng, 235)
        elif b in NOETA_STRAT:
            blk = _strat_scaled(t, b).T               # (ng, 235)
        else:
            continue
        strat_off[b] = off
        off += blk.shape[0]
        blocks.append(blk)
    strat_cat = np.concatenate(blocks, axis=0)
    meta["strat_off"] = strat_off
    meta["strat_rows"] = off

    # ---- self / foreign continuum (placed into 140 g-rows) -------------
    self_t = np.zeros((140, 10), F32)
    for_ung_t = np.zeros((140, 4), F32)
    for_gated_t = np.zeros((140, 4), F32)
    for b in range(1, 17):
        o = G_OFF[b - 1]
        ng = NG[b - 1]
        self_t[o:o + ng, :] = np.asarray(t[f"lw{b}_selfref"], F32).T
        dst = for_ung_t if b in FOR_UNGATED else for_gated_t
        dst[o:o + ng, :] = np.asarray(t[f"lw{b}_forref"], F32).T

    # ---- minor gases, no eta: (instance rows, 19) ----------------------
    # each instance: (band, table, scale computed in the body)
    minor_specs = [
        (1, "lw1_kao_mn2"), (1, "lw1_kbo_mn2"),
        (6, "lw6_kao_mco2"),
        (7, "lw7_kbo_mco2"),
        (8, "lw8_kao_mco2"), (8, "lw8_kbo_mco2"), (8, "lw8_kao_mo3"),
        (8, "lw8_kao_mn2o"), (8, "lw8_kbo_mn2o"),
        (9, "lw9_kbo_mn2o"),
        (11, "lw11_kao_mo2"), (11, "lw11_kbo_mo2"),
        (13, "lw13_kbo_mo3"),
    ]
    blocks = []
    off = 0
    minor_off = []
    for b, name in minor_specs:
        tab = np.asarray(t[name], F32)                # (19, ng)
        if name == "lw7_kbo_mco2":                    # strat g-scale fold
            tab = tab.copy()
            for g_1b, f in STRAT_G_SCALE[7].items():
                if g_1b <= tab.shape[1]:
                    tab[:, g_1b - 1] *= f
        minor_off.append((b, off, tab.shape[1]))
        off += tab.shape[1]
        blocks.append(tab.T)                          # (ng, 19)
    minor_t = np.concatenate(blocks, axis=0)
    meta["minor_off"] = minor_off

    # ---- minor gases with eta: (instance rows = r1*ng, 19) -------------
    # T2[j*ng+g, r2] = tab[j, r2, g]
    minor_eta_specs = [
        (3, "lw3_kao_mn2o", 9), (3, "lw3_kbo_mn2o", 5),
        (5, "lw5_kao_mo3", 9),
        (7, "lw7_kao_mco2", 9),
        (9, "lw9_kao_mn2o", 9),
        (13, "lw13_kao_mco2", 9),
        (15, "lw15_kao_mn2", 9),
    ]
    blocks = []
    off = 0
    minor_eta_off = []
    for b, name, r1 in minor_eta_specs:
        tab = np.asarray(t[name], F32)                # (r1, 19, ng)
        ng = tab.shape[2]
        blocks.append(tab.transpose(0, 2, 1).reshape(r1 * ng, 19))
        minor_eta_off.append((b, off, r1, ng))
        off += r1 * ng
    minor_eta_t = np.concatenate(blocks, axis=0)
    meta["minor_eta_off"] = minor_eta_off

    # ---- Planck fraction eta tables ------------------------------------
    # tropo: block-diagonal over 9 eta bands -> (140, 81); band k's
    # fracrefa (ng, 9) occupies its g-rows and columns [9k, 9k+9)
    pf_tropo_t = np.zeros((140, 9 * len(ETA_TROPO)), F32)
    for k, b in enumerate(ETA_TROPO):
        o = G_OFF[b - 1]
        pf_tropo_t[o:o + NG[b - 1], 9 * k:9 * k + 9] = np.asarray(
            t[f"lw{b}_fracrefa"], F32)
    pf_strat_t = np.zeros((140, 5 * len(ETA_STRAT)), F32)
    for k, b in enumerate(ETA_STRAT):
        o = G_OFF[b - 1]
        pf_strat_t[o:o + NG[b - 1], 5 * k:5 * k + 5] = np.asarray(
            t[f"lw{b}_fracrefb"], F32)

    # ---- constant cross-section vectors & constant Planck fractions ----
    # (140, 4) so in-kernel use is a 2-D column slice, never a 1-D array
    const_vecs = np.stack([
        _place({5: t["lw5_ccl4"]}),
        _place({6: t["lw6_cfc11adj"]}),
        _place({6: t["lw6_cfc12"], 8: t["lw8_cfc12"]}),
        _place({8: t["lw8_cfc22adj"]}),
    ]).T
    pf_a_const = _place({b: t[f"lw{b}_fracrefa"]
                         for b in NOETA_TROPO})
    pf_b_const = _place({
        1: t["lw1_fracrefb"], 2: t["lw2_fracrefb"],
        6: t["lw6_fracrefa"],            # band 6: A used everywhere
        7: t["lw7_fracrefb"], 8: t["lw8_fracrefb"],
        9: t["lw9_fracrefb"], 10: t["lw10_fracrefb"],
        11: t["lw11_fracrefb"], 13: t["lw13_fracrefb"],
        14: t["lw14_fracrefb"], 16: t["lw16_fracrefb"],
    })

    # chi_mls-derived scalar constants used by the body
    chi = np.asarray(t["chi_mls"], np.float64)

    def chi_at(gas_1b, jp_1b):
        return float(chi[gas_1b - 1, jp_1b - 1])

    meta["chi"] = {
        "b3_refm_a": chi_at(1, 3) / chi_at(2, 3),
        "b3_refm_b": chi_at(1, 13) / chi_at(2, 13),
        "b5_refm_a": chi_at(1, 7) / chi_at(2, 7),
        "b7_refm_a": chi_at(1, 3) / chi_at(3, 3),
        "b9_refm_a": chi_at(1, 3) / chi_at(6, 3),
        "b13_refm_a": chi_at(1, 1) / chi_at(4, 1),
        "b15_refm_a": chi_at(4, 1) / chi_at(2, 1),
        "pf3_a": chi_at(1, 9) / chi_at(2, 9),
        "pf3_b": chi_at(1, 13) / chi_at(2, 13),
        "pf4_a": chi_at(1, 11) / chi_at(2, 11),
        "pf4_b": chi_at(3, 13) / chi_at(2, 13),
        "pf5_a": chi_at(1, 5) / chi_at(2, 5),
        "pf5_b": chi_at(3, 43) / chi_at(2, 43),
        "pf7_a": chi_at(1, 3) / chi_at(3, 3),
        "pf9_a": chi_at(1, 9) / chi_at(6, 9),
        "pf12_a": chi_at(1, 10) / chi_at(2, 10),
        "pf13_a": chi_at(1, 5) / chi_at(4, 5),
        "pf15_a": chi_at(4, 1) / chi_at(2, 1),
        "pf16_a": chi_at(1, 6) / chi_at(6, 6),
    }

    # ---- merged small tables (shared output g-rows -> one product) -----
    # sf_cat columns: self | self(band-2 rows only) | for_ung |
    # for_ung(band-2 rows only) | for_gated. The band-2-only copies
    # carry the per-cell corradj2/wa2 corrections as extra weight rows
    # (w * (corr - 1)) so no post-product row scaling is needed.
    o2, n2_ = G_OFF[1], G_OFF[2]
    sf_cat = np.zeros((140, 32), F32)
    sf_cat[:, 0:10] = self_t
    sf_cat[o2:n2_, 10:20] = self_t[o2:n2_]
    sf_cat[:, 20:24] = for_ung_t
    sf_cat[o2:n2_, 24:28] = for_ung_t[o2:n2_]
    sf_cat[:, 28:32] = for_gated_t
    minor_cat = np.concatenate([minor_t, minor_eta_t], axis=0)
    pf_cat = np.concatenate([pf_tropo_t, pf_strat_t], axis=1)

    fd = LwFusedTables(
        tropo_cat=tropo_cat, strat_cat=strat_cat, sf_cat=sf_cat,
        minor_cat=minor_cat, pf_cat=pf_cat,
        tropo_fold=_fold_table(tropo_cat),
        strat_fold=_fold_table(strat_cat),
        sf_fold=_fold_table(sf_cat),
        minor_fold=_fold_table(minor_cat),
        pf_fold=_fold_table(pf_cat),
        const_vecs=const_vecs,
        pf_a_const=pf_a_const[:, None], pf_b_const=pf_b_const[:, None],
        meta=meta,
        tropo_joint=tropo_joint,
        tropo_noeta=tropo_noeta)
    _CACHE[id(t)] = fd
    return fd


# Order of the packed per-cell float fields, (NF, N)
F_FIELDS = [
    "tropf", "fac00", "fac10", "fac01", "fac11",
    "selffac", "selffrac", "forfac", "forfrac",
    "minorfrac", "scaleminor", "scaleminorn2",
    "colh2o", "colco2", "colo3", "coln2o", "colch4", "colo2",
    "colbrd", "coldry",
    "rat_h2oco2", "rat_h2oco2_1", "rat_h2oo3", "rat_h2oo3_1",
    "rat_h2on2o", "rat_h2on2o_1", "rat_h2och4", "rat_h2och4_1",
    "rat_n2oco2", "rat_n2oco2_1", "rat_o3co2", "rat_o3co2_1",
    "pavel", "wx_ccl4", "wx_cfc11", "wx_cfc12", "wx_cfc22",
    "chi_co2", "chi_n2o",
]
I_FIELDS = ["jp", "jt", "jt1", "indself", "indfor", "indminor"]
F_IDX = {n: i for i, n in enumerate(F_FIELDS)}
I_IDX = {n: i for i, n in enumerate(I_FIELDS)}


def pack_coeffs(c: Coeffs, t) -> tuple:
    """Build the packed (NF, N) float / (NI, N) int inputs from Coeffs
    (all fields already flattened to (N,))."""
    chi = jnp.asarray(t["chi_mls"], c.colh2o.dtype)
    chiv = chi_rows_at(chi, c.jp)       # chi_mls at JP+1 per gas
    vals = {
        "tropf": c.tropo.astype(c.colh2o.dtype),
        "fac00": c.fac00, "fac10": c.fac10, "fac01": c.fac01,
        "fac11": c.fac11,
        "selffac": c.selffac, "selffrac": c.selffrac,
        "forfac": c.forfac, "forfrac": c.forfrac,
        "minorfrac": c.minorfrac, "scaleminor": c.scaleminor,
        "scaleminorn2": c.scaleminorn2,
        "colh2o": c.colh2o, "colco2": c.colco2, "colo3": c.colo3,
        "coln2o": c.coln2o, "colch4": c.colch4, "colo2": c.colo2,
        "colbrd": c.colbrd, "coldry": c.coldry,
        "rat_h2oco2": c.rat_h2oco2, "rat_h2oco2_1": c.rat_h2oco2_1,
        "rat_h2oo3": c.rat_h2oo3, "rat_h2oo3_1": c.rat_h2oo3_1,
        "rat_h2on2o": c.rat_h2on2o, "rat_h2on2o_1": c.rat_h2on2o_1,
        "rat_h2och4": c.rat_h2och4, "rat_h2och4_1": c.rat_h2och4_1,
        "rat_n2oco2": c.rat_n2oco2, "rat_n2oco2_1": c.rat_n2oco2_1,
        "rat_o3co2": c.rat_o3co2, "rat_o3co2_1": c.rat_o3co2_1,
        "pavel": c.pavel, "wx_ccl4": c.wx_ccl4,
        "wx_cfc11": c.wx_cfc11, "wx_cfc12": c.wx_cfc12,
        "wx_cfc22": c.wx_cfc22,
        "chi_co2": chiv[1], "chi_n2o": chiv[3],
    }
    fc = jnp.stack([vals[n].astype(jnp.float32) for n in F_FIELDS])
    ic = jnp.stack([getattr(c, n).astype(jnp.int32) for n in I_FIELDS])
    return fc, ic


import os

_PREC_NAME = os.environ.get("ECRAD_TAUMOL_PRECISION", "3pass")
# Round-5 verdict experiment: fold the tropospheric 3-point eta
# contraction into per-band joint class-matmul weights
# W[(e,p), cell] = Bw[e, cell] * A[p, cell] (the outer-product algebra
# of rrtm_taumol3.F90:141-198) instead of the shared-matmul + VPU
# epilogue. Measured on TPU v5e (see CLAUDE.md losses): the joint
# one-hot build costs more VPU work than the epilogue it removes and
# the MXU MACs are unchanged (table size is invariant), so this is
# OFF by default and kept for the measurement record.
_ETA_FOLD = os.environ.get("ECRAD_TAUMOL_ETA_FOLD", "0") == "1"


def _dot_p(a, b, precision):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)


def _dot_fold(tab_fold, b):
    """Exact bf16x2 3-pass product as ONE MXU matmul.

    The f32 table is pre-split offline as [hi | lo | hi] bfloat16
    (_fold_table) and the per-cell operand stacked [b_hi; b_hi; b_lo],
    so  a_hi@b_hi + a_lo@b_hi + a_hi@b_lo  accumulates in a single f32
    MXU chain. Measured vs the 3 separate VPU-summed passes of round
    2: ~1.4x faster (the MXU pads k to 128, so the tripled k of the
    small continuum/minor/Planck-fraction tables rides the padding for
    free) AND more accurate (1.8e-6 rel vs HIGHEST on random tables —
    one f32 accumulation chain instead of three rounded partials)."""
    k = tab_fold.shape[1] // 3
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(b.dtype)).astype(jnp.bfloat16)
    bc = jnp.concatenate([b_hi, b_hi, b_lo], axis=0)
    return jax.lax.dot_general(
        tab_fold, bc, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


def _make_dot(tabs, in_pallas):
    """Returns dot(name, w): the class matmul against table `name`.

    in_pallas (the Mosaic kernel bodies, default "3pass"): _dot_fold
    against the pre-folded bf16 tables — ~16 mantissa bits (measured
    3.7e-4 max / 5e-5 p99.9 rel on tau vs HIGHEST; end-to-end flux
    error vs the reference golden unchanged).

    Fallback (plain XLA): native HIGHEST f32 against the f32 tables —
    the bf16x2 emulation is only faithful under Mosaic; XLA's
    algebraic simplifier merges split dots back into bf16-quality
    products (measured 2.7e-2 rel).
    ECRAD_TAUMOL_PRECISION=highest|default overrides the kernel path
    (both run against the f32 tables)."""
    if in_pallas and _PREC_NAME == "3pass":
        return lambda name, w: _dot_fold(tabs[name + "_fold"], w)
    if in_pallas and _PREC_NAME == "default":
        return lambda name, w: _dot_p(tabs[name + "_cat"], w,
                                      jax.lax.Precision.DEFAULT)
    return lambda name, w: _dot_p(tabs[name + "_cat"], w,
                                  jax.lax.Precision.HIGHEST)


def _eta_index(specparm, mult):
    specparm = jnp.minimum(specparm, ONEMINUS)
    specmult = mult * specparm
    js = jnp.floor(specmult).astype(jnp.int32)
    fs = specmult - js.astype(specmult.dtype)
    return specparm, js, fs


def _eta_weights3(specparm, fs):
    """3-point eta weights at offsets (-1, 0, 1, 2)."""
    p_lo = fs - 1.0
    p4_lo = p_lo ** 4
    fk0_lo, fk1_lo, fk2_lo = p4_lo, 1.0 - p_lo - 2.0 * p4_lo, p_lo + p4_lo
    p_hi = -fs
    p4_hi = p_hi ** 4
    fk0_hi, fk1_hi, fk2_hi = p4_hi, 1.0 - p_hi - 2.0 * p4_hi, p_hi + p4_hi
    lo = specparm < 0.125
    hi = specparm > 0.875
    zero = jnp.zeros_like(fs)
    wm1 = jnp.where(hi, fk2_hi, zero)
    w0 = jnp.where(lo, fk0_lo, jnp.where(hi, fk1_hi, 1.0 - fs))
    w1 = jnp.where(lo, fk1_lo, jnp.where(hi, fk0_hi, fs))
    w2 = jnp.where(lo, fk2_lo, zero)
    return (wm1, w0, w1, w2)


def _chi_adjust(col, coldry, ref, thresh, base, expo):
    chi = col / coldry
    rat = 1.0e20 * chi / ref
    # x**expo as exp(expo*log x): Mosaic-safe (x > 0 by the max below)
    base_p = jnp.maximum(rat - base, 1e-30)
    adjfac = base + jnp.exp(expo * jnp.log(base_p))
    adjcol = adjfac * ref * coldry * 1.0e-20
    return jnp.where(rat > thresh, adjcol, col)


def _onehot_rows(nrows, idx_terms, tile):
    """sum_k onehot(idx_k) * w_k as an (nrows, tile) matrix.

    idx_terms: list of (idx (1, tile) int32, w (1, tile) f32)."""
    iot = jax.lax.broadcasted_iota(jnp.int32, (nrows, tile), 0)
    acc = jnp.zeros((nrows, tile), jnp.float32)
    for idx, w in idx_terms:
        acc = acc + jnp.where(iot == idx, w, 0.0)
    return acc


def lw_fused_body(fc, ic, tabs, meta, in_pallas=False):
    """Compute (tau, pfrac), each (140, tile), from packed coeff tiles.

    fc: (NF, tile) f32; ic: (NI, tile) int32; tabs: dict name->jnp
    array (the LwFusedTables fields); meta: static metadata dict.
    Pure jnp — runs identically inside a Pallas kernel or under plain
    XLA (the CPU path / equivalence tests); in_pallas selects the
    matmul precision strategy (see _dot).
    """
    dot = _make_dot(tabs, in_pallas)
    tile = fc.shape[1]

    def f(name):
        i = F_IDX[name]
        return fc[i:i + 1, :]            # (1, tile)

    def ii(name):
        i = I_IDX[name]
        return ic[i:i + 1, :]

    tropf = f("tropf")
    stratf = 1.0 - tropf
    jp, jt, jt1 = ii("jp"), ii("jt"), ii("jt1")
    f00, f10, f01, f11 = f("fac00"), f("fac10"), f("fac01"), f("fac11")

    # ---- shared one-hot matrices ---------------------------------------
    grid0 = (jp - 1) * 5 + (jt - 1)          # [0, 65)
    grid1 = jp * 5 + (jt1 - 1)
    A_t0 = _onehot_rows(65, [(grid0, f00), (grid0 + 1, f10)], tile)
    A_t1 = _onehot_rows(65, [(grid1, f01), (grid1 + 1, f11)], tile)
    grid0b = (jp - 13) * 5 + (jt - 1)        # [0, 235) in stratosphere
    grid1b = (jp - 12) * 5 + (jt1 - 1)
    A_s0 = _onehot_rows(235, [(grid0b, f00), (grid0b + 1, f10)], tile)
    A_s1 = _onehot_rows(235, [(grid1b, f01), (grid1b + 1, f11)], tile)

    indself, indfor, indminor = ii("indself"), ii("indfor"), ii("indminor")
    sf = tropf * f("selffac")
    sfrac = f("selffrac")
    W_self = _onehot_rows(10, [(indself - 1, sf * (1.0 - sfrac)),
                               (indself, sf * sfrac)], tile)
    ff, ffrac = f("forfac"), f("forfrac")
    W_for = _onehot_rows(4, [(indfor - 1, ff * (1.0 - ffrac)),
                             (indfor, ff * ffrac)], tile)
    mfrac = f("minorfrac")
    W_minor = _onehot_rows(19, [(indminor - 1, 1.0 - mfrac),
                                (indminor, mfrac)], tile)

    pavel = f("pavel")
    corradj1 = jnp.where(tropf > 0.0,
                         jnp.where(pavel < 250.0,
                                   1.0 - 0.15 * (250.0 - pavel) / 154.4,
                                   1.0),
                         1.0 - 0.15 * (pavel / 95.6))
    corradj2 = 1.0 - 0.05 * (pavel - 100.0) / 900.0
    wa2 = jnp.where(tropf > 0.0, corradj2, 1.0)

    # ---- the class matmuls ---------------------------------------------
    if _ETA_FOLD:
        # eta bands take per-band joint matmuls below; the shared
        # product only covers the 54 noeta rows
        M_t0 = _dot_p(tabs["tropo_noeta"], A_t0,
                      jax.lax.Precision.HIGHEST)
        M_t1 = _dot_p(tabs["tropo_noeta"], A_t1,
                      jax.lax.Precision.HIGHEST)
    else:
        M_t0 = dot("tropo", A_t0)           # (828, tile)
        M_t1 = dot("tropo", A_t1)
    M_s0 = dot("strat", A_s0)               # (302, tile)
    M_s1 = dot("strat", A_s1)
    # self + foreign continuum in one product; the band-2 corradj2/wa2
    # row corrections ride as extra weight rows against the band-2-only
    # table copies (see build_lw_fused)
    W_sf = jnp.concatenate([
        W_self, W_self * (corradj2 - 1.0),
        W_for, W_for * (wa2 - 1.0), W_for * tropf], axis=0)
    sf_c = dot("sf", W_sf)                  # (140, tile)
    M_all = dot("minor", W_minor)           # (750, tile)
    M_minor = M_all[:112]
    M_meta = M_all[112:]

    # ---- per-cell columns & adjustments --------------------------------
    colh2o, colco2, colo3 = f("colh2o"), f("colco2"), f("colo3")
    coln2o, colch4, colo2 = f("coln2o"), f("colch4"), f("colo2")
    colbrd, coldry = f("colbrd"), f("coldry")
    chi_co2, chi_n2o = f("chi_co2"), f("chi_n2o")
    ch = meta["chi"]

    adjcoln2o = _chi_adjust(coln2o, coldry, chi_n2o, 1.5, 0.5, 0.65)
    adjco2_b6 = _chi_adjust(colco2, coldry, chi_co2, 3.0, 2.0, 0.77)
    adjco2_b7a = _chi_adjust(colco2, coldry, chi_co2, 3.0, 3.0, 0.79)
    adjco2_b7b = _chi_adjust(colco2, coldry, chi_co2, 3.0, 2.0, 0.79)
    adjco2_b8 = _chi_adjust(colco2, coldry, chi_co2, 3.0, 2.0, 0.65)
    adjco2_b13 = _chi_adjust(colco2, coldry, 3.55e-4, 3.0, 2.0, 0.68)
    adjn2o_b9 = adjcoln2o
    scalen2 = colbrd * f("scaleminorn2")
    scaleo2 = colo2 * f("scaleminor")
    scalen2_15 = colbrd * f("scaleminor")

    # tropo major column amounts / speccombs per band ---------------------
    # (col1, col2, rat0_name, rat1_name) for eta bands
    eta_cols = {
        3: (colh2o, colco2, "rat_h2oco2", "rat_h2oco2_1"),
        4: (colh2o, colco2, "rat_h2oco2", "rat_h2oco2_1"),
        5: (colh2o, colco2, "rat_h2oco2", "rat_h2oco2_1"),
        7: (colh2o, colo3, "rat_h2oo3", "rat_h2oo3_1"),
        9: (colh2o, colch4, "rat_h2och4", "rat_h2och4_1"),
        12: (colh2o, colco2, "rat_h2oco2", "rat_h2oco2_1"),
        13: (colh2o, coln2o, "rat_h2on2o", "rat_h2on2o_1"),
        15: (coln2o, colco2, "rat_n2oco2", "rat_n2oco2_1"),
        16: (colh2o, colch4, "rat_h2och4", "rat_h2och4_1"),
    }
    noeta_w = {1: colh2o, 2: colh2o * corradj2, 6: colh2o, 8: colh2o,
               10: colh2o, 11: colh2o, 14: colco2}
    strat_eta_cols = {
        3: (colh2o, colco2, "rat_h2oco2", "rat_h2oco2_1"),
        4: (colo3, colco2, "rat_o3co2", "rat_o3co2_1"),
        5: (colo3, colco2, "rat_o3co2", "rat_o3co2_1"),
    }
    strat_noeta_w = {1: colh2o, 2: colh2o, 7: colo3, 8: colo3, 9: colch4,
                     10: colh2o, 11: colh2o, 14: colco2, 16: colch4}

    # ---- assemble tau per band -----------------------------------------
    pieces = []
    js_cache = {}       # per eta band: (js0 one-hot weights reused later)
    for b in range(1, 17):
        ng = NG[b - 1]
        off_t = meta["tropo_off"][b]
        if b in ETA_TROPO:
            col1, col2, r0n, r1n = eta_cols[b]
            rat0, rat1 = f(r0n), f(r1n)
            sc0 = col1 + rat0 * col2
            sp0, js0, fs0 = _eta_index(col1 / sc0, 8.0)
            sc1 = col1 + rat1 * col2
            sp1, js1, fs1 = _eta_index(col1 / sc1, 8.0)
            w0s = _eta_weights3(sp0, fs0)
            w1s = _eta_weights3(sp1, fs1)
            contrib = jnp.zeros((ng, tile), jnp.float32)
            if _ETA_FOLD:
                # joint-weight form: one matmul per band-family with
                # k = 9*65, weights the outer product Bw (x) A
                off_j = meta["tropo_joint_off"][b]
                tj = tabs["tropo_joint"][off_j:off_j + ng]
                for (jsx, ws, A, sc) in ((js0, w0s, A_t0, tropf * sc0),
                                         (js1, w1s, A_t1,
                                          tropf * sc1)):
                    Bw = _onehot_rows(
                        9, [(jsx + dj, ws[k])
                            for k, dj in enumerate((-1, 0, 1, 2))],
                        tile)
                    Wj = (Bw[:, None, :] * A[None, :, :]).reshape(
                        9 * 65, tile)
                    fam = _dot_p(tj, Wj, jax.lax.Precision.HIGHEST)
                    contrib = contrib + sc * fam
            else:
                for (jsx, ws, M, sc) in ((js0, w0s, M_t0, tropf * sc0),
                                         (js1, w1s, M_t1,
                                          tropf * sc1)):
                    # B (9, tile): 3-point eta weights at js-1..js+2
                    Bw = _onehot_rows(
                        9, [(jsx + dj, ws[k])
                            for k, dj in enumerate((-1, 0, 1, 2))],
                        tile)
                    # one reduce over the eta axis instead of 9
                    # (ng, tile) multiply-adds: the per-band VPU op
                    # count is what bounds this kernel
                    fam = (M[off_t:off_t + 9 * ng].reshape(9, ng, tile)
                           * Bw[:, None, :]).sum(axis=0)
                    contrib = contrib + sc * fam
        else:
            w = tropf * noeta_w[b]
            if _ETA_FOLD:
                off_n = meta["tropo_noeta_off"][b]
                contrib = w * (M_t0[off_n:off_n + ng]
                               + M_t1[off_n:off_n + ng])
            else:
                contrib = w * (M_t0[off_t:off_t + ng]
                               + M_t1[off_t:off_t + ng])
        # strat major
        if b in ETA_STRAT:
            off_s = meta["strat_off"][b]
            col1, col2, r0n, r1n = strat_eta_cols[b]
            rat0, rat1 = f(r0n), f(r1n)
            sc0 = col1 + rat0 * col2
            _, jsb0, fsb0 = _eta_index(col1 / sc0, 4.0)
            sc1 = col1 + rat1 * col2
            _, jsb1, fsb1 = _eta_index(col1 / sc1, 4.0)
            for (jsx, fsx, M, sc) in (
                    (jsb0, fsb0, M_s0, stratf * sc0),
                    (jsb1, fsb1, M_s1, stratf * sc1)):
                Bw = _onehot_rows(5, [(jsx, 1.0 - fsx),
                                      (jsx + 1, fsx)], tile)
                fam = (M[off_s:off_s + 5 * ng].reshape(5, ng, tile)
                       * Bw[:, None, :]).sum(axis=0)
                contrib = contrib + sc * fam
        elif b in NOETA_STRAT:
            off_s = meta["strat_off"][b]
            w = stratf * strat_noeta_w[b]
            contrib = contrib + w * (M_s0[off_s:off_s + ng]
                                     + M_s1[off_s:off_s + ng])
        pieces.append(contrib)

    # minor gases (no eta): accumulate into the band pieces BEFORE the
    # concat — full-height zero-padded adds cost 20 (140, tile) passes
    minor_scale_list = [
        tropf * scalen2, stratf * scalen2,           # b1 kao/kbo mn2
        tropf * adjco2_b6,                           # b6 kao
        stratf * adjco2_b7b,                         # b7 kbo
        tropf * adjco2_b8, stratf * adjco2_b8,       # b8 co2
        tropf * colo3,                               # b8 kao o3
        tropf * coln2o, stratf * coln2o,             # b8 n2o
        stratf * adjn2o_b9,                          # b9 kbo
        tropf * scaleo2, stratf * scaleo2,           # b11 o2
        stratf * colo3,                              # b13 kbo o3
    ]
    for (b, off, ngm), scale in zip(meta["minor_off"],
                                    minor_scale_list):
        pieces[b - 1] = pieces[b - 1] + scale * M_minor[off:off + ngm]

    # minor gases with eta: contract the r1 (eta) axis per instance
    minor_eta_args = {
        (3, 0): (colh2o, ch["b3_refm_a"], colco2, 8.0, tropf * adjcoln2o),
        (3, 1): (colh2o, ch["b3_refm_b"], colco2, 4.0, stratf * adjcoln2o),
        (5, 0): (colh2o, ch["b5_refm_a"], colco2, 8.0, tropf * colo3),
        (7, 0): (colh2o, ch["b7_refm_a"], colo3, 8.0, tropf * adjco2_b7a),
        (9, 0): (colh2o, ch["b9_refm_a"], colch4, 8.0, tropf * adjn2o_b9),
        (13, 0): (colh2o, ch["b13_refm_a"], coln2o, 8.0,
                  tropf * adjco2_b13),
        (15, 0): (coln2o, ch["b15_refm_a"], colco2, 8.0,
                  tropf * scalen2_15),
    }
    seen = {}
    for (b, off, r1, ngm) in meta["minor_eta_off"]:
        k = (b, seen.get(b, 0))
        seen[b] = seen.get(b, 0) + 1
        col1, refm, col2, mult, scale = minor_eta_args[k]
        _, jm, fm = _eta_index(col1 / (col1 + refm * col2), mult)
        Bw = _onehot_rows(r1, [(jm, scale * (1.0 - fm)),
                               (jm + 1, scale * fm)], tile)
        block = (M_meta[off:off + r1 * ngm].reshape(r1, ngm, tile)
                 * Bw[:, None, :]).sum(axis=0)
        pieces[b - 1] = pieces[b - 1] + block

    tau = jnp.concatenate(pieces, axis=0)          # (140, tile)

    # self + foreign continuum (band-2 corrections already inside the
    # merged sf product's extra weight rows)
    tau = tau + sf_c

    # constant cross-sections: ccl4, cfc11, cfc12, cfc22 ((140, 4) cols)
    cv = tabs["const_vecs"]
    tau = tau + (cv[:, 0:1] * f("wx_ccl4")
                 + cv[:, 1:2] * f("wx_cfc11")
                 + cv[:, 2:3] * f("wx_cfc12")
                 + cv[:, 3:4] * f("wx_cfc22"))

    # band-1 pressure correction on its rows
    o1 = G_OFF[0]
    n1 = G_OFF[1]
    corr = jnp.concatenate([
        jnp.broadcast_to(corradj1, (n1 - o1, tile)),
        jnp.broadcast_to(1.0, (140 - n1, tile))], axis=0)
    tau = tau * corr

    # ---- Planck fractions ----------------------------------------------
    pfrac = (tabs["pf_a_const"] * tropf + tabs["pf_b_const"] * stratf)
    pf_tropo_args = {
        3: (colh2o, ch["pf3_a"], colco2),
        4: (colh2o, ch["pf4_a"], colco2),
        5: (colh2o, ch["pf5_a"], colco2),
        7: (colh2o, ch["pf7_a"], colo3),
        9: (colh2o, ch["pf9_a"], colch4),
        12: (colh2o, ch["pf12_a"], colco2),
        13: (colh2o, ch["pf13_a"], coln2o),
        15: (coln2o, ch["pf15_a"], colco2),
        16: (colh2o, ch["pf16_a"], colch4),
    }
    wp_blocks = []
    for b in ETA_TROPO:
        col1, refm, col2 = pf_tropo_args[b]
        _, jpl, fpl = _eta_index(col1 / (col1 + refm * col2), 8.0)
        wp_blocks.append(_onehot_rows(
            9, [(jpl, tropf * (1.0 - fpl)), (jpl + 1, tropf * fpl)],
            tile))
    W_pf = jnp.concatenate(wp_blocks, axis=0)      # (81, tile)

    pf_strat_args = {
        3: (colh2o, ch["pf3_b"], colco2),
        4: (colo3, ch["pf4_b"], colco2),
        5: (colo3, ch["pf5_b"], colco2),
    }
    wps_blocks = []
    for b in ETA_STRAT:
        col1, refm, col2 = pf_strat_args[b]
        _, jplb, fplb = _eta_index(col1 / (col1 + refm * col2), 4.0)
        wps_blocks.append(_onehot_rows(
            5, [(jplb, stratf * (1.0 - fplb)), (jplb + 1, stratf * fplb)],
            tile))
    W_pfs = jnp.concatenate(wps_blocks, axis=0)    # (15, tile)
    pfrac = pfrac + dot("pf", jnp.concatenate([W_pf, W_pfs], axis=0))

    return tau, pfrac


_CONST_FIELDS = ["const_vecs", "pf_a_const", "pf_b_const"]
_MATMUL_NAMES = ["tropo", "strat", "sf", "minor", "pf"]


def _kernel_tab_fields(matmul_names, const_fields):
    """Tables the Pallas kernel ships to VMEM: only the form the active
    precision mode reads (folded bf16 for "3pass", f32 otherwise)."""
    suffix = "_fold" if _PREC_NAME == "3pass" else "_cat"
    return [n + suffix for n in matmul_names] + const_fields


# the default ("3pass") kernel VMEM set, also used by tools/roofline.py
TAB_FIELDS = _kernel_tab_fields(_MATMUL_NAMES, _CONST_FIELDS)
if _ETA_FOLD:
    TAB_FIELDS = TAB_FIELDS + ["tropo_joint", "tropo_noeta"]


def _taumol_lw_fused_flat(fc, ic, fd: LwFusedTables, use_pallas: bool,
                          tile: int = 0, cell_major: bool = False):
    """(tau, pfrac) from packed (NF, N)/(NI, N) inputs.

    cell_major=False: each output is (140, N) (g-major, historic form).
    cell_major=True: each output is (N, 140) — the kernel transposes the
    (140, tile) result in VMEM so no (ncol*nlev, 140) relayout is ever
    materialized in HBM afterwards (measured ~2.6 ms per array at 280k
    cells otherwise)."""
    if not tile:
        import os
        tile = int(os.environ.get('ECRAD_TAUMOL_TILE', '512'))
    n = fc.shape[1]
    if not use_pallas:
        tabs = {k: jnp.asarray(getattr(fd, k))
                for k in fd._fields
                if k != "meta" and getattr(fd, k) is not None}
        tau, pfrac = lw_fused_body(fc, ic, tabs, fd.meta)
        return (tau.T, pfrac.T) if cell_major else (tau, pfrac)
    tabs_np = {k: getattr(fd, k) for k in TAB_FIELDS}

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = -(-n // tile) * tile
    if n_pad != n:
        fc = jnp.pad(fc, ((0, 0), (0, n_pad - n)))
        ic = jnp.pad(ic, ((0, 0), (0, n_pad - n)))

    tab_vals = [jnp.asarray(tabs_np[k]) for k in TAB_FIELDS]
    meta = fd.meta

    def kernel(fc_ref, ic_ref, *refs):
        tab_refs = refs[:len(TAB_FIELDS)]
        tau_ref, pf_ref = refs[len(TAB_FIELDS):]
        tabs = {k: r[:] for k, r in zip(TAB_FIELDS, tab_refs)}
        tau, pfrac = lw_fused_body(fc_ref[:], ic_ref[:], tabs, meta,
                                   in_pallas=True)
        if cell_major:
            tau_ref[:] = tau.T
            pf_ref[:] = pfrac.T
        else:
            tau_ref[:] = tau
            pf_ref[:] = pfrac

    nf, ni = fc.shape[0], ic.shape[0]
    in_specs = [
        pl.BlockSpec((nf, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ni, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    for v in tab_vals:
        in_specs.append(pl.BlockSpec(
            v.shape, (lambda i: (0, 0)) if v.ndim == 2 else
            (lambda i: (0,)), memory_space=pltpu.VMEM))
    if cell_major:
        out_spec = pl.BlockSpec((tile, 140), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, 140), jnp.float32)
    else:
        out_spec = pl.BlockSpec((140, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((140, n_pad), jnp.float32)
    tau, pfrac = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
    )(fc, ic, *tab_vals)
    if cell_major:
        return tau[:n], pfrac[:n]
    return tau[:, :n], pfrac[:, :n]


def taumol_lw_fused(c2: Coeffs, t: dict, use_pallas: bool,
                    toa_first: bool = False):
    """Drop-in for taumol_lw: returns (tau, pfrac) as (ncol, nlev, 140).

    toa_first=False: levels surface-first (the reference's RRTM order).
    toa_first=True: the per-cell coeff fields are flipped along the
    level axis BEFORE flattening (45 small (ncol, nlev) flips instead of
    two (ncol, nlev, 140) flips downstream) and the kernel emits
    cell-major output, so the result reshapes to TOA-first
    (ncol, nlev, 140) with no transpose."""
    ncol, nlev = c2.tropo.shape
    if toa_first:
        c2 = Coeffs(*[x[:, ::-1] for x in c2])
    c = Coeffs(*[x.reshape(-1) for x in c2])
    fd = build_lw_fused(t)
    fc, ic = pack_coeffs(c, t)
    tau, pfrac = _taumol_lw_fused_flat(fc, ic, fd, use_pallas,
                                       cell_major=toa_first)
    if toa_first:
        return (tau.reshape(ncol, nlev, 140),
                pfrac.reshape(ncol, nlev, 140))
    tau = tau.reshape(140, ncol, nlev).transpose(1, 2, 0)
    pfrac = pfrac.reshape(140, ncol, nlev).transpose(1, 2, 0)
    return tau, pfrac
