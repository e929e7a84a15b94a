"""Fused all-band SW taumol: one kernel launch for all 14 RRTMG bands.

Same design as taumol_lw_fused.py (see its module docstring for the
algebra): per-cell rows/weights computed in VMEM, all bands' k-table
interpolation as a handful of large MXU products against concatenated
tables, per-band work reduced to per-cell column scalings.

The shortwave is simpler than the longwave: its eta interpolation is
2-point with the SAME eta index for both temperature families
(srtm_taumol*.F90 via taumol_sw.py), so the two family one-hots can be
summed BEFORE the table matmul — one tropospheric and one stratospheric
product cover all major-species lookups. Rayleigh optical depth is a
rank-1 outer product (per-g coefficient x colmol) except band 24's
eta-interpolated troposphere, handled with one extra small matmul.

The solar-source (SFLUXZEN / LAYSOLFR) logic stays XLA-side in
taumol_sw_fused() — it is a per-column cross-level selection, tiny
compared to the per-cell work.

Equivalence with the per-band Section path is asserted by
tests/test_taumol_fused.py.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .setcoef import Coeffs
from .taumol_lw_fused import (_eta_index, _fold_table, _make_dot,
                              _onehot_rows)

F32 = np.float32

SW_BANDS = list(range(16, 30))
NG_SW = {16: 6, 17: 12, 18: 8, 19: 8, 20: 10, 21: 10, 22: 2, 23: 10,
         24: 8, 25: 6, 26: 6, 27: 8, 28: 6, 29: 12}
G_OFF_SW = {}
_off = 0
for _b in SW_BANDS:
    G_OFF_SW[_b] = _off
    _off += NG_SW[_b]

ETA_TROPO = [16, 17, 18, 19, 21, 22, 24, 28]
NOETA_TROPO = [20, 23, 25, 27, 29]
ETA_STRAT = [17, 21, 28]
NOETA_STRAT = [16, 18, 19, 20, 22, 24, 27, 29]
# bands whose foreign continuum is NOT gated to the troposphere
FOR_UNGATED = [17, 20, 21]
FOR_GATED = [16, 18, 19, 22, 23, 24, 29]
HAS_SELF = FOR_UNGATED + FOR_GATED

O2ADJ = 1.6


class SwFusedTables(NamedTuple):
    """*_cat f32 for the HIGHEST fallback; *_fold pre-split [hi|lo|hi]
    bf16 for the in-kernel single-matmul 3-pass (see taumol_lw_fused
    _dot_fold/_make_dot)."""
    tropo_cat: np.ndarray      # (rows, 65)
    strat_cat: np.ndarray      # (rows, 235)
    sf_cat: np.ndarray         # (112, 18): self | for_ung | for_gated
    rayl24_cat: np.ndarray     # (112, 9): band-24 tropo rayleigh placed
    tropo_fold: np.ndarray     # (rows, 195) bf16
    strat_fold: np.ndarray     # (rows, 705) bf16
    sf_fold: np.ndarray        # (112, 54) bf16
    rayl24_fold: np.ndarray    # (112, 27) bf16
    const_vecs: np.ndarray     # (112, n_const)
    rayl_vec: np.ndarray       # (112, 1): per-g coeff, 0 for band 24
    rayl24_b: np.ndarray       # (112, 1) band-24 raylb placed
    meta: dict


_CACHE: Dict[int, SwFusedTables] = {}

# constant cross-section instances: (band, table key or None=ones,
# scale name computed in the body)
CONST_SPECS = [
    (20, "sw20_absch4", "colch4"),
    (22, None, "o2cont"),
    (24, "sw24_abso3a", "t_colo3"), (24, "sw24_abso3b", "s_colo3"),
    (25, "sw25_abso3a", "t_colo3"), (25, "sw25_abso3b", "s_colo3"),
    (29, "sw29_absco2", "t_colco2"), (29, "sw29_absh2o", "s_colh2o"),
]


def build_sw_fused(t) -> SwFusedTables:
    if id(t) in _CACHE:
        return _CACHE[id(t)]
    meta = {}

    blocks, off, tropo_off = [], 0, {}
    for b in SW_BANDS:
        key = f"sw{b}_absa"
        if key not in t and not hasattr(t, "files"):
            pass
        if b == 26:
            continue
        tab = np.asarray(t[key], F32)
        if b in ETA_TROPO:
            blk = tab.reshape(65, 9 * NG_SW[b]).T
        else:
            blk = tab.T
        tropo_off[b] = off
        off += blk.shape[0]
        blocks.append(blk)
    tropo_cat = np.concatenate(blocks, axis=0)
    meta["tropo_off"] = tropo_off

    blocks, off, strat_off = [], 0, {}
    for b in SW_BANDS:
        if b in ETA_STRAT:
            blk = np.asarray(t[f"sw{b}_absb"], F32).reshape(
                235, 5 * NG_SW[b]).T
        elif b in NOETA_STRAT:
            blk = np.asarray(t[f"sw{b}_absb"], F32).T
        else:
            continue
        strat_off[b] = off
        off += blk.shape[0]
        blocks.append(blk)
    strat_cat = np.concatenate(blocks, axis=0)
    meta["strat_off"] = strat_off

    self_t = np.zeros((112, 10), F32)
    for_ung_t = np.zeros((112, 4), F32)
    for_gated_t = np.zeros((112, 4), F32)
    for b in HAS_SELF:
        o, ng = G_OFF_SW[b], NG_SW[b]
        if b != 25:
            self_t[o:o + ng, :] = np.asarray(t[f"sw{b}_selfref"], F32).T
        fr = np.asarray(t[f"sw{b}_forref"], F32)   # (3 or 4, ng)
        dst = for_ung_t if b in FOR_UNGATED else for_gated_t
        dst[o:o + ng, :fr.shape[0]] = fr.T

    cols = []
    for b, key, _ in CONST_SPECS:
        vec = np.zeros(112, F32)
        o, ng = G_OFF_SW[b], NG_SW[b]
        vec[o:o + ng] = (np.ones(ng, F32) if key is None
                         else np.asarray(t[key], F32))
        cols.append(vec)
    const_vecs = np.stack(cols, axis=1)           # (112, n_const)

    rayl_vec = np.zeros(112, F32)
    for b in SW_BANDS:
        if b == 24:
            continue
        o, ng = G_OFF_SW[b], NG_SW[b]
        r = np.asarray(t[f"sw{b}_rayl"], F32)
        rayl_vec[o:o + ng] = r if r.ndim else np.full(ng, float(r), F32)
    rayl24_cat = np.zeros((112, 9), F32)
    o = G_OFF_SW[24]
    rayl24_cat[o:o + 8, :] = np.asarray(t["sw24_rayla"], F32)
    rayl24_b = np.zeros(112, F32)
    rayl24_b[o:o + 8] = np.asarray(t["sw24_raylb"], F32)

    meta["strrat"] = {
        16: float(t["sw16_strrat1"]), 17: float(t["sw17_strrat"]),
        18: float(t["sw18_strrat"]), 19: float(t["sw19_strrat"]),
        21: float(t["sw21_strrat"]), 22: float(t["sw22_strrat"]),
        24: float(t["sw24_strrat"]), 28: float(t["sw28_strrat"]),
    }
    meta["givfac23"] = float(t["sw23_givfac"])

    sf_cat = np.concatenate([self_t, for_ung_t, for_gated_t], axis=1)
    fd = SwFusedTables(
        tropo_cat=tropo_cat, strat_cat=strat_cat, sf_cat=sf_cat,
        rayl24_cat=rayl24_cat,
        tropo_fold=_fold_table(tropo_cat),
        strat_fold=_fold_table(strat_cat),
        sf_fold=_fold_table(sf_cat),
        rayl24_fold=_fold_table(rayl24_cat),
        const_vecs=const_vecs, rayl_vec=rayl_vec[:, None],
        rayl24_b=rayl24_b[:, None], meta=meta)
    _CACHE[id(t)] = fd
    return fd


F_FIELDS_SW = [
    "tropf", "fac00", "fac10", "fac01", "fac11",
    "selffac", "selffrac", "forfac", "forfrac",
    "colh2o", "colco2", "colo3", "colch4", "colo2", "colmol",
]
I_FIELDS_SW = ["jp", "jt", "jt1", "indself", "indfor"]
F_IDX_SW = {n: i for i, n in enumerate(F_FIELDS_SW)}
I_IDX_SW = {n: i for i, n in enumerate(I_FIELDS_SW)}


def pack_coeffs_sw(c: Coeffs) -> tuple:
    vals = {
        "tropf": c.tropo.astype(jnp.float32),
        "fac00": c.fac00_sw, "fac10": c.fac10_sw,
        "fac01": c.fac01_sw, "fac11": c.fac11_sw,
        "selffac": c.selffac, "selffrac": c.selffrac,
        "forfac": c.forfac, "forfrac": c.forfrac,
        "colh2o": c.colh2o, "colco2": c.colco2, "colo3": c.colo3,
        "colch4": c.colch4, "colo2": c.colo2, "colmol": c.colmol,
    }
    fc = jnp.stack([vals[n].astype(jnp.float32) for n in F_FIELDS_SW])
    ic = jnp.stack([getattr(c, n).astype(jnp.int32)
                    for n in I_FIELDS_SW])
    return fc, ic


# (col1, col2 with o2 adjustment where needed) per eta band
def _eta_cols(f, band):
    if band in (16, 18):
        return f("colh2o"), f("colch4")
    if band in (17, 19, 21):
        return f("colh2o"), f("colco2")
    if band == 22:
        return f("colh2o"), O2ADJ * f("colo2")
    if band == 24:
        return f("colh2o"), f("colo2")
    if band == 28:
        return f("colo3"), f("colo2")
    raise KeyError(band)


def sw_fused_body(fc, ic, tabs, meta, in_pallas=False):
    """(taug, taur), each (112, tile); in_pallas selects the matmul
    precision strategy (see taumol_lw_fused._make_dot)."""
    dot = _make_dot(tabs, in_pallas)
    tile = fc.shape[1]

    def f(name):
        i = F_IDX_SW[name]
        return fc[i:i + 1, :]

    def ii(name):
        i = I_IDX_SW[name]
        return ic[i:i + 1, :]

    tropf = f("tropf")
    stratf = 1.0 - tropf
    jp, jt, jt1 = ii("jp"), ii("jt"), ii("jt1")
    f00, f10, f01, f11 = f("fac00"), f("fac10"), f("fac01"), f("fac11")

    grid0 = (jp - 1) * 5 + (jt - 1)
    grid1 = jp * 5 + (jt1 - 1)
    A_t = _onehot_rows(65, [(grid0, f00), (grid0 + 1, f10),
                            (grid1, f01), (grid1 + 1, f11)], tile)
    grid0b = (jp - 13) * 5 + (jt - 1)
    grid1b = (jp - 12) * 5 + (jt1 - 1)
    A_s = _onehot_rows(235, [(grid0b, f00), (grid0b + 1, f10),
                             (grid1b, f01), (grid1b + 1, f11)], tile)

    indself, indfor = ii("indself"), ii("indfor")
    sf = tropf * f("selffac")
    sfrac = f("selffrac")
    W_self = _onehot_rows(10, [(indself - 1, sf * (1.0 - sfrac)),
                               (indself, sf * sfrac)], tile)
    ff, ffrac = f("forfac"), f("forfrac")
    W_for = _onehot_rows(4, [(indfor - 1, ff * (1.0 - ffrac)),
                             (indfor, ff * ffrac)], tile)

    M_t = dot("tropo", A_t)
    M_s = dot("strat", A_s)
    taug = dot("sf", jnp.concatenate(
        [W_self, W_for, W_for * tropf], axis=0))

    noeta_w = {20: f("colh2o"), 23: meta["givfac23"] * f("colh2o"),
               25: f("colh2o"), 27: f("colo3"), 29: f("colh2o")}
    strat_w = {16: f("colch4"), 18: f("colch4"), 19: f("colco2"),
               20: f("colh2o"), 22: O2ADJ * f("colo2"),
               24: f("colo2"), 27: f("colo3"), 29: f("colco2")}

    pieces = []
    for b in SW_BANDS:
        ng = NG_SW[b]
        if b == 26:
            pieces.append(jnp.zeros((ng, tile), jnp.float32))
            continue
        off_t = meta["tropo_off"][b]
        if b in ETA_TROPO:
            col1, col2 = _eta_cols(f, b)
            sc = col1 + meta["strrat"][b] * col2
            _, js, fs = _eta_index(col1 / sc, 8.0)
            Bw = _onehot_rows(9, [(js, 1.0 - fs), (js + 1, fs)], tile)
            # one reduce over the eta axis (VPU op count bounds this
            # kernel; see taumol_lw_fused)
            fam = (M_t[off_t:off_t + 9 * ng].reshape(9, ng, tile)
                   * Bw[:, None, :]).sum(axis=0)
            contrib = (tropf * sc) * fam
        else:
            contrib = (tropf * noeta_w[b]) * M_t[off_t:off_t + ng]
        if b in ETA_STRAT:
            off_s = meta["strat_off"][b]
            col1, col2 = _eta_cols(f, b)
            sc = col1 + meta["strrat"][b] * col2
            _, js, fs = _eta_index(col1 / sc, 4.0)
            Bw = _onehot_rows(5, [(js, 1.0 - fs), (js + 1, fs)], tile)
            fam = (M_s[off_s:off_s + 5 * ng].reshape(5, ng, tile)
                   * Bw[:, None, :]).sum(axis=0)
            contrib = contrib + (stratf * sc) * fam
        elif b in NOETA_STRAT:
            off_s = meta["strat_off"][b]
            contrib = contrib + (stratf * strat_w[b]
                                 * M_s[off_s:off_s + ng])
        pieces.append(contrib)
    taug = taug + jnp.concatenate(pieces, axis=0)

    # constant cross-sections
    colo3, colco2, colh2o = f("colo3"), f("colco2"), f("colh2o")
    o2cont = 4.35e-4 * f("colo2") / (350.0 * 2.0)
    const_scales = {
        "colch4": f("colch4"), "o2cont": o2cont,
        "t_colo3": tropf * colo3, "s_colo3": stratf * colo3,
        "t_colco2": tropf * colco2, "s_colh2o": stratf * colh2o,
    }
    cv = tabs["const_vecs"]
    for k, (_, _, scale_name) in enumerate(CONST_SPECS):
        taug = taug + cv[:, k:k + 1] * const_scales[scale_name]

    # Rayleigh
    colmol = f("colmol")
    taur = tabs["rayl_vec"] * colmol + tabs["rayl24_b"] * (stratf
                                                           * colmol)
    col1, col2 = _eta_cols(f, 24)
    sc = col1 + meta["strrat"][24] * col2
    _, js, fs = _eta_index(col1 / sc, 8.0)
    wmol = tropf * colmol
    W24 = _onehot_rows(9, [(js, wmol * (1.0 - fs)),
                           (js + 1, wmol * fs)], tile)
    # band-24 rows are placed inside the (112, 9) table, so the product
    # lands directly on the full taur rows (zero rows add exact 0.0)
    taur = taur + dot("rayl24", W24)

    return taug, taur


from .taumol_lw_fused import _kernel_tab_fields

TAB_FIELDS_SW = _kernel_tab_fields(
    ["tropo", "strat", "sf", "rayl24"],
    ["const_vecs", "rayl_vec", "rayl24_b"])


def _taumol_sw_fused_flat(fc, ic, fd: SwFusedTables, use_pallas: bool,
                          tile: int = 0, cell_major: bool = False):
    """cell_major=True emits (N, 112) outputs (in-VMEM transpose; no
    HBM relayout afterwards) — see taumol_lw_fused."""
    if not tile:
        import os
        tile = int(os.environ.get('ECRAD_TAUMOL_TILE', '512'))
    n = fc.shape[1]
    if not use_pallas:
        tabs = {k: jnp.asarray(getattr(fd, k))
                for k in fd._fields if k != "meta"}
        taug, taur = sw_fused_body(fc, ic, tabs, fd.meta)
        return (taug.T, taur.T) if cell_major else (taug, taur)
    tabs_np = {k: getattr(fd, k) for k in TAB_FIELDS_SW}

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = -(-n // tile) * tile
    if n_pad != n:
        fc = jnp.pad(fc, ((0, 0), (0, n_pad - n)))
        ic = jnp.pad(ic, ((0, 0), (0, n_pad - n)))
    tab_vals = [jnp.asarray(tabs_np[k]) for k in TAB_FIELDS_SW]
    meta = fd.meta

    def kernel(fc_ref, ic_ref, *refs):
        tab_refs = refs[:len(TAB_FIELDS_SW)]
        tg_ref, tr_ref = refs[len(TAB_FIELDS_SW):]
        tabs = {k: r[:] for k, r in zip(TAB_FIELDS_SW, tab_refs)}
        taug, taur = sw_fused_body(fc_ref[:], ic_ref[:], tabs, meta,
                                   in_pallas=True)
        if cell_major:
            tg_ref[:] = taug.T
            tr_ref[:] = taur.T
        else:
            tg_ref[:] = taug
            tr_ref[:] = taur

    nf, ni = fc.shape[0], ic.shape[0]
    in_specs = [
        pl.BlockSpec((nf, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ni, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    for v in tab_vals:
        in_specs.append(pl.BlockSpec(v.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if cell_major:
        out_spec = pl.BlockSpec((tile, 112), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, 112), jnp.float32)
    else:
        out_spec = pl.BlockSpec((112, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((112, n_pad), jnp.float32)
    taug, taur = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
    )(fc, ic, *tab_vals)
    if cell_major:
        return taug[:n], taur[:n]
    return taug[:, :n], taur[:, :n]


def taumol_sw_fused(c2: Coeffs, t: dict, use_pallas: bool,
                    toa_first: bool = False):
    """Drop-in for taumol_sw: (taug, taur, sfluxzen).

    toa_first=True flips the coeff fields before flattening and emits
    cell-major kernel output, so taug/taur reshape to TOA-first
    (ncol, nlev, 112) with no transpose (see taumol_lw_fused). The
    solar-source layer selection below always uses the original
    surface-first c2 (layreffr indexing is surface-first)."""
    from .taumol_sw import (_at_layer, _eta, _laysolfr_strat,
                            _laysolfr_tropo, _sflux_1d, _sflux_eta)

    dtype = c2.colh2o.dtype
    ncol, nlev = c2.colh2o.shape
    ck = Coeffs(*[x[:, ::-1] for x in c2]) if toa_first else c2
    c = Coeffs(*[x.reshape(-1) for x in ck])
    fd = build_sw_fused(t)
    fc, ic = pack_coeffs_sw(c)
    taug, taur = _taumol_sw_fused_flat(fc, ic, fd, use_pallas,
                                       cell_major=toa_first)
    if toa_first:
        taug = taug.reshape(ncol, nlev, 112)
        taur = taur.reshape(ncol, nlev, 112)
    else:
        taug = taug.reshape(112, ncol, nlev).transpose(1, 2, 0)
        taur = taur.reshape(112, ncol, nlev).transpose(1, 2, 0)

    # ---- solar source (XLA-side; per-column, cross-level) --------------
    def eta2d(col1, col2, strrat, mult):
        speccomb = col1 + strrat * col2
        return _eta(col1, speccomb, mult)

    st = fd.meta["strrat"]
    sfluxes = []
    # band 16
    sfluxes.append(_sflux_1d(t["sw16_sfluxref"], ncol, dtype))
    # band 17: strat eta at laysolfr_strat
    js, fs = eta2d(c2.colh2o, c2.colco2, st[17], 4.0)
    lay = _laysolfr_strat(c2, int(t["sw17_layreffr"]))
    sfluxes.append(_sflux_eta(t["sw17_sfluxref"], _at_layer(js, lay),
                              _at_layer(fs, lay)))
    # bands 18, 19: tropo eta at laysolfr_tropo
    for b, col2 in ((18, c2.colch4), (19, c2.colco2)):
        js, fs = eta2d(c2.colh2o, col2, st[b], 8.0)
        lay = _laysolfr_tropo(c2, int(t[f"sw{b}_layreffr"]))
        sfluxes.append(_sflux_eta(t[f"sw{b}_sfluxref"],
                                  _at_layer(js, lay),
                                  _at_layer(fs, lay)))
    # band 20
    sfluxes.append(_sflux_1d(t["sw20_sfluxref"], ncol, dtype))
    # band 21: tropo eta
    js, fs = eta2d(c2.colh2o, c2.colco2, st[21], 8.0)
    lay = _laysolfr_tropo(c2, int(t["sw21_layreffr"]))
    sfluxes.append(_sflux_eta(t["sw21_sfluxref"], _at_layer(js, lay),
                              _at_layer(fs, lay)))
    # band 22
    js, fs = eta2d(c2.colh2o, O2ADJ * c2.colo2, st[22], 8.0)
    lay = _laysolfr_tropo(c2, int(t["sw22_layreffr"]))
    sfluxes.append(_sflux_eta(t["sw22_sfluxref"], _at_layer(js, lay),
                              _at_layer(fs, lay)))
    # band 23
    sfluxes.append(_sflux_1d(t["sw23_sfluxref"], ncol, dtype))
    # band 24
    js, fs = eta2d(c2.colh2o, c2.colo2, st[24], 8.0)
    lay = _laysolfr_tropo(c2, int(t["sw24_layreffr"]))
    sfluxes.append(_sflux_eta(t["sw24_sfluxref"], _at_layer(js, lay),
                              _at_layer(fs, lay)))
    # bands 25, 26
    sfluxes.append(_sflux_1d(t["sw25_sfluxref"], ncol, dtype))
    sfluxes.append(_sflux_1d(t["sw26_sfluxref"], ncol, dtype))
    # band 27
    sfluxes.append(float(t["sw27_scalekur"])
                   * _sflux_1d(t["sw27_sfluxref"], ncol, dtype))
    # band 28
    js, fs = eta2d(c2.colo3, c2.colo2, st[28], 4.0)
    lay = _laysolfr_strat(c2, int(t["sw28_layreffr"]))
    sfluxes.append(_sflux_eta(t["sw28_sfluxref"], _at_layer(js, lay),
                              _at_layer(fs, lay)))
    # band 29
    sfluxes.append(_sflux_1d(t["sw29_sfluxref"], ncol, dtype))

    sflux = jnp.concatenate(sfluxes, axis=-1)
    return taug, taur, sflux
