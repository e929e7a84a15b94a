"""Fused SPARTACUS SW adding-scan Pallas kernels.

After round 3 moved the per-layer reflectance/transmittance pipeline
into one Pallas kernel (ops/spartacus_reftrans.py, +46% solver
throughput), the remaining SPARTACUS cost is the two sequential
adding sweeps (albedo accumulation with entrapment going up, flux
propagation going down). As lax.scan bodies they round-trip every
(3, 3, ng, ncol) intermediate through HBM each level (~40 HLO fusions
per step). Here each sweep is ONE kernel: grid = (column tiles,
levels) with levels innermost — Mosaic iterates the last grid axis
sequentially, so the scan carry lives in the output block (same block
index every level = kept resident in VMEM) and each level step only
streams that level's reftrans rows in and its ys rows out.

Layout: everything is g-minor (rows, ng, ncol) with ng in sublanes and
ncol in lanes (the round-2 scan layout), so per-COLUMN fields (overlap
matrices, clear flags, geometry scalars) ride as (rows, ncol) blocks
broadcast over sublanes inside the kernel — no ng-times HBM blow-up.

The production CPU path stays the existing lax.scan in
solvers/spartacus_sw.py (bit-stable goldens); the kernel step uses the
unrolled mm_gu/mv_gu forms (Mosaic cannot reduce over a non-minor
axis), so kernel-vs-scan equivalence is asserted at a small tolerance
on hardware by tools/check_kernel_equivalence.py (sum reassociation
only).

Reference parity: radiation_spartacus_sw.F90:930-1430 (upward
total-albedo accumulation incl. entrapment + step_migrations),
:1484-1650 (downward pass).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Entrapment
from ..solvers.matrix import add_eye_g, mm_gu, mv_gu, solve_g, solve_vec_g

# per-column packed rows (see _pack_cols)
_UM = 0           # 9 rows: u_matrix at the interface above the layer
_VM = 9           # 9 rows: v_matrix at the interface above the layer
_VMN = 18         # 9 rows: v_matrix at the interface below the layer
_CF = 27          # cloud fraction
_DZ = 28
_XLD = 29         # x_layer_diffuse
_XLDIR = 30       # x_layer_direct
_EDGE = 31        # 3 rows: edge length of the layer above
_INVEFF = 34      # inv effective size of the layer above
_OVP = 35         # overlap param at the interface above
_RF = 36          # 3 rows: region fractions
_RFP = 39         # 3 rows: region fractions of the layer above
_CLEAR = 42
_CLEARP = 43      # layer above clear
_CLEARN = 44      # layer below clear
_NOTTOP = 45
_TANSZA = 46
NCOLROWS = 47

_LB = int(__import__('os').environ.get('ECRAD_SPADD_LB', '128'))  # lane (column) tile


def _mat(rows, base):
    """9 packed (1, L) rows -> (3, 3, 1, L) matrix."""
    return jnp.stack([
        jnp.stack([rows[base + 3 * i + j] for j in range(3)], 0)
        for i in range(3)], 0)


def _mat_t(rows, base):
    return jnp.stack([
        jnp.stack([rows[base + 3 * j + i] for j in range(3)], 0)
        for i in range(3)], 0)


def _unpack_mats(h, k0, n=9):
    """(45, S, L) block rows k0..k0+9 -> (3, 3, S, L)."""
    return jnp.stack([jnp.stack([h[k0 + 3 * i + j] for j in range(3)],
                                0) for i in range(3)], 0)


def _diag(M):
    return jnp.stack([M[i, i] for i in range(M.shape[0])], 0)


def _flat9(M):
    """(3, 3, S, L) -> (9, S, L) by explicit stack (Mosaic cannot
    lower the leading-dim-merge shape cast of reshape)."""
    return jnp.stack([M[i, j] for i in range(3) for j in range(3)], 0)


def _diag_mat(v):
    zero = jnp.zeros_like(v[0])
    return jnp.stack([
        jnp.stack([v[i] if i == j else zero for j in range(3)], 0)
        for i in range(3)], 0)


def _zero_offdiag_clear(M, is_clear):
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(M[0, 0] if i == 0 and j == 0
                        else jnp.where(is_clear, 0.0, M[i, j]))
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)


def _zero_cloudy_vec(x, is_clear):
    return jnp.concatenate(
        [x[:1]] + [jnp.where(is_clear, 0.0, x[i:i + 1])
                   for i in range(1, x.shape[0])], 0)


def _step_migrations_k(cfg, cf, R, T, RD, TDD, TD, alb, albdir,
                       x_diffuse, x_direct, xld, xldir):
    """Kernel-layout transcription of
    solvers/spartacus_sw.py _step_migrations: per-column scalars as
    (1, L) rows (rank >= 2 everywhere — Mosaic rejects the rank-1
    shape casts of the original's [None, None, :] indexing), matrices
    (3, 3, S, L), vectors (3, S, L). Equality with the original is
    asserted by tests/test_spartacus_adding.py."""
    xl_diff = xld[None]                    # (1, 1, L)
    xl_dir = xldir[None]
    Rd = _diag(R)
    Td = _diag(T)
    RDd = _diag(RD)
    TDDd = _diag(TDD)
    TDd = _diag(TD)
    Ad = _diag(alb)
    ADd = _diag(albdir)

    ms = Td / jnp.maximum(1.0 - Rd * Ad, 1e-12)
    x_enh = jnp.maximum(1.0 - Rd * Ad, 1e-12) ** (-1.5)

    top_alb_dir = jnp.maximum(1e-8, RDd + ms * (TDd * Ad + TDDd * ADd))
    x_dir_new = jnp.maximum(0.0, xl_dir + (
        (TDd * Ad * x_enh + TDDd * ADd * (x_enh - 1.0))
        * (x_diffuse + xl_diff)
        + TDDd * ADd * (x_direct + xl_dir)) * Td / top_alb_dir)

    top_alb = jnp.maximum(1e-8, Rd + ms * Td * Ad)
    x_diff_new = xl_diff + x_enh * Ad * Td * Td * (
        x_diffuse + xl_diff) / top_alb

    # region activity (cloud_frac bounds): region 0 active when not
    # overcast, cloudy regions active when any cloud
    act = (cf < 1.0, cf > 0.0, cf > 0.0)   # (1, L) each
    x_dir_new = jnp.concatenate(
        [jnp.where(act[r], x_dir_new[r:r + 1], 0.0) for r in range(3)],
        axis=0)
    x_diff_new = jnp.concatenate(
        [jnp.where(act[r], x_diff_new[r:r + 1], 0.0) for r in range(3)],
        axis=0)
    return x_diff_new, x_dir_new


def _explicit_entrapment_k(cfg, nreg, alb_below, x_migration, vm, um,
                           c):
    """Kernel-layout transcription of
    solvers/spartacus_sw.py _explicit_entrapment: per-column rows from
    the packed cols block ((1, L) each), alb_below (3, 3, S, L),
    x_migration (3, S, L), vm/um (3, 3, 1, L). Equality with the
    original is asserted by tests/test_spartacus_adding.py."""
    from ..solvers.matrix import fast_expm_exchange_3_g
    entrap_total = 0.0
    inv_eff = jnp.minimum(c[_INVEFF],
                          1.0 / cfg.min_cloud_effective_size)  # (1, L)
    not_top = c[_NOTTOP] > 0.5
    overlap_lev = c[_OVP]
    for jreg2 in range(nreg):
        f_this = c[_RF + jreg2]
        f_prev = c[_RFP + jreg2]
        transfer_scaling = 1.0 - (1.0 - cfg.overhang_factor) \
            * overlap_lev * jnp.minimum(f_this, f_prev) \
            / jnp.maximum(cfg.cloud_fraction_threshold, f_this)
        transfer_scaling = jnp.where(not_top, transfer_scaling, 0.0)

        rates = []
        for jreg in range(nreg - 1):
            r_fwd = transfer_scaling * c[_EDGE + jreg] \
                / jnp.maximum(um[jreg, jreg2], 1e-5)
            r_bwd = transfer_scaling * c[_EDGE + jreg] \
                / jnp.maximum(um[jreg + 1, jreg2], 1e-5)
            rates.append((r_fwd, r_bwd))

        x2 = x_migration[jreg2]            # (S, L)
        if cfg.i_3d_sw_entrapment == Entrapment.EXPLICIT:
            fractal = 1.0 / jnp.sqrt(jnp.maximum(
                1.0, 2.5 * x2 * inv_eff))
        else:
            fractal = 1.0
        a = rates[0][0] * x2 * fractal     # entrapment(2,1)
        b = rates[0][1] * x2 * fractal     # entrapment(1,2)
        cc = rates[1][0] * x2 * fractal
        d = rates[1][1] * x2 * fractal
        max_entr = jnp.maximum(a, b + cc)
        scale = jnp.where(max_entr > cfg.max_cloud_od,
                          cfg.max_cloud_od
                          / jnp.maximum(max_entr, 1e-12), 1.0)
        a, b, cc, d = a * scale, b * scale, cc * scale, d * scale
        Pg = fast_expm_exchange_3_g(a, b, cc, d)   # (3, 3, S, L)

        albdiag = alb_below[jreg2, jreg2]          # (S, L)
        contrib = Pg * vm[jreg2][None] * albdiag[None, None]
        entrap_total = entrap_total + contrib
    return entrap_total


def sw_up_step(cfg, carry, hist, cols):
    """One upward-sweep level in kernel-safe form.

    carry: (24, S, L) packed [alb 9 | albdir 9 | x_diff 3 | x_dir 3];
    hist: (45, S, L) packed [R | T | RD | TD | TDD];
    cols: (NCOLROWS, L) per-column rows.
    Returns (new_carry, ys (18, S, L) = carry's alb/albdir at entry).
    Semantics identical to solvers/spartacus_sw.py up_body.
    """
    entrap = cfg.i_3d_sw_entrapment
    nreg = 3
    c = [cols[i:i + 1] for i in range(NCOLROWS)]   # (1, L) rows

    alb = _unpack_mats(carry, 0)
    albdir = _unpack_mats(carry, 9)
    x_diff = carry[18:21]
    x_dir = carry[21:24]

    R = _unpack_mats(hist, 0)
    T = _unpack_mats(hist, 9)
    RD = _unpack_mats(hist, 18)
    TD = _unpack_mats(hist, 27)
    TDD = _unpack_mats(hist, 36)

    um = _mat(c, _UM)
    vm = _mat(c, _VM)
    vm_t = _mat_t(c, _VM)
    is_clear = c[_CLEAR] > 0.5                # (1, L)
    both_clear = is_clear & (c[_CLEARP] > 0.5)

    if entrap in (Entrapment.EXPLICIT, Entrapment.EXPLICIT_NON_FRACTAL):
        x_diff, x_dir = _step_migrations_k(
            cfg, c[_CF], R, T, RD, TDD, TD, alb, albdir, x_diff,
            x_dir, c[_XLD], c[_XLDIR])

    denom = add_eye_g(-mm_gu(alb, R), 1.0)
    rhs = jnp.concatenate(
        [mm_gu(alb, T), mm_gu(albdir, TDD) + mm_gu(alb, TD)], axis=1)
    X = mm_gu(T, solve_g(denom, rhs))
    alb_below = R + X[:, :nreg]
    albdir_below = RD + X[:, nreg:]
    alb_below = _zero_offdiag_clear(alb_below, is_clear)
    albdir_below = _zero_offdiag_clear(albdir_below, is_clear)

    if entrap == Entrapment.MAXIMUM:
        mixed = mm_gu(mm_gu(um, alb_below), vm)
        mixed_dir = mm_gu(mm_gu(um, albdir_below), vm)
    elif entrap == Entrapment.ZERO:
        col_sum = alb_below[0] + alb_below[1] + alb_below[2]
        mixed = _diag_mat(mv_gu(vm_t, col_sum))
        col_sum_d = albdir_below[0] + albdir_below[1] + albdir_below[2]
        mixed_dir = _diag_mat(mv_gu(vm_t, col_sum_d))
    else:
        offdiag = alb_below - _diag_mat(_diag(alb_below))
        mixed = mm_gu(mm_gu(um, offdiag), vm)
        offdiag_d = albdir_below - _diag_mat(_diag(albdir_below))
        mixed_dir = mm_gu(mm_gu(um, offdiag_d), vm)
        if entrap == Entrapment.EDGE_ONLY or not cfg.do_3d_effects:
            mixed = mixed + _diag_mat(mv_gu(vm_t, _diag(alb_below)))
            mixed_dir = mixed_dir + _diag_mat(
                mv_gu(vm_t, _diag(albdir_below)))
        else:
            mixed = mixed + _explicit_entrapment_k(
                cfg, nreg, alb_below, x_diff, vm, um, c)
            mixed_dir = mixed_dir + _explicit_entrapment_k(
                cfg, nreg, albdir_below, x_dir, vm, um, c)

    alb_keep = jnp.where(both_clear, alb_below, mixed)
    albdir_keep = jnp.where(both_clear, albdir_below, mixed_dir)

    if entrap in (Entrapment.EXPLICIT, Entrapment.EXPLICIT_NON_FRACTAL):
        x_diff_m = mv_gu(vm_t, x_diff)
        x_dir_m = mv_gu(vm_t, x_dir)
        x_diff = jnp.where(both_clear, x_diff, x_diff_m)
        x_dir = jnp.where(both_clear, x_dir, x_dir_m)

    ys = carry[:18]
    new_carry = jnp.concatenate(
        [_flat9(alb_keep), _flat9(albdir_keep), x_diff, x_dir], axis=0)
    return new_carry, ys


def sw_dn_step(cfg, carry, hist, ys_up, cols):
    """One downward-sweep level: carry (6, S, L) [flux_dn 3 | direct 3];
    ys_up (18, S, L) [alb_below 9 | albdir_below 9]. Returns
    (new_carry, out (9, S, L) = [fup | fdn | ddn] above this layer).
    Semantics identical to solvers/spartacus_sw.py dn_body."""
    c = [cols[i:i + 1] for i in range(NCOLROWS)]
    flux_dn = carry[0:3]
    direct_dn = carry[3:6]

    R = _unpack_mats(hist, 0)
    T = _unpack_mats(hist, 9)
    TD = _unpack_mats(hist, 27)
    TDD = _unpack_mats(hist, 36)
    alb_b = _unpack_mats(ys_up, 0)
    albdir_b = _unpack_mats(ys_up, 9)
    vm_next = _mat(c, _VMN)
    is_clear = c[_CLEAR] > 0.5
    both_clear = is_clear & (c[_CLEARN] > 0.5)

    source_dn = mv_gu(TD, direct_dn)
    direct_above = mv_gu(TDD, direct_dn)
    denom = add_eye_g(-mm_gu(R, alb_b), 1.0)
    total_source = mv_gu(albdir_b, direct_above)
    rhs = mv_gu(T, flux_dn) + mv_gu(R, total_source) + source_dn
    fdn_above = solve_vec_g(denom, rhs)
    fup_above = mv_gu(alb_b, fdn_above) + total_source
    fdn_above = _zero_cloudy_vec(fdn_above, is_clear)
    fup_above = _zero_cloudy_vec(fup_above, is_clear)
    direct_above = _zero_cloudy_vec(direct_above, is_clear)
    fdn_mixed = mv_gu(vm_next, fdn_above)
    ddn_mixed = mv_gu(vm_next, direct_above)
    fdn_out = jnp.where(both_clear, fdn_above, fdn_mixed)
    ddn_out = jnp.where(both_clear, direct_above, ddn_mixed)

    out = jnp.concatenate([fup_above, fdn_above, direct_above], axis=0)
    return jnp.concatenate([fdn_out, ddn_out], axis=0), out


def pack_cols(um_g, vm_g, cf, dz, xld, xldir, edge_prev, inv_eff, ovp,
              rf, rf_prev, clear, clear_prev, clear_next, not_top,
              tan_sza):
    """(nlev, NCOLROWS, ncol) per-column kernel input.

    um_g/vm_g: (nlev+1, 3, 3, 1, ncol); cf/dz/xld/xldir/inv_eff/ovp/
    clear*: (nlev, ncol) [or (ncol,) broadcastable]; edge_prev/rf/
    rf_prev: (nlev, ncol, 3); not_top: (nlev,); tan_sza: (ncol,)."""
    nlev, ncol = cf.shape
    dt = cf.dtype

    def rows9(m):                      # (nlev, 3, 3, 1, ncol) -> 9 rows
        return m[:, :, :, 0, :].reshape(nlev, 9, ncol)

    def row(x):
        return jnp.broadcast_to(x, (nlev, ncol)).astype(dt)[:, None, :]

    parts = [rows9(um_g[:nlev]), rows9(vm_g[:nlev]), rows9(vm_g[1:]),
             row(cf), row(dz), row(xld), row(xldir),
             jnp.moveaxis(edge_prev, 2, 1),
             row(inv_eff), row(ovp),
             jnp.moveaxis(rf, 2, 1), jnp.moveaxis(rf_prev, 2, 1),
             row(clear.astype(dt)), row(clear_prev.astype(dt)),
             row(clear_next.astype(dt)),
             row(not_top.astype(dt)[:, None]),
             row(tan_sza[None, :])]
    return jnp.concatenate(parts, axis=1)


def _pad_cols_dim(x, ncol_pad):
    if x.shape[-1] == ncol_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, ncol_pad - x.shape[-1])]
    return jnp.pad(x, pad)


def sw_adding_sweeps(cfg, hist, cols, init_up, direct0,
                     interpret=False):
    """Both SPARTACUS SW adding sweeps as two Pallas kernels.

    hist: (nlev, 45, ng, ncol) packed reftrans rows; cols: (nlev,
    NCOLROWS, ncol); init_up: (18, ng, ncol) [alb0 | albdir0];
    direct0: (3, ng, ncol). Returns (alb_top, albdir_top (3,3,ng,ncol),
    ys_up (nlev, 18, ng, ncol), dn_out (nlev, 9, ng, ncol)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nlev, _, ng, ncol = hist.shape
    ncol_pad = -(-ncol // _LB) * _LB
    hist = _pad_cols_dim(hist, ncol_pad)
    cols = _pad_cols_dim(cols, ncol_pad)
    init_up = _pad_cols_dim(init_up, ncol_pad)
    direct0 = _pad_cols_dim(direct0, ncol_pad)
    nc_tiles = ncol_pad // _LB

    def up_kernel(hist_ref, cols_ref, init_ref, ys_ref, carry_ref):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            carry_ref[:18] = init_ref[...]
            carry_ref[18:] = jnp.zeros_like(carry_ref[18:])

        new_carry, ys = sw_up_step(cfg, carry_ref[...], hist_ref[0],
                                   cols_ref[0])
        ys_ref[0] = ys
        carry_ref[...] = new_carry

    ys_up, final_up = pl.pallas_call(
        up_kernel,
        interpret=interpret,
        grid=(nc_tiles, nlev),
        in_specs=[
            pl.BlockSpec((1, 45, ng, _LB),
                         lambda c, l, n=nlev: (n - 1 - l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCOLROWS, _LB),
                         lambda c, l, n=nlev: (n - 1 - l, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18, ng, _LB), lambda c, l: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 18, ng, _LB),
                         lambda c, l, n=nlev: (n - 1 - l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, ng, _LB), lambda c, l: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nlev, 18, ng, ncol_pad),
                                 hist.dtype),
            jax.ShapeDtypeStruct((24, ng, ncol_pad), hist.dtype),
        ],
    )(hist, cols, init_up)

    def dn_kernel(hist_ref, ysup_ref, cols_ref, d0_ref, out_ref,
                  carry_ref):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            carry_ref[0:3] = jnp.zeros_like(carry_ref[0:3])
            carry_ref[3:6] = d0_ref[...]

        new_carry, out = sw_dn_step(cfg, carry_ref[...], hist_ref[0],
                                    ysup_ref[0], cols_ref[0])
        out_ref[0] = out
        carry_ref[...] = new_carry

    dn_out, _ = pl.pallas_call(
        dn_kernel,
        interpret=interpret,
        grid=(nc_tiles, nlev),
        in_specs=[
            pl.BlockSpec((1, 45, ng, _LB), lambda c, l: (l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 18, ng, _LB), lambda c, l: (l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCOLROWS, _LB), lambda c, l: (l, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ng, _LB), lambda c, l: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 9, ng, _LB), lambda c, l: (l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, ng, _LB), lambda c, l: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nlev, 9, ng, ncol_pad), hist.dtype),
            jax.ShapeDtypeStruct((6, ng, ncol_pad), hist.dtype),
        ],
    )(hist, ys_up, cols, direct0)

    alb_top = _unpack_mats(final_up[:, :, :ncol], 0)
    albdir_top = _unpack_mats(final_up[:, :, :ncol], 9)
    return (alb_top, albdir_top, ys_up[:, :, :, :ncol],
            dn_out[:, :, :, :ncol])


# =========================================================================
# Longwave
# =========================================================================

# LW per-column rows
_LUM = 0          # 9 rows
_LVM = 9          # 9 rows
_LVMN = 18        # 9 rows: v_matrix at the interface below
_LCLEAR = 27
_LCLEARP = 28
_LCLEARN = 29
LW_NCOLROWS = 30


def lw_up_step(cfg, use_matrix, carry, hist, cols):
    """One LW upward-sweep level: carry (12, S, L) [alb 9 | src 3];
    hist (24, S, L) [R 9 | T 9 | SU 3 | SD 3].
    Semantics identical to solvers/spartacus_lw.py up_body."""
    c = [cols[i:i + 1] for i in range(LW_NCOLROWS)]
    alb = _unpack_mats(carry, 0)
    src = carry[9:12]
    R = _unpack_mats(hist, 0)
    T = _unpack_mats(hist, 9)
    SU = hist[18:21]
    SD = hist[21:24]
    um = _mat(c, _LUM)
    vm = _mat(c, _LVM)
    vm_t = _mat_t(c, _LVM)
    is_clear = c[_LCLEAR] > 0.5
    both_clear = is_clear & (c[_LCLEARP] > 0.5)

    if use_matrix:
        denom = add_eye_g(-mm_gu(alb, R), 1.0)
        alb_below = R + mm_gu(T, solve_g(denom, mm_gu(alb, T)))
        src_below = SU + mv_gu(T, solve_vec_g(
            denom, src + mv_gu(alb, SD)))
    else:
        Rd = _diag(R)
        Td = _diag(T)
        Ad = _diag(alb)
        inv = 1.0 / (1.0 - Ad * Rd)
        alb_below = _diag_mat(Rd + Td * Td * Ad * inv)
        src_below = SU + Td * (src + Ad * SD) * inv
    alb_below = _zero_offdiag_clear(alb_below, is_clear)
    src_below = _zero_cloudy_vec(src_below, is_clear)

    src_mixed = mv_gu(um, src_below)
    if cfg.do_3d_lw_multilayer_effects:
        alb_mixed = mm_gu(mm_gu(um, alb_below), vm)
    else:
        alb_mixed = _diag_mat(mv_gu(vm_t, _diag(alb_below)))
    alb_new = jnp.where(both_clear, alb_below, alb_mixed)
    src_new = jnp.where(both_clear, src_below, src_mixed)

    ys = carry
    new_carry = jnp.concatenate([_flat9(alb_new), src_new], axis=0)
    return new_carry, ys


def lw_dn_step(cfg, use_matrix, carry, hist, ys_up, cols):
    """One LW downward-sweep level: carry (3, S, L) flux_dn;
    ys_up (12, S, L) [alb_below 9 | src_below 3]. Returns
    (new_carry = fdn_out, out (6, S, L) = [fup_above | fdn_out]).
    Semantics identical to solvers/spartacus_lw.py dn_body."""
    c = [cols[i:i + 1] for i in range(LW_NCOLROWS)]
    flux_dn = carry
    R = _unpack_mats(hist, 0)
    T = _unpack_mats(hist, 9)
    SD = hist[21:24]
    alb_b = _unpack_mats(ys_up, 0)
    src_b = ys_up[9:12]
    vm_next = _mat(c, _LVMN)
    is_clear = c[_LCLEAR] > 0.5
    both_clear = is_clear & (c[_LCLEARN] > 0.5)

    if use_matrix:
        denom = add_eye_g(-mm_gu(R, alb_b), 1.0)
        rhs = mv_gu(T, flux_dn) + mv_gu(R, src_b) + SD
        fdn_above = solve_vec_g(denom, rhs)
        fup_above = mv_gu(alb_b, fdn_above) + src_b
    else:
        Rd = _diag(R)
        Td = _diag(T)
        Ad = _diag(alb_b)
        fdn_above = (Td * flux_dn + Rd * src_b + SD) / (1.0 - Rd * Ad)
        fup_above = src_b + Ad * fdn_above
    fdn_above = _zero_cloudy_vec(fdn_above, is_clear)
    fup_above = _zero_cloudy_vec(fup_above, is_clear)
    fdn_mixed = mv_gu(vm_next, fdn_above)
    fdn_out = jnp.where(both_clear, fdn_above, fdn_mixed)
    out = jnp.concatenate([fup_above, fdn_out], axis=0)
    return fdn_out, out


def lw_pack_cols(um_g, vm_g, clear, clear_prev, clear_next):
    """(nlev, LW_NCOLROWS, ncol) per-column LW kernel input."""
    nlev, ncol = clear.shape[0], clear.shape[1]
    dt = um_g.dtype

    def rows9(m):
        return m[:, :, :, 0, :].reshape(nlev, 9, ncol).astype(dt)

    def row(x):
        return x.astype(dt)[:, None, :]

    return jnp.concatenate(
        [rows9(um_g[:nlev]), rows9(vm_g[:nlev]), rows9(vm_g[1:]),
         row(clear), row(clear_prev), row(clear_next)], axis=1)


def lw_adding_sweeps(cfg, use_matrix, hist, cols, init_up,
                     interpret=False):
    """Both SPARTACUS LW adding sweeps as two Pallas kernels.

    hist: (nlev, 24, ng, ncol) [R | T | SU | SD]; cols: (nlev,
    LW_NCOLROWS, ncol); init_up: (12, ng, ncol) [alb0 | src0].
    Returns (src_top (3, ng, ncol), ys_up (nlev, 12, ng, ncol),
    dn_out (nlev, 6, ng, ncol) [fup | fdn]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nlev, _, ng, ncol = hist.shape
    ncol_pad = -(-ncol // _LB) * _LB
    hist = _pad_cols_dim(hist, ncol_pad)
    cols = _pad_cols_dim(cols, ncol_pad)
    init_up = _pad_cols_dim(init_up, ncol_pad)
    nc_tiles = ncol_pad // _LB

    def up_kernel(hist_ref, cols_ref, init_ref, ys_ref, carry_ref):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            carry_ref[...] = init_ref[...]

        new_carry, ys = lw_up_step(cfg, use_matrix, carry_ref[...],
                                   hist_ref[0], cols_ref[0])
        ys_ref[0] = ys
        carry_ref[...] = new_carry

    ys_up, final_up = pl.pallas_call(
        up_kernel,
        interpret=interpret,
        grid=(nc_tiles, nlev),
        in_specs=[
            pl.BlockSpec((1, 24, ng, _LB),
                         lambda c, l, n=nlev: (n - 1 - l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LW_NCOLROWS, _LB),
                         lambda c, l, n=nlev: (n - 1 - l, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, ng, _LB), lambda c, l: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 12, ng, _LB),
                         lambda c, l, n=nlev: (n - 1 - l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, ng, _LB), lambda c, l: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nlev, 12, ng, ncol_pad),
                                 hist.dtype),
            jax.ShapeDtypeStruct((12, ng, ncol_pad), hist.dtype),
        ],
    )(hist, cols, init_up)

    def dn_kernel(hist_ref, ysup_ref, cols_ref, out_ref, carry_ref):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref[...])

        new_carry, out = lw_dn_step(cfg, use_matrix, carry_ref[...],
                                    hist_ref[0], ysup_ref[0],
                                    cols_ref[0])
        out_ref[0] = out
        carry_ref[...] = new_carry

    dn_out, _ = pl.pallas_call(
        dn_kernel,
        interpret=interpret,
        grid=(nc_tiles, nlev),
        in_specs=[
            pl.BlockSpec((1, 24, ng, _LB), lambda c, l: (l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, ng, _LB), lambda c, l: (l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LW_NCOLROWS, _LB), lambda c, l: (l, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 6, ng, _LB), lambda c, l: (l, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ng, _LB), lambda c, l: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nlev, 6, ng, ncol_pad), hist.dtype),
            jax.ShapeDtypeStruct((3, ng, ncol_pad), hist.dtype),
        ],
    )(hist, ys_up, cols)

    src_top = final_up[9:12, :, :ncol]
    return (src_top, ys_up[:, :, :, :ncol], dn_out[:, :, :, :ncol])
