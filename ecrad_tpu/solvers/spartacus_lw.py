"""SPARTACUS longwave solver.

Reference parity: radiation/radiation_spartacus_lw.F90:50-1083 — the
2*nreg Gamma matrix (diffuse up/dn blocks) with lateral exchange scaled
by the cloud-side effective emissivity (:636-670), emission via the
particular solution of the inhomogeneous two-stream system (:674-712),
matrix exponential -> reflectance/transmittance/source matrices, then
upward albedo/source accumulation (diagonal or full-matrix depending on
do_3d_effects / do_3d_lw_multilayer_effects) and the downward flux pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PdfShape, RadiationConfig
from . import two_stream as ts
from .cloudless import LwFluxes
from .matrix import expm
from .spartacus_sw import (TAN_DIFFUSE_ANGLE_3D, _edge_length,
                           _layer_depth)
from .tripleclouds import calc_overlap_matrices, calc_region_properties

SIDE_EMISS_THIN = 1.4107
LW_DIFFUSIVITY = 1.66


def solver_spartacus_lw(setup, single_level, thermodynamics, cloud,
                        od, ssa, g, od_cloud, ssa_cloud, g_cloud,
                        planck_hl, emission, albedo):
    cfg: RadiationConfig = setup.config
    band_from_g = setup.spec.band_from_reordered_g_lw
    ncol, nlev, ng = od.shape
    nreg = cfg.nregions
    dtype = od.dtype

    reg_fracs, od_scaling = calc_region_properties(
        nreg, cfg.i_cloud_pdf_shape == PdfShape.GAMMA, cloud.fraction,
        cloud.fractional_std, cfg.cloud_fraction_threshold)
    u_mat, v_mat, tcc = calc_overlap_matrices(
        reg_fracs, cloud.overlap_param, cfg.cloud_inhom_decorr_scaling,
        cfg.cloud_fraction_threshold, cfg.use_beta_overlap)

    dz = _layer_depth(thermodynamics)
    if cloud.inv_cloud_effective_size is not None and cfg.do_3d_effects:
        edge_len = _edge_length(cfg, cloud, reg_fracs)
    else:
        edge_len = jnp.zeros((ncol, nlev, 3), dtype)

    cloudy = cloud.fraction > 0.0
    clear_lay = ~cloudy
    has_3d = cloudy & (edge_len[:, :, 0] > 0.0)

    # --- per-region optical properties (ncol, nlev, nreg, ng) ------------
    odc = od_cloud[:, :, band_from_g]
    ssac = ssa_cloud[:, :, band_from_g]
    gc = g_cloud[:, :, band_from_g]
    cloud_mask = cloudy[..., None]
    od_list, ssa_list, g_list = [od], [ssa], [g]
    for r in range(1, nreg):
        s = od_scaling[:, :, r][..., None]
        odc_r = odc * s
        od_t = jnp.minimum(od + odc_r, cfg.max_cloud_od)
        if cfg.do_lw_cloud_scattering:
            scat = ssa * od + ssac * odc_r
            ssa_t = jnp.where(od + odc_r > 0,
                              scat / jnp.maximum(od + odc_r, 1e-30), 0.0)
            g_t = jnp.where(scat > 0,
                            (g * ssa * od + gc * ssac * odc_r)
                            / jnp.maximum(scat, 1e-30), 0.0)
        else:
            ssa_t = jnp.zeros_like(od_t)
            g_t = jnp.zeros_like(od_t)
        od_list.append(jnp.where(cloud_mask, od_t, od))
        ssa_list.append(jnp.where(cloud_mask, ssa_t, 0.0))
        g_list.append(jnp.where(cloud_mask, g_t, 0.0))
    od_r = jnp.stack(od_list, axis=2)
    ssa_r = jnp.stack(ssa_list, axis=2)
    g_r = jnp.stack(g_list, axis=2)

    # --- lateral transfer rates + side emissivity -------------------------
    eps = 1.2e-7
    tr = jnp.zeros((ncol, nlev, nreg, nreg), dtype)
    for jreg in range(nreg - 1):
        f_up = reg_fracs[:, :, jreg]
        f_dn = reg_fracs[:, :, jreg + 1]
        base = dz * edge_len[:, :, jreg] * TAN_DIFFUSE_ANGLE_3D
        tr = tr.at[:, :, jreg, jreg + 1].set(
            jnp.where(f_up > eps, base / jnp.maximum(f_up, eps), 0.0))
        tr = tr.at[:, :, jreg + 1, jreg].set(
            jnp.where(f_dn > eps, base / jnp.maximum(f_dn, eps), 0.0))
    base3 = dz * edge_len[:, :, 2] * TAN_DIFFUSE_ANGLE_3D
    has3 = edge_len[:, :, 2] > 0.0
    tr = tr.at[:, :, 0, 2].set(
        jnp.where(has3 & (reg_fracs[:, :, 0] > eps),
                  base3 / jnp.maximum(reg_fracs[:, :, 0], eps), 0.0))
    tr = tr.at[:, :, 2, 0].set(
        jnp.where(has3 & (reg_fracs[:, :, 2] > eps),
                  base3 / jnp.maximum(reg_fracs[:, :, 2], eps), 0.0))
    tr = jnp.minimum(tr, cfg.max_3d_transfer_rate)
    tr = jnp.where(has_3d[:, :, None, None], tr, 0.0)

    # side emissivity (ncol, nlev, ng); reference :636-655
    if cfg.do_lw_side_emissivity and cfg.do_3d_effects and \
            cloud.inv_cloud_effective_size is not None:
        inv_size = jnp.minimum(cloud.inv_cloud_effective_size,
                               1.0 / cfg.min_cloud_effective_size)
        aspect = 1.0 / jnp.maximum(
            inv_size * reg_fracs[:, :, 0] * dz, 1e-12)
        abs_od = (od_r[:, :, 1:, :] * (1.0 - ssa_r[:, :, 1:, :])
                  ).sum(axis=2)
        lateral_od = (aspect / (nreg - 1.0))[..., None] * abs_od
        s1ms = jnp.sqrt(jnp.maximum(1.0 - ssa_r[:, :, 1, :], 0.0))
        thick = 2.0 * s1ms / jnp.maximum(
            s1ms + jnp.sqrt(jnp.maximum(
                1.0 - ssa_r[:, :, 1, :] * g_r[:, :, 1, :], 0.0)), 1e-12)
        side_emiss = (SIDE_EMISS_THIN - thick) / (lateral_od + 1.0) + thick
        active = (has_3d & (reg_fracs[:, :, 0] > 0.0)
                  & (reg_fracs[:, :, 1] > 0.0))[..., None]
        side_emiss = jnp.where(active, side_emiss, 1.0)
    else:
        side_emiss = jnp.ones((ncol, nlev, ng), dtype)

    # --- Gamma assembly, particular solution, expm -------------------------
    gamma1, gamma2 = ts.lw_gammas(ssa_r, g_r)   # (ncol, nlev, nreg, ng)
    od_capped = od_r.at[:, :, 0, :].set(
        jnp.minimum(od_r[:, :, 0, :], cfg.max_gas_od_3d))
    od_g = jnp.moveaxis(od_capped, 2, -1)       # (ncol, nlev, ng, nreg)
    ssa_g = jnp.moveaxis(ssa_r, 2, -1)
    g1 = jnp.moveaxis(gamma1, 2, -1)
    g2 = jnp.moveaxis(gamma2, 2, -1)
    frac_g = reg_fracs[:, :, None, :]           # (ncol, nlev, 1, nreg)
    planck_top = planck_hl[:, :-1, :, None]     # (ncol, nlev, ng, 1)
    planck_bot = planck_hl[:, 1:, :, None]

    n2 = 2 * nreg
    G = jnp.zeros((ncol, nlev, ng, n2, n2), dtype)
    emis_coeff = od_g * (1.0 - ssa_g) * frac_g * LW_DIFFUSIVITY
    ptop = jnp.concatenate([-emis_coeff * planck_top,
                            emis_coeff * planck_top], axis=-1)
    pdiff = jnp.concatenate([-emis_coeff * (planck_bot - planck_top),
                             emis_coeff * (planck_bot - planck_top)],
                            axis=-1)
    for r in range(nreg):
        G = G.at[..., r, r].add(od_g[..., r] * g1[..., r])
        G = G.at[..., nreg + r, r].add(od_g[..., r] * g2[..., r])
    trg = tr[:, :, None, :, :]   # broadcast over g
    se = side_emiss              # (ncol, nlev, ng)
    for r in range(nreg - 1):
        G = G.at[..., r, r].add(trg[..., r, r + 1])
        G = G.at[..., r + 1, r].add(-trg[..., r, r + 1])
        if r > 0:
            G = G.at[..., r + 1, r + 1].add(trg[..., r + 1, r])
            G = G.at[..., r, r + 1].add(-trg[..., r + 1, r])
        else:
            G = G.at[..., r + 1, r + 1].add(se * trg[..., r + 1, r])
            G = G.at[..., r, r + 1].add(-se * trg[..., r + 1, r])
    if nreg == 3:
        G = G.at[..., 0, 0].add(trg[..., 0, 2])
        G = G.at[..., 2, 0].add(-trg[..., 0, 2])
        G = G.at[..., 2, 2].add(se * trg[..., 2, 0])
        G = G.at[..., 0, 2].add(-se * trg[..., 2, 0])
    G = G.at[..., nreg:, nreg:].set(-G[..., :nreg, :nreg])
    G = G.at[..., :nreg, nreg:].set(-G[..., nreg:, :nreg])

    # particular solution: Gamma x = planck  (reference :674-680)
    # guard singular generators (clear regions with zero od)
    Greg = G + 1e-12 * jnp.eye(n2, dtype=dtype)
    sol_diff = -jnp.linalg.solve(Greg, pdiff[..., None])[..., 0]
    sol0 = jnp.linalg.solve(Greg, (sol_diff - ptop)[..., None])[..., 0]

    E = expm(G)
    A = E[..., :nreg, :nreg]
    B = E[..., :nreg, nreg:]
    C = E[..., nreg:, :nreg]
    D = E[..., nreg:, nreg:]
    Areg = A + 1e-12 * jnp.eye(nreg, dtype=dtype)
    ref3 = -jnp.linalg.solve(Areg, B)
    trans3 = C @ ref3 + D
    sol0_up = sol0[..., :nreg]
    sol0_dn = sol0[..., nreg:]
    sdiff_up = sol_diff[..., :nreg]
    sdiff_dn = sol_diff[..., nreg:]
    tmp = (sol0_up + sdiff_up
           - jnp.einsum("...ij,...j->...i", B, sol0_dn))
    sup3 = sol0_up - jnp.linalg.solve(Areg, tmp[..., None])[..., 0]
    tmp2 = sup3 - sol0_up
    sdn3 = (jnp.einsum("...ij,...j->...i", C, tmp2) + sol0_dn
            - jnp.einsum("...ij,...j->...i", D, sol0_dn) + sdiff_dn)

    # --- Meador-Weaver fallback --------------------------------------------
    pt = planck_hl[:, :-1, None, :]
    pb = planck_hl[:, 1:, None, :]
    if cfg.do_lw_cloud_scattering:
        rmw, tmw, sumw, sdmw = ts.lw_reftrans(
            od_r, gamma1, gamma2, pt * jnp.ones_like(od_r),
            pb * jnp.ones_like(od_r))
    else:
        tmw, sumw, sdmw = ts.lw_no_scattering_transmittance(
            od_r, pt * jnp.ones_like(od_r), pb * jnp.ones_like(od_r))
        rmw = jnp.zeros_like(tmw)
    fr4 = reg_fracs[:, :, :, None]
    sumw = sumw * fr4
    sdmw = sdmw * fr4

    def diag_embed(x):
        xg = jnp.moveaxis(x, 2, -1)
        return xg[..., :, None] * jnp.eye(nreg, dtype=dtype)

    g_ok = od <= cfg.max_gas_od_3d
    use3d = ((has_3d[..., None] | cfg.use_expm_everywhere) & g_ok)
    sel = use3d[..., None, None]
    ref = jnp.where(sel, ref3, diag_embed(rmw))
    trans = jnp.where(sel, trans3, diag_embed(tmw))
    selv = use3d[..., None]
    sup = jnp.where(selv, sup3, jnp.moveaxis(sumw, 2, -1))
    sdn = jnp.where(selv, sdn3, jnp.moveaxis(sdmw, 2, -1))

    # clear layers: only region 1 active
    reg00 = jnp.zeros((nreg, nreg), bool).at[0, 0].set(True)
    clear_sel = clear_lay[:, :, None, None, None]
    ref = jnp.where(clear_sel & ~reg00, 0.0, ref)
    trans = jnp.where(clear_sel & ~reg00, 0.0, trans)
    reg0v = (jnp.arange(nreg) == 0)
    clear_v = clear_lay[:, :, None, None]
    sup = jnp.where(clear_v & ~reg0v, 0.0, sup)
    sdn = jnp.where(clear_v & ~reg0v, 0.0, sdn)

    # clear-sky per-layer properties
    g1c, g2c = ts.lw_gammas(ssa, g)
    if cfg.do_lw_aerosol_scattering:
        rc, tc, suc, sdc = ts.lw_reftrans(od, g1c, g2c,
                                          planck_hl[:, :-1, :],
                                          planck_hl[:, 1:, :])
    else:
        tc, suc, sdc = ts.lw_no_scattering_transmittance(
            od, planck_hl[:, :-1, :], planck_hl[:, 1:, :])
        rc = jnp.zeros_like(tc)

    clear_prev = jnp.concatenate(
        [jnp.ones((ncol, 1), bool), clear_lay[:, :-1]], axis=1)
    use_matrix = cfg.do_3d_effects or cfg.do_3d_lw_multilayer_effects

    # ---------------- upward pass -----------------------------------------
    alb0 = (albedo[:, :, None, None] * jnp.eye(nreg, dtype=dtype))
    src0 = emission[:, :, None] * reg_fracs[:, -1, None, :]

    def up_body(carry, lev):
        alb, src = carry
        R = ref[:, lev]
        T = trans[:, lev]
        SU = sup[:, lev]
        SD = sdn[:, lev]
        eye = jnp.eye(nreg, dtype=dtype)
        if use_matrix:
            denom = eye - alb @ R
            alb_below = R + T @ jnp.linalg.solve(denom, alb @ T)
            src_below = SU + jnp.einsum(
                "cgij,cgj->cgi", T,
                jnp.linalg.solve(denom, (src + jnp.einsum(
                    "cgij,cgj->cgi", alb, SD))[..., None])[..., 0])
        else:
            Rd = jnp.diagonal(R, axis1=-2, axis2=-1)
            Td = jnp.diagonal(T, axis1=-2, axis2=-1)
            Ad = jnp.diagonal(alb, axis1=-2, axis2=-1)
            inv = 1.0 / (1.0 - Ad * Rd)
            alb_d = Rd + Td * Td * Ad * inv
            src_below = SU + Td * (src + Ad * SD) * inv
            alb_below = alb_d[..., None] * eye
        is_clear = clear_lay[:, lev][:, None, None, None]
        alb_below = jnp.where(is_clear & ~reg00, 0.0, alb_below)
        src_below = jnp.where(is_clear[..., 0] & ~reg0v, 0.0, src_below)

        both_clear4 = (clear_lay[:, lev]
                       & clear_prev[:, lev])[:, None, None, None]
        um = u_mat[:, lev]
        vm = v_mat[:, lev]
        src_mixed = jnp.einsum("cij,cgj->cgi", um, src_below)
        if cfg.do_3d_lw_multilayer_effects:
            alb_mixed = jnp.einsum("cij,cgjk,ckl->cgil", um, alb_below,
                                   vm)
        else:
            diag_vals = jnp.einsum(
                "cgj,cjk->cgk",
                jnp.diagonal(alb_below, axis1=-2, axis2=-1), vm)
            alb_mixed = diag_vals[..., None] * eye
        alb_new = jnp.where(both_clear4, alb_below, alb_mixed)
        src_new = jnp.where(both_clear4[..., 0], src_below, src_mixed)
        return (alb_new, src_new), (alb, src)

    levels_rev = jnp.arange(nlev - 1, -1, -1)
    (alb_top, src_top), (alb_hist, src_hist) = jax.lax.scan(
        up_body, (alb0, src0), levels_rev)
    alb_below_layer = jnp.flip(jnp.moveaxis(alb_hist, 0, 1), 1)
    src_below_layer = jnp.flip(jnp.moveaxis(src_hist, 0, 1), 1)

    # ---------------- downward pass ---------------------------------------
    fdn0 = jnp.zeros((ncol, ng, nreg), dtype)

    def dn_body(carry, lev):
        flux_dn = carry
        R = ref[:, lev]
        T = trans[:, lev]
        SD = sdn[:, lev]
        alb_b = alb_below_layer[:, lev]
        src_b = src_below_layer[:, lev]
        eye = jnp.eye(nreg, dtype=dtype)
        if use_matrix:
            denom = eye - R @ alb_b
            rhs = (jnp.einsum("cgij,cgj->cgi", T, flux_dn)
                   + jnp.einsum("cgij,cgj->cgi", R, src_b) + SD)
            fdn_above = jnp.linalg.solve(denom, rhs[..., None])[..., 0]
            fup_above = jnp.einsum("cgij,cgj->cgi", alb_b,
                                   fdn_above) + src_b
        else:
            Rd = jnp.diagonal(R, axis1=-2, axis2=-1)
            Td = jnp.diagonal(T, axis1=-2, axis2=-1)
            Ad = jnp.diagonal(alb_b, axis1=-2, axis2=-1)
            fdn_above = (Td * flux_dn + Rd * src_b + SD) / (
                1.0 - Rd * Ad)
            fup_above = src_b + Ad * fdn_above
        is_clear = clear_lay[:, lev][:, None, None]
        fdn_above = jnp.where(is_clear & ~reg0v, 0.0, fdn_above)
        fup_above = jnp.where(is_clear & ~reg0v, 0.0, fup_above)
        next_clear = jnp.where(lev + 1 < nlev,
                               clear_lay[:, jnp.minimum(lev + 1,
                                                        nlev - 1)], True)
        both_clear = (clear_lay[:, lev] & next_clear)[:, None, None]
        vm = v_mat[:, lev + 1]
        fdn_mixed = jnp.einsum("cij,cgj->cgi", vm, fdn_above)
        fdn_out = jnp.where(both_clear, fdn_above, fdn_mixed)
        return fdn_out, (fup_above, fdn_out)

    _, (fup_hist, fdn_hist) = jax.lax.scan(dn_body, fdn0,
                                           jnp.arange(nlev))
    up_prof = jnp.concatenate(
        [src_top.sum(-1)[:, None, :],
         jnp.moveaxis(fup_hist.sum(-1), 0, 1)], axis=1)
    dn_prof = jnp.concatenate(
        [jnp.zeros((ncol, 1, ng), dtype),
         jnp.moveaxis(fdn_hist.sum(-1), 0, 1)], axis=1)
    total = LwFluxes(up=up_prof, dn=dn_prof)

    # ---------------- clear sky -------------------------------------------
    from .adding import adding_lw, lw_no_scattering_fluxes
    if cfg.do_lw_aerosol_scattering:
        up_c, dn_c = adding_lw(rc, tc, suc, sdc, emission, albedo)
    else:
        up_c, dn_c = lw_no_scattering_fluxes(tc, suc, sdc, emission,
                                             albedo)
    clear = LwFluxes(up=up_c, dn=dn_c)
    return total, clear, tcc
