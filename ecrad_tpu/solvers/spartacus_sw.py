"""SPARTACUS shortwave solver: 3-D radiative transfer via matrix
exponentials of region-coupled two-stream operators.

Reference parity: radiation/radiation_spartacus_sw.F90:65-1779 —
cloud edge length from effective size (:434-478), lateral transfer rates
(:560-600), Gamma-matrix assembly over (diffuse up/dn, direct) blocks
(:708-792), matrix exponential -> layer reflectance/transmittance
matrices (:793-830), upward total-albedo accumulation with entrapment
treatments Zero/Edge-only/Explicit/Non-fractal/Maximum (:930-1430
incl. step_migrations for horizontal migration distances), downward flux
pass (:1484-1650).

TPU mapping: all columns/g-points batched; levels via lax.scan; the
reference's per-layer ng3D prefix (g-points ordered by od) becomes a
per-(col,lev,g) mask selecting the matrix-exponential result vs the
Meador-Weaver fallback.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Entrapment, PdfShape, RadiationConfig
from . import two_stream as ts
from .cloudless import SwFluxes
from .matrix import expm, fast_expm_exchange_2, fast_expm_exchange_3
from .tripleclouds import calc_overlap_matrices, calc_region_properties

FOUR_OVER_PI = 4.0 / np.pi
R_OVER_G = 287.0 / 9.80665
MIN_MU0_3D = 0.06
# tan of the effective diffuse zenith angle (reference: diffusivity 2 ->
# tan(acos(1/2)) = sqrt(3); radiation_spartacus_sw.F90 tan_diffuse_angle_3d)
TAN_DIFFUSE_ANGLE_3D = np.sqrt(3.0)


def _edge_length(cfg: RadiationConfig, cloud, reg_fracs):
    """Cloud edge length per interface type (ncol, nlev, 3)
    (radiation_spartacus_sw.F90:434-478)."""
    inv_size = jnp.minimum(cloud.inv_cloud_effective_size,
                           1.0 / cfg.min_cloud_effective_size)
    f1 = reg_fracs[:, :, 0]
    e1 = FOUR_OVER_PI * f1 * (1.0 - f1) * inv_size
    if cloud.inv_inhom_effective_size is not None:
        inv_inhom = jnp.minimum(cloud.inv_inhom_effective_size,
                                1.0 / cfg.min_cloud_effective_size)
    else:
        inv_inhom = inv_size
    f3 = reg_fracs[:, :, 2]
    e2 = FOUR_OVER_PI * f3 * (1.0 - f3) * inv_inhom
    if cfg.clear_to_thick_fraction > 0.0:
        e3 = cfg.clear_to_thick_fraction * jnp.minimum(e1, e2)
        e1 = e1 - e3
        e2 = e2 - e3
    else:
        e3 = jnp.zeros_like(e1)
    active = cloud.inv_cloud_effective_size > 0.0
    zero = jnp.zeros_like(e1)
    return jnp.stack([jnp.where(active, e1, zero),
                      jnp.where(active, e2, zero),
                      jnp.where(active, e3, zero)], axis=-1)


def _layer_depth(thermo):
    p = thermo.pressure_hl
    t = thermo.temperature_hl
    return (R_OVER_G * (p[:, 1:] - p[:, :-1]) * (t[:, :-1] + t[:, 1:])
            / jnp.maximum(p[:, :-1] + p[:, 1:], 1e-3))


def _transfer_rates(cfg, reg_fracs, edge_len, dz, tan_sza):
    """Lateral transfer rates (ncol, nlev, 3, 3) for direct & diffuse
    (radiation_spartacus_sw.F90:560-600). tan_sza: (ncol,)."""
    ncol, nlev, nreg = reg_fracs.shape
    eps = 1.2e-7

    def rates(tan_angle):
        tr = jnp.zeros((ncol, nlev, nreg, nreg), reg_fracs.dtype)
        for jreg in range(nreg - 1):
            f_up = reg_fracs[:, :, jreg]
            f_dn = reg_fracs[:, :, jreg + 1]
            base = dz * edge_len[:, :, jreg] * tan_angle
            tr = tr.at[:, :, jreg, jreg + 1].set(
                jnp.where(f_up > eps, base / jnp.maximum(f_up, eps), 0.0))
            tr = tr.at[:, :, jreg + 1, jreg].set(
                jnp.where(f_dn > eps, base / jnp.maximum(f_dn, eps), 0.0))
        # direct clear<->thick interface
        base3 = dz * edge_len[:, :, 2] * tan_angle
        has3 = edge_len[:, :, 2] > 0.0
        f1 = reg_fracs[:, :, 0]
        f3 = reg_fracs[:, :, 2]
        tr = tr.at[:, :, 0, 2].set(
            jnp.where(has3 & (f1 > eps), base3 / jnp.maximum(f1, eps),
                      0.0))
        tr = tr.at[:, :, 2, 0].set(
            jnp.where(has3 & (f3 > eps), base3 / jnp.maximum(f3, eps),
                      0.0))
        return jnp.minimum(tr, cfg.max_3d_transfer_rate)

    tr_dir = rates(tan_sza[:, None, None, None]
                   if tan_sza.ndim == 1 else tan_sza)
    tr_diff = rates(TAN_DIFFUSE_ANGLE_3D)
    return tr_dir, tr_diff


def _gamma_reftrans(cfg, mu0, od_r, ssa_r, g_r, tr_dir, tr_diff,
                    use_3d_mask):
    """Per-layer region-coupled reflectance/transmittance matrices.

    od_r/ssa_r/g_r: (..., nreg, ng); tr_*: (..., nreg, nreg) broadcast;
    mu0: (...,) broadcastable. Returns 5 matrices (..., ng, nreg, nreg):
    ref, trans, ref_dir, trans_dir_diff, trans_dir_dir.
    """
    nreg = od_r.shape[-2]
    ng = od_r.shape[-1]
    one_over_mu0 = 1.0 / mu0

    gamma1, gamma2, gamma3 = ts.sw_gammas(mu0[..., None, None], ssa_r,
                                          g_r)
    # Gamma blocks, (..., ng, 3nreg, 3nreg): move g before regions
    odm = jnp.moveaxis(od_r, -2, -1)[..., None]     # (..., ng, nreg, 1)
    od_g = jnp.moveaxis(od_r, -2, -1)               # (..., ng, nreg)
    ssa_g = jnp.moveaxis(ssa_r, -2, -1)
    g1 = jnp.moveaxis(gamma1, -2, -1)
    g2 = jnp.moveaxis(gamma2, -2, -1)
    g3 = jnp.moveaxis(gamma3, -2, -1)

    batch = od_g.shape[:-1]
    n3 = 3 * nreg
    G = jnp.zeros(batch + (n3, n3), od_r.dtype)
    idx = jnp.arange(nreg)
    # diagonal region blocks
    diag = jax.vmap  # noqa: readable below via at[] updates
    for r in range(nreg):
        G = G.at[..., r, r].add(od_g[..., r] * g1[..., r])
        G = G.at[..., nreg + r, r].add(od_g[..., r] * g2[..., r])
        G = G.at[..., r, 2 * nreg + r].add(
            -od_g[..., r] * ssa_g[..., r] * g3[..., r])
        G = G.at[..., nreg + r, 2 * nreg + r].add(
            od_g[..., r] * ssa_g[..., r] * (1.0 - g3[..., r]))
        G = G.at[..., 2 * nreg + r, 2 * nreg + r].add(
            -od_g[..., r] * one_over_mu0[..., None])
    # lateral exchange (adjacent regions)
    trd = tr_dir[..., None, :, :]   # broadcast over g
    trf = tr_diff[..., None, :, :]
    for r in range(nreg - 1):
        G = G.at[..., r, r].add(trf[..., r, r + 1])
        G = G.at[..., r + 1, r + 1].add(trf[..., r + 1, r])
        G = G.at[..., r + 1, r].add(-trf[..., r, r + 1])
        G = G.at[..., r, r + 1].add(-trf[..., r + 1, r])
        G = G.at[..., 2 * nreg + r, 2 * nreg + r].add(-trd[..., r, r + 1])
        G = G.at[..., 2 * nreg + r + 1, 2 * nreg + r + 1].add(
            -trd[..., r + 1, r])
        G = G.at[..., 2 * nreg + r + 1, 2 * nreg + r].add(
            trd[..., r, r + 1])
        G = G.at[..., 2 * nreg + r, 2 * nreg + r + 1].add(
            trd[..., r + 1, r])
    if nreg == 3:
        # clear<->thick direct interface
        G = G.at[..., 0, 0].add(trf[..., 0, 2])
        G = G.at[..., 2, 2].add(trf[..., 2, 0])
        G = G.at[..., 2, 0].add(-trf[..., 0, 2])
        G = G.at[..., 0, 2].add(-trf[..., 2, 0])
        G = G.at[..., 2 * nreg, 2 * nreg].add(-trd[..., 0, 2])
        G = G.at[..., 2 * nreg + 2, 2 * nreg + 2].add(-trd[..., 2, 0])
        G = G.at[..., 2 * nreg + 2, 2 * nreg].add(trd[..., 0, 2])
        G = G.at[..., 2 * nreg, 2 * nreg + 2].add(trd[..., 2, 0])
    # antisymmetric blocks
    G = G.at[..., nreg:2 * nreg, nreg:2 * nreg].set(
        -G[..., :nreg, :nreg])
    G = G.at[..., :nreg, nreg:2 * nreg].set(
        -G[..., nreg:2 * nreg, :nreg])

    E = expm(G)
    tdd = jnp.clip(E[..., 2 * nreg:, 2 * nreg:], 0.0, 1.0)
    A = E[..., :nreg, :nreg]
    B = E[..., :nreg, nreg:2 * nreg]
    C = E[..., :nreg, 2 * nreg:]
    ref = jnp.clip(-jnp.linalg.solve(A, B), 0.0, 1.0)
    trans = jnp.clip(E[..., nreg:2 * nreg, :nreg] @ ref
                     + E[..., nreg:2 * nreg, nreg:2 * nreg], 0.0, 1.0)
    refdir = jnp.clip(-jnp.linalg.solve(A, C), 0.0,
                      mu0[..., None, None, None])
    tdiff = jnp.clip(E[..., nreg:2 * nreg, :nreg] @ refdir
                     + E[..., nreg:2 * nreg, 2 * nreg:], 0.0,
                     mu0[..., None, None, None])
    return ref, trans, refdir, tdiff, tdd


def solver_spartacus_sw(setup, single_level, thermodynamics, cloud,
                        od, ssa, g, od_cloud, ssa_cloud, g_cloud,
                        incoming_sw, albedo_diffuse, albedo_direct):
    cfg: RadiationConfig = setup.config
    band_from_g = setup.spec.band_from_reordered_g_sw
    ncol, nlev, ng = od.shape
    nreg = cfg.nregions
    dtype = od.dtype
    cos_sza = single_level.cos_sza
    mu0 = jnp.maximum(cos_sza, 1e-10)
    one_over_mu0 = 1.0 / mu0
    tan_sza = jnp.where(
        mu0 < MIN_MU0_3D,
        np.sqrt(1.0 / (MIN_MU0_3D * MIN_MU0_3D) - 1.0),
        jnp.where(one_over_mu0 > 1.0,
                  jnp.sqrt(jnp.maximum(one_over_mu0 ** 2 - 1.0
                                       + cfg.overhead_sun_factor, 0.0)),
                  jnp.sqrt(jnp.asarray(cfg.overhead_sun_factor,
                                       dtype))))

    reg_fracs, od_scaling = calc_region_properties(
        nreg, cfg.i_cloud_pdf_shape == PdfShape.GAMMA, cloud.fraction,
        cloud.fractional_std, cfg.cloud_fraction_threshold)
    u_mat, v_mat, tcc = calc_overlap_matrices(
        reg_fracs, cloud.overlap_param, cfg.cloud_inhom_decorr_scaling,
        cfg.cloud_fraction_threshold, cfg.use_beta_overlap)

    dz = _layer_depth(thermodynamics)             # (ncol, nlev)
    if cloud.inv_cloud_effective_size is not None and cfg.do_3d_effects:
        edge_len = _edge_length(cfg, cloud, reg_fracs)
    else:
        edge_len = jnp.zeros((ncol, nlev, 3), dtype)
    tr_dir, tr_diff = _transfer_rates(cfg, reg_fracs, edge_len, dz,
                                      tan_sza[:, None])
    # no 3D transfer in effectively-overcast 2-region layers
    cloudy = cloud.fraction > 0.0
    has_3d = cloudy & (edge_len[:, :, 0] > 0.0)
    tr_dir = jnp.where(has_3d[:, :, None, None], tr_dir, 0.0)
    tr_diff = jnp.where(has_3d[:, :, None, None], tr_diff, 0.0)

    # --- per-region optical properties -----------------------------------
    odc = od_cloud[:, :, band_from_g]
    ssac = ssa_cloud[:, :, band_from_g]
    gc = g_cloud[:, :, band_from_g]
    cloud_mask = cloudy[..., None]
    od_list, ssa_list, g_list = [od], [ssa], [g]
    for r in range(1, nreg):
        s = od_scaling[:, :, r][..., None]
        odc_r = odc * s
        od_t = jnp.minimum(od + odc_r, cfg.max_cloud_od)
        scat = ssa * od + ssac * odc_r
        ssa_t = jnp.where(od + odc_r > 0,
                          scat / jnp.maximum(od + odc_r, 1e-30), 0.0)
        g_t = jnp.where(scat > 0,
                        (g * ssa * od + gc * ssac * odc_r)
                        / jnp.maximum(scat, 1e-30), 0.0)
        od_list.append(jnp.where(cloud_mask, od_t, od))
        ssa_list.append(jnp.where(cloud_mask, ssa_t, ssa))
        g_list.append(jnp.where(cloud_mask, g_t, g))
    od_r = jnp.stack(od_list, axis=2)    # (ncol, nlev, nreg, ng)
    ssa_r = jnp.stack(ssa_list, axis=2)
    g_r = jnp.stack(g_list, axis=2)

    # --- layer reflectance/transmittance matrices -------------------------
    # 3D (expm) path with od capped for stability:
    od_r_capped = od_r.at[:, :, 0, :].set(
        jnp.minimum(od_r[:, :, 0, :], cfg.max_gas_od_3d))
    ref3, trans3, refdir3, tdiff3, tdd3 = _gamma_reftrans(
        cfg, mu0[:, None], od_r_capped, ssa_r, g_r, tr_dir, tr_diff,
        has_3d)
    # Meador-Weaver fallback per region (diagonal matrices)
    g1, g2, g3 = ts.sw_gammas(mu0[:, None, None, None], ssa_r, g_r)
    rmw, tmw, rdmw, tdmw, tddmw = ts.sw_reftrans(
        mu0[:, None, None, None], od_r, ssa_r, g1, g2, g3)

    def diag_embed(x):
        # x: (ncol, nlev, nreg, ng) -> (ncol, nlev, ng, nreg, nreg)
        xg = jnp.moveaxis(x, 2, -1)
        return xg[..., :, None] * jnp.eye(nreg, dtype=dtype)

    # selection: expm results where 3D is active for this (col,lev) AND
    # gas od below the 3D cap (or use_expm_everywhere)
    g_ok = od[:, :, :] <= cfg.max_gas_od_3d          # (ncol, nlev, ng)
    use3d = (has_3d[..., None] | cfg.use_expm_everywhere) & g_ok
    sel = use3d[..., None, None]                      # (ncol,nlev,ng,1,1)

    # MW values slot in directly: both formulations take perpendicular
    # direct flux and emit horizontal diffuse flux (reference assigns
    # ref_dir_clear into the matrix diagonal unscaled, :819-846)
    ref = jnp.where(sel, ref3, diag_embed(rmw))
    trans = jnp.where(sel, trans3, diag_embed(tmw))
    ref_dir = jnp.where(sel, refdir3, diag_embed(rdmw))
    tdiff = jnp.where(sel, tdiff3, diag_embed(tdmw))
    tdd = jnp.where(sel, tdd3, diag_embed(tddmw))

    # clear layers: zero the cloudy regions
    clear_lay = ~cloudy
    reg_eye = jnp.eye(nreg, dtype=bool)
    reg00 = jnp.zeros((nreg, nreg), bool).at[0, 0].set(True)
    clear_sel = clear_lay[:, :, None, None, None]
    keep00 = reg00[None, None, None]
    ref = jnp.where(clear_sel & ~keep00, 0.0, ref)
    trans = jnp.where(clear_sel & ~keep00, 0.0, trans)
    ref_dir = jnp.where(clear_sel & ~keep00, 0.0, ref_dir)
    tdiff = jnp.where(clear_sel & ~keep00, 0.0, tdiff)
    tdd = jnp.where(clear_sel & ~keep00, 0.0, tdd)

    # clear-sky (ICA) properties per layer
    rc, tc, rdc, tdc, tddc = (rmw[:, :, 0], tmw[:, :, 0], rdmw[:, :, 0],
                              tdmw[:, :, 0], tddmw[:, :, 0])

    clear_prev = jnp.concatenate(
        [jnp.ones((ncol, 1), bool), clear_lay[:, :-1]], axis=1)
    inv_eff_prev = jnp.concatenate(
        [cloud.inv_cloud_effective_size[:, :1],
         cloud.inv_cloud_effective_size[:, :-1]], axis=1) \
        if cloud.inv_cloud_effective_size is not None else \
        jnp.zeros((ncol, nlev), dtype)
    overlap_prev = jnp.concatenate(
        [jnp.ones((ncol, 1), dtype), cloud.overlap_param], axis=1)

    entrap = cfg.i_3d_sw_entrapment

    # ---------------- upward pass -----------------------------------------
    alb0 = (albedo_diffuse[:, :, None, None]
            * jnp.eye(nreg, dtype=dtype))           # (ncol, ng, nreg, nreg)
    albdir0 = ((mu0[:, None] * albedo_direct)[:, :, None, None]
               * jnp.eye(nreg, dtype=dtype))
    x0 = jnp.zeros((ncol, ng, nreg), dtype)

    x_layer_diffuse = dz * TAN_DIFFUSE_ANGLE_3D / np.sqrt(2.0)
    x_layer_direct = dz * jnp.sqrt(tan_sza[:, None] ** 2
                                   + TAN_DIFFUSE_ANGLE_3D ** 2) * 0.5

    def up_body(carry, lev):
        alb, albdir, x_diff, x_dir = carry
        R = ref[:, lev]
        T = trans[:, lev]
        RD = ref_dir[:, lev]
        TD = tdiff[:, lev]
        TDD = tdd[:, lev]
        eye = jnp.eye(nreg, dtype=dtype)
        denom = eye - alb @ R
        alb_below = R + T @ jnp.linalg.solve(denom, alb @ T)
        albdir_below = RD + T @ jnp.linalg.solve(
            denom, albdir @ TDD + alb @ TD)
        is_clear = clear_lay[:, lev][:, None, None, None]
        keep = reg00[None, None]
        alb_below = jnp.where(is_clear & ~keep, 0.0, alb_below)
        albdir_below = jnp.where(is_clear & ~keep, 0.0, albdir_below)

        # migration distances (Explicit/Non-fractal entrapment)
        if entrap in (Entrapment.EXPLICIT,
                      Entrapment.EXPLICIT_NON_FRACTAL):
            x_diff, x_dir = _step_migrations(
                cfg, nreg, cloud.fraction[:, lev], dz[:, lev],
                tan_sza, R, T, RD, TDD, TD, alb, albdir, x_diff, x_dir,
                x_layer_diffuse[:, lev], x_layer_direct[:, lev])

        vm = v_mat[:, lev]    # (ncol, nreg, nreg); interface above layer
        um = u_mat[:, lev]

        both_clear = (clear_lay[:, lev]
                      & clear_prev[:, lev])[:, None, None, None]

        if entrap == Entrapment.MAXIMUM:
            mixed = jnp.einsum("cij,cgjk,ckl->cgil", um, alb_below, vm)
            mixed_dir = jnp.einsum("cij,cgjk,ckl->cgil", um,
                                   albdir_below, vm)
        elif entrap == Entrapment.ZERO:
            col_sum = alb_below.sum(axis=-2)        # (ncol, ng, nreg)
            diag_new = jnp.einsum("cgj,cjk->cgk", col_sum, vm)
            mixed = diag_new[..., None] * jnp.eye(nreg, dtype=dtype)
            col_sum_d = albdir_below.sum(axis=-2)
            diag_new_d = jnp.einsum("cgj,cjk->cgk", col_sum_d, vm)
            mixed_dir = diag_new_d[..., None] * jnp.eye(nreg, dtype=dtype)
        else:
            # Edge-only & Explicit share the off-diagonal exchange part
            offdiag = alb_below * (1.0 - jnp.eye(nreg, dtype=dtype))
            mixed = jnp.einsum("cij,cgjk,ckl->cgil", um, offdiag, vm)
            offdiag_d = albdir_below * (1.0 - jnp.eye(nreg, dtype=dtype))
            mixed_dir = jnp.einsum("cij,cgjk,ckl->cgil", um, offdiag_d,
                                   vm)
            if entrap == Entrapment.EDGE_ONLY or not cfg.do_3d_effects:
                diag_vals = jnp.einsum(
                    "cgj,cjk->cgk",
                    jnp.diagonal(alb_below, axis1=-2, axis2=-1), vm)
                mixed = mixed + diag_vals[..., None] * jnp.eye(
                    nreg, dtype=dtype)
                diag_vals_d = jnp.einsum(
                    "cgj,cjk->cgk",
                    jnp.diagonal(albdir_below, axis1=-2, axis2=-1), vm)
                mixed_dir = mixed_dir + diag_vals_d[..., None] * jnp.eye(
                    nreg, dtype=dtype)
            else:
                # Explicit entrapment: horizontal homogenization within
                # the lower regions, spread by exp of an exchange matrix
                mixed = mixed + _explicit_entrapment(
                    cfg, nreg, lev, alb_below, x_diff, vm, um, edge_len,
                    inv_eff_prev, overlap_prev, reg_fracs, dtype)
                mixed_dir = mixed_dir + _explicit_entrapment(
                    cfg, nreg, lev, albdir_below, x_dir, vm, um,
                    edge_len, inv_eff_prev, overlap_prev, reg_fracs,
                    dtype)

        alb_keep = jnp.where(both_clear, alb_below, mixed)
        albdir_keep = jnp.where(both_clear, albdir_below, mixed_dir)

        # mix x migration distances through V
        if entrap in (Entrapment.EXPLICIT,
                      Entrapment.EXPLICIT_NON_FRACTAL):
            x_diff_m = jnp.einsum("cjk,cgj->cgk", v_mat[:, lev], x_diff)
            x_dir_m = jnp.einsum("cjk,cgj->cgk", v_mat[:, lev], x_dir)
            both2 = both_clear[..., 0]
            x_diff = jnp.where(both2, x_diff, x_diff_m)
            x_dir = jnp.where(both2, x_dir, x_dir_m)

        return (alb_keep, albdir_keep, x_diff, x_dir), (alb, albdir)

    levels_rev = jnp.arange(nlev - 1, -1, -1)
    (alb_top, albdir_top, _, _), (alb_hist, albdir_hist) = jax.lax.scan(
        up_body, (alb0, albdir0, x0, x0), levels_rev)
    alb_below_layer = jnp.flip(jnp.moveaxis(alb_hist, 0, 1), 1)
    albdir_below_layer = jnp.flip(jnp.moveaxis(albdir_hist, 0, 1), 1)

    # ---------------- downward pass ---------------------------------------
    direct0 = incoming_sw[:, :, None] * reg_fracs[:, 0, None, :]
    # direct0: (ncol, ng, nreg)
    fup0 = jnp.einsum("cgij,cgj->cgi", albdir_top, direct0)

    def dn_body(carry, lev):
        flux_dn, direct_dn = carry     # (ncol, ng, nreg)
        R = ref[:, lev]
        T = trans[:, lev]
        RD = ref_dir[:, lev]
        TD = tdiff[:, lev]
        TDD = tdd[:, lev]
        alb_b = alb_below_layer[:, lev]
        albdir_b = albdir_below_layer[:, lev]
        source_dn = jnp.einsum("cgij,cgj->cgi", TD, direct_dn)
        direct_above = jnp.einsum("cgij,cgj->cgi", TDD, direct_dn)
        eye = jnp.eye(nreg, dtype=dtype)
        denom = eye - R @ alb_b
        total_source = jnp.einsum("cgij,cgj->cgi", albdir_b,
                                  direct_above)
        rhs = (jnp.einsum("cgij,cgj->cgi", T, flux_dn)
               + jnp.einsum("cgij,cgj->cgi", R, total_source)
               + source_dn)
        fdn_above = jnp.linalg.solve(denom, rhs[..., None])[..., 0]
        fup_above = jnp.einsum("cgij,cgj->cgi", alb_b,
                               fdn_above) + total_source
        is_clear = clear_lay[:, lev][:, None, None]
        reg0 = (jnp.arange(nreg) == 0)[None, None, :]
        fdn_above = jnp.where(is_clear & ~reg0, 0.0, fdn_above)
        fup_above = jnp.where(is_clear & ~reg0, 0.0, fup_above)
        direct_above = jnp.where(is_clear & ~reg0, 0.0, direct_above)
        next_clear = jnp.where(lev + 1 < nlev,
                               clear_lay[:, jnp.minimum(lev + 1,
                                                        nlev - 1)], True)
        both_clear = (clear_lay[:, lev] & next_clear)[:, None, None]
        vm = v_mat[:, lev + 1]
        fdn_mixed = jnp.einsum("cij,cgj->cgi", vm, fdn_above)
        ddn_mixed = jnp.einsum("cij,cgj->cgi", vm, direct_above)
        fdn_out = jnp.where(both_clear, fdn_above, fdn_mixed)
        ddn_out = jnp.where(both_clear, direct_above, ddn_mixed)
        return (fdn_out, ddn_out), (fup_above, fdn_above, direct_above)

    (_, _), (fup_hist, fdn_hist, ddn_hist) = jax.lax.scan(
        dn_body, (jnp.zeros_like(direct0), direct0), jnp.arange(nlev))

    up_prof = jnp.concatenate(
        [fup0.sum(-1)[:, None, :],
         jnp.moveaxis(fup_hist.sum(-1), 0, 1)], axis=1)
    dn_diff_prof = jnp.concatenate(
        [jnp.zeros((ncol, 1, ng), dtype),
         jnp.moveaxis(fdn_hist.sum(-1), 0, 1)], axis=1)
    dn_dir_prof = jnp.concatenate(
        [direct0.sum(-1)[:, None, :],
         jnp.moveaxis(ddn_hist.sum(-1), 0, 1)],
        axis=1) * mu0[:, None, None]
    total = SwFluxes(up=up_prof, dn_diffuse=dn_diff_prof,
                     dn_direct=dn_dir_prof)

    # ---------------- clear sky -------------------------------------------
    from .adding import adding_sw
    up_c, dnd_c, dndir_c = adding_sw(rc, tc, rdc, tdc, tddc, incoming_sw,
                                     albedo_diffuse, albedo_direct, mu0)
    clear = SwFluxes(up=up_c, dn_diffuse=dnd_c, dn_direct=dndir_c)

    daylight = (cos_sza > 1.0e-10)[:, None, None]
    total = SwFluxes(*(jnp.where(daylight, f, 0.0) for f in total))
    clear = SwFluxes(*(jnp.where(daylight, f, 0.0) for f in clear))
    tcc = jnp.where(cos_sza > 1.0e-10, tcc, -1.0)
    return total, clear, tcc


def _step_migrations(cfg, nreg, cloud_frac, dz, tan_sza, R, T, RD, TDD,
                     TD, alb, albdir, x_diffuse, x_direct,
                     x_layer_diffuse, x_layer_direct):
    """Update horizontal migration distances
    (radiation_spartacus_sw.F90 step_migrations)."""
    xl_diff = x_layer_diffuse[:, None]   # (ncol, 1)
    xl_dir = x_layer_direct[:, None]
    Rd = jnp.diagonal(R, axis1=-2, axis2=-1)        # (ncol, ng, nreg)
    Td = jnp.diagonal(T, axis1=-2, axis2=-1)
    RDd = jnp.diagonal(RD, axis1=-2, axis2=-1)
    TDDd = jnp.diagonal(TDD, axis1=-2, axis2=-1)
    TDd = jnp.diagonal(TD, axis1=-2, axis2=-1)
    Ad = jnp.diagonal(alb, axis1=-2, axis2=-1)
    ADd = jnp.diagonal(albdir, axis1=-2, axis2=-1)

    ms = Td / jnp.maximum(1.0 - Rd * Ad, 1e-12)
    x_enh = jnp.maximum(1.0 - Rd * Ad, 1e-12) ** (-1.5)

    top_alb_dir = jnp.maximum(1e-8, RDd + ms * (TDd * Ad + TDDd * ADd))
    x_dir_new = jnp.maximum(0.0, xl_dir[..., None] + (
        (TDd * Ad * x_enh + TDDd * ADd * (x_enh - 1.0))
        * (x_diffuse + xl_diff[..., None])
        + TDDd * ADd * (x_direct + xl_dir[..., None])) * Td
        / top_alb_dir)

    top_alb = jnp.maximum(1e-8, Rd + ms * Td * Ad)
    x_diff_new = xl_diff[..., None] + x_enh * Ad * Td * Td * (
        x_diffuse + xl_diff[..., None]) / top_alb

    # region activity per reference (cloud_frac bounds)
    frac = cloud_frac[:, None, None]
    act_first = frac < 1.0
    act_cloudy = frac > 0.0
    reg_idx = jnp.arange(nreg)[None, None, :]
    active = jnp.where(reg_idx == 0, act_first, act_cloudy)
    x_dir_new = jnp.where(active, x_dir_new, 0.0)
    x_diff_new = jnp.where(active, x_diff_new, 0.0)
    return x_diff_new, x_dir_new


def _explicit_entrapment(cfg, nreg, lev, alb_below, x_migration, vm, um,
                         edge_len, inv_eff_prev, overlap_prev, reg_fracs,
                         dtype):
    """Explicit/Non-fractal entrapment contribution to the total albedo
    (radiation_spartacus_sw.F90:1160-1330).

    For each lower region jreg2, build an exchange matrix from the
    migration distance and upper-layer edge lengths, exponentiate
    analytically, and distribute the diagonal albedo terms."""
    ncol = alb_below.shape[0]
    entrap_total = 0.0
    # transfer scaling uses the overlap with the layer above (lev-1)
    lev_prev = jnp.maximum(lev - 1, 0)
    edge_prev = edge_len[:, lev_prev]     # (ncol, 3) edge of layer above
    inv_eff = jnp.minimum(inv_eff_prev[:, lev],
                          1.0 / cfg.min_cloud_effective_size)
    for jreg2 in range(nreg):
        f_this = reg_fracs[:, lev, jreg2]
        f_prev = reg_fracs[:, lev_prev, jreg2]
        transfer_scaling = 1.0 - (1.0 - cfg.overhang_factor) \
            * overlap_prev[:, lev] * jnp.minimum(f_this, f_prev) \
            / jnp.maximum(cfg.cloud_fraction_threshold, f_this)
        transfer_scaling = jnp.where(lev > 0, transfer_scaling, 0.0)

        # exchange rates between upper regions via this lower region
        rates = []
        for jreg in range(nreg - 1):
            r_fwd = transfer_scaling * edge_prev[:, jreg] \
                / jnp.maximum(um[:, jreg, jreg2], 1e-5)
            r_bwd = transfer_scaling * edge_prev[:, jreg] \
                / jnp.maximum(um[:, jreg + 1, jreg2], 1e-5)
            rates.append((r_fwd, r_bwd))

        x2 = x_migration[:, :, jreg2]     # (ncol, ng)
        if cfg.i_3d_sw_entrapment == Entrapment.EXPLICIT:
            fractal = 1.0 / jnp.sqrt(jnp.maximum(
                1.0, 2.5 * x2 * inv_eff[:, None]))
        else:
            fractal = 1.0
        a = rates[0][0][:, None] * x2 * fractal   # entrapment(2,1)
        b = rates[0][1][:, None] * x2 * fractal   # entrapment(1,2)
        if nreg == 3:
            c = rates[1][0][:, None] * x2 * fractal
            d = rates[1][1][:, None] * x2 * fractal
            # cap: -min(diag) = max(a, b + c) (reference :1210-1216)
            max_entr = jnp.maximum(a, b + c)
            scale = jnp.where(max_entr > cfg.max_cloud_od,
                              cfg.max_cloud_od
                              / jnp.maximum(max_entr, 1e-12), 1.0)
            a, b, c, d = a * scale, b * scale, c * scale, d * scale
            P = fast_expm_exchange_3(a, b, c, d)   # (ncol, ng, 3, 3)
        else:
            max_entr = jnp.maximum(a, b)
            scale = jnp.where(max_entr > cfg.max_cloud_od,
                              cfg.max_cloud_od
                              / jnp.maximum(max_entr, 1e-12), 1.0)
            a, b = a * scale, b * scale
            P = fast_expm_exchange_2(a, b)

        # albedo_part(:,j3,j) = P(j3,j) * v(jreg2,j) * alb(jreg2,jreg2)
        albdiag = alb_below[:, :, jreg2, jreg2]    # (ncol, ng)
        contrib = (P * vm[:, None, None, jreg2, :]
                   * albdiag[:, :, None, None])
        entrap_total = entrap_total + contrib
    return entrap_total
