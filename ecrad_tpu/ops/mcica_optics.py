"""Fused McICA optics kernels: combine + reftrans + clear-reuse select.

The McICA solvers spend ~15 ms at 2048 columns (tools/profile_ops.py,
round 5) on four separate XLA stages per band family: the clear-sky
Meador-Weaver reftrans, combine_cloud_gas (cloud bands + per-g
subcolumn od scalings), the total-sky reftrans, and the clear-layer
where-select — each materializing full (ncol, nlev, ng) or g-first
intermediates in HBM, plus the legacy->g-first transposes between
them. This kernel runs the whole chain in VMEM per (level,
column-tile) block: it reads the legacy-layout gas/cloud/scaling
inputs, computes BOTH the clear and the masked total-sky layer
properties, and writes all outputs already transposed to the g-first
(nlev, ng, ncol) layout the adding sweeps consume (the taumol
cell-major trick) — one read of each input, one write of each output,
no HBM intermediates.

Band->g expansion uses a static one-hot (nb, ng) constant against the
MXU (per-lane gathers do not exist in Mosaic). Semantics are pinned
against the plain jnp path (solvers/mcica.py) by
tests/test_mcica_optics.py; reference parity:
radiation_mcica_sw.F90:220-274, radiation_mcica_lw.F90:39-361.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..optics.cloud import delta_eddington
from ..solvers import two_stream as ts

_LB = 128
_LV = 8       # levels per block (sublane-divisible)


def _onehot_band(band_from_g, nb, dtype=np.float32):
    ng = len(band_from_g)
    m = np.zeros((nb, ng), dtype)
    m[np.asarray(band_from_g), np.arange(ng)] = 1.0
    return m


def _expand(bands_lb, onehot):
    """(LB, nb) cloud-band values -> (LB, ng) per-g via one-hot MXU."""
    return jax.lax.dot_general(
        bands_lb, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _combine(od, ssa, g, odc, ssac, gc, mask):
    od_t = od + odc
    scat_gas = ssa * od
    scat_cld = ssac * odc
    scat_od = scat_gas + scat_cld
    ssa_t = jnp.where(od_t > 0.0,
                      scat_od / jnp.maximum(od_t, 1e-30), 0.0)
    g_t = jnp.where(scat_od > 0.0,
                    (g * scat_gas + gc * scat_cld)
                    / jnp.maximum(scat_od, 1e-30), 0.0)
    od_t = jnp.where(mask, od_t, od)
    ssa_t = jnp.where(mask, ssa_t, ssa)
    g_t = jnp.where(mask, g_t, g)
    return od_t, ssa_t, g_t


def _sw_chain(mu0, od, ssa, g, delta_all):
    if delta_all:
        od, ssa, g = delta_eddington(od, ssa, g)
    g1, g2, g3 = ts.sw_gammas(mu0, ssa, g)
    return ts.sw_reftrans(mu0, od, ssa, g1, g2, g3)


def sw_clear_total_reftrans(od, ssa, g, od_cloud, ssa_cloud, g_cloud,
                            band_from_g, od_scaling, frac_mask, mu0,
                            delta_all, use_pallas, interpret=False):
    """Clear + masked-total SW layer reflectances in one pass.

    od/ssa/g/od_scaling: (ncol, nlev, ng) legacy layout; *_cloud
    (ncol, nlev, nb); frac_mask (ncol, nlev) bool (layer cloudy);
    mu0 (ncol,). Returns 10 g-first (nlev, ng, ncol) arrays:
    (r_c, t_c, rd_c, tdd_c, tdir_c, r, t, rd, tdd, tdir) with the
    total-sky family already clear-reused where ~frac_mask."""
    ncol, nlev, ng = od.shape
    nb = od_cloud.shape[-1]
    onehot = jnp.asarray(_onehot_band(band_from_g, nb))

    if not use_pallas and not interpret:
        from ..optics.combine import combine_cloud_gas_sw
        from ..solvers.cloudless import _gf
        mu = jnp.maximum(mu0, 1e-10)[None, :]
        clear = _sw_chain(mu, _gf(od), _gf(ssa), _gf(g), delta_all)
        od_t, ssa_t, g_t = combine_cloud_gas_sw(
            od, ssa, g, od_cloud, ssa_cloud, g_cloud, band_from_g,
            od_scaling=od_scaling, cloud_mask=frac_mask[..., None])
        tot = _sw_chain(mu, _gf(od_t), _gf(ssa_t), _gf(g_t), delta_all)
        mg = jnp.moveaxis(frac_mask, 1, 0)[:, None, :]
        tot = tuple(jnp.where(mg, x, c) for x, c in zip(tot, clear))
        return clear + tot

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # blocks span _LV=8 levels (Mosaic needs sublane block dims
    # divisible by 8); the kernel loops the levels so only one
    # (LB, ng) chain of temporaries is live at a time. A non-dividing
    # final level block is masked by Pallas.
    ncol_pad = -(-ncol // _LB) * _LB
    nlb = -(-nlev // _LV)

    def padc(x, axis=0):
        if x.shape[axis] == ncol_pad:
            return x
        pw = [(0, 0)] * x.ndim
        pw[axis] = (0, ncol_pad - x.shape[axis])
        return jnp.pad(x, pw)

    mu_col = jnp.maximum(mu0, 1e-10)[:, None, None]    # (ncol, 1, 1)
    mask_f = frac_mask.astype(od.dtype)[..., None]     # (ncol,nlev,1)

    # two kernels to stay under the scoped-VMEM limit: the clear
    # family alone, and the masked total family which RECOMPUTES the
    # clear chain in VMEM for its select (pure VPU — no extra HBM)
    def clear_kernel(od_ref, ssa_ref, g_ref, mu_ref, *out_refs):
        mu = mu_ref[:, 0]

        def body(k, _):
            clear = _sw_chain(mu, od_ref[:, k], ssa_ref[:, k],
                              g_ref[:, k], delta_all)
            for ref, val in zip(out_refs, clear):
                ref[k] = val.T                          # (ng, LB)
            return 0

        # fori_loop (not a Python unroll): Mosaic's scoped-vmem
        # allocator does not reuse buffers across unrolled iterations
        # (measured 46 MB for 8 unrolled levels)
        jax.lax.fori_loop(0, _LV, body, 0)

    def total_kernel(od_ref, ssa_ref, g_ref, osc_ref, odc_ref,
                     ssac_ref, gc_ref, mk_ref, mu_ref, oh_ref,
                     *out_refs):
        mu = mu_ref[:, 0]                               # (LB, 1)

        def body(k, _):
            odb = od_ref[:, k]                          # (LB, ng)
            ssab = ssa_ref[:, k]
            gb = g_ref[:, k]
            mask = mk_ref[:, k] > 0.5                   # (LB, 1)
            odc = _expand(odc_ref[:, k], oh_ref[:]) * osc_ref[:, k]
            ssac = _expand(ssac_ref[:, k], oh_ref[:])
            gc = _expand(gc_ref[:, k], oh_ref[:])
            od_t, ssa_t, g_t = _combine(odb, ssab, gb, odc, ssac, gc,
                                        mask)
            clear = _sw_chain(mu, odb, ssab, gb, delta_all)
            tot = _sw_chain(mu, od_t, ssa_t, g_t, delta_all)
            tot = tuple(jnp.where(mask, x, c)
                        for x, c in zip(tot, clear))
            for ref, val in zip(out_refs, tot):
                ref[k] = val.T                          # (ng, LB)
            return 0

        jax.lax.fori_loop(0, _LV, body, 0)

    cell = lambda x: pl.BlockSpec((_LB, _LV, x.shape[-1]),
                                  lambda l, c: (c, l, 0),
                                  memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((_LB, 1, 1), lambda l, c: (c, 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs5 = [pl.BlockSpec((_LV, ng, _LB), lambda l, c: (l, 0, c),
                               memory_space=pltpu.VMEM)] * 5
    out_shape5 = [jax.ShapeDtypeStruct((nlb * _LV, ng, ncol_pad),
                                       jnp.float32)] * 5
    grid = (nlb, ncol_pad // _LB)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)
    clear5 = pl.pallas_call(
        clear_kernel, interpret=interpret, grid=grid,
        compiler_params=None if interpret else cparams,
        in_specs=[cell(od), cell(ssa), cell(g), mu_spec],
        out_specs=out_specs5, out_shape=out_shape5,
    )(padc(od), padc(ssa), padc(g), padc(mu_col))
    tot5 = pl.pallas_call(
        total_kernel, interpret=interpret, grid=grid,
        compiler_params=None if interpret else cparams,
        in_specs=[cell(od), cell(ssa), cell(g), cell(od_scaling),
                  cell(od_cloud), cell(ssa_cloud), cell(g_cloud),
                  cell(mask_f), mu_spec,
                  pl.BlockSpec((nb, ng), lambda l, c: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs5, out_shape=out_shape5,
    )(padc(od), padc(ssa), padc(g), padc(od_scaling), padc(od_cloud),
      padc(ssa_cloud), padc(g_cloud), padc(mask_f), padc(mu_col),
      onehot)
    return tuple(o[:nlev, :, :ncol] for o in clear5 + tot5)


def lw_clear_total_noscat(od, od_cloud, band_from_g, od_scaling,
                          frac_mask, planck_hl, use_pallas,
                          interpret=False):
    """Clear + masked-total LW no-scattering transmittance/sources in
    one pass (do_lw_cloud_scattering=False: cloud od is already
    absorption-only, radiation_mcica_lw.F90).

    od/od_scaling (ncol, nlev, ng); od_cloud (ncol, nlev, nb);
    planck_hl (ncol, nlev+1, ng); frac_mask (ncol, nlev) bool.
    Returns 6 g-first (nlev, ng, ncol): (t_c, su_c, sd_c, t, su, sd)
    with the total family clear-reused where ~frac_mask."""
    ncol, nlev, ng = od.shape
    nb = od_cloud.shape[-1]
    onehot = jnp.asarray(_onehot_band(band_from_g, nb))

    if not use_pallas and not interpret:
        from ..solvers.cloudless import _gf
        pt = _gf(planck_hl[:, :-1, :])
        pb = _gf(planck_hl[:, 1:, :])
        od_g = _gf(od)
        tc, suc, sdc = ts.lw_no_scattering_transmittance(od_g, pt, pb)
        odc = od_cloud[:, :, band_from_g] * od_scaling
        od_t = jnp.where(frac_mask[..., None], od + odc, od)
        t, su, sd = ts.lw_no_scattering_transmittance(_gf(od_t), pt, pb)
        mg = jnp.moveaxis(frac_mask, 1, 0)[:, None, :]
        t = jnp.where(mg, t, tc)
        su = jnp.where(mg, su, suc)
        sd = jnp.where(mg, sd, sdc)
        return tc, suc, sdc, t, su, sd

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ncol_pad = -(-ncol // _LB) * _LB
    nlb = -(-nlev // _LV)

    def padc(x):
        if x.shape[0] == ncol_pad:
            return x
        pw = [(0, 0)] * x.ndim
        pw[0] = (0, ncol_pad - x.shape[0])
        return jnp.pad(x, pw)

    mask_f = frac_mask.astype(od.dtype)[..., None]
    # planck at layer top/bottom as (ncol, nlev, ng) slices (one copy
    # each; block-index granularity cannot express the half-level +1)
    pt_full = planck_hl[:, :-1, :]
    pb_full = planck_hl[:, 1:, :]

    def kernel(od_ref, osc_ref, odc_ref, mk_ref, pt_ref, pb_ref,
               oh_ref, *out_refs):
        def body(k, _):
            odb = od_ref[:, k]
            mask = mk_ref[:, k] > 0.5
            odc = _expand(odc_ref[:, k], oh_ref[:]) * osc_ref[:, k]
            od_t = jnp.where(mask, odb + odc, odb)
            pt = pt_ref[:, k]
            pb = pb_ref[:, k]
            tc, suc, sdc = ts.lw_no_scattering_transmittance(odb, pt,
                                                             pb)
            t, su, sd = ts.lw_no_scattering_transmittance(od_t, pt, pb)
            t = jnp.where(mask, t, tc)
            su = jnp.where(mask, su, suc)
            sd = jnp.where(mask, sd, sdc)
            for ref, val in zip(out_refs, (tc, suc, sdc, t, su, sd)):
                ref[k] = val.T
            return 0

        jax.lax.fori_loop(0, _LV, body, 0)

    cell = lambda x: pl.BlockSpec((_LB, _LV, x.shape[-1]),
                                  lambda l, c: (c, l, 0),
                                  memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        grid=(nlb, ncol_pad // _LB),
        in_specs=[cell(od), cell(od_scaling), cell(od_cloud),
                  cell(mask_f), cell(pt_full), cell(pb_full),
                  pl.BlockSpec((nb, ng), lambda l, c: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((_LV, ng, _LB),
                                lambda l, c: (l, 0, c),
                                memory_space=pltpu.VMEM)] * 6,
        out_shape=[jax.ShapeDtypeStruct((nlb * _LV, ng, ncol_pad),
                                        jnp.float32)] * 6,
    )(padc(od), padc(od_scaling), padc(od_cloud), padc(mask_f),
      padc(pt_full), padc(pb_full), onehot)
    return tuple(o[:nlev, :, :ncol] for o in outs)
