"""Fused ICA adding sweeps as Pallas level-sweep kernels.

The sequential adding recurrences (solvers/adding.py) are lax.scan
sweeps carrying (ng, ncol) states over ~137 levels. Measured on the
chip they stream at ~250 GB/s — well under the ~610 GB/s the layout
supports — because every XLA while step pays dynamic-slice +
dynamic-update-slice bookkeeping, and the three SW sweeps round-trip
their intermediates (albedo, source, 1/denom) through HBM between
scans. Here each sweep is one Pallas kernel: grid = (column tiles,
levels) with levels iterating sequentially, the carry resident in a
VMEM-persistent output block, and every per-level operand streamed as
its OWN input (no packing copies).

The scan path in solvers/adding.py remains the CPU fallback and the
numerical reference; kernel-vs-scan equivalence is asserted by
tests/test_adding_fused.py (interpret mode) and on hardware by
tools/check_kernel_equivalence.py.

Reference parity: radiation_adding_ica_sw.F90:24-147,
radiation_adding_ica_lw.F90:32-324 (the same three/two/two loop
structures).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LB = 512         # lane (column) tile per grid step


def _pad_l(x, ncol_pad):
    if x.shape[-1] == ncol_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, ncol_pad - x.shape[-1])]
    return jnp.pad(x, pad)


def level_sweep(step, xs, init, ys_rows, reverse=False,
                interpret=False, col_xs=(), lb=None):
    """Run `step` over levels with a VMEM-resident carry.

    xs: per-level cell operands, each (nlev, ng, ncol) or (nlev, R,
    ng, ncol); col_xs: per-level per-COLUMN operands (nlev, R, ncol)
    (broadcast over sublanes inside the kernel). init: carry (k, ng,
    ncol). step(carry, x_list, col_list) -> (new_carry, ys_tuple)
    with carry (k, ng, L), x (ng, L) or (R, ng, L), col (R, L).
    ys_rows: list with one entry per emitted ys — 0 for an (ng, L)
    value (stored (nlev, ng, ncol)) or R for an (R, ng, L) value
    (stored (nlev, R, ng, ncol)). An int n means [0]*n and step may
    take (carry, x_list) only. reverse=True sweeps surface->TOA (ys
    still land at their level index). Returns (ys list, final carry
    (k, ng, ncol))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if isinstance(ys_rows, int):
        ys_rows = [0] * ys_rows
    _LB = lb or globals()["_LB"]
    take_cols = bool(col_xs) or step.__code__.co_argcount > 2
    cell0 = xs[0]
    nlev = cell0.shape[0]
    ng = cell0.shape[-2]
    ncol = cell0.shape[-1]
    k = init.shape[0]
    ncol_pad = -(-ncol // _LB) * _LB
    xs = [_pad_l(x, ncol_pad) for x in xs]
    col_xs = [_pad_l(x, ncol_pad) for x in col_xs]
    init = _pad_l(init, ncol_pad)
    nc_tiles = ncol_pad // _LB

    if reverse:
        lmap3 = lambda c, l, n=nlev: (n - 1 - l, 0, c)
        lmap4 = lambda c, l, n=nlev: (n - 1 - l, 0, 0, c)
    else:
        lmap3 = lambda c, l: (l, 0, c)
        lmap4 = lambda c, l: (l, 0, 0, c)

    def spec_for(x):
        if x.ndim == 4:
            return pl.BlockSpec((1, x.shape[1], ng, _LB), lmap4,
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, ng, _LB), lmap3,
                            memory_space=pltpu.VMEM)

    n_ys = len(ys_rows)

    def kernel(*refs):
        x_refs = refs[:len(xs)]
        c_refs = refs[len(xs):len(xs) + len(col_xs)]
        init_ref = refs[len(xs) + len(col_xs)]
        out_refs = refs[len(xs) + len(col_xs) + 1:]
        ys_refs = out_refs[:n_ys]
        carry_ref = out_refs[n_ys]
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            carry_ref[...] = init_ref[...]

        args = (carry_ref[...], [r[0] for r in x_refs])
        if take_cols:
            args = args + ([r[0] for r in c_refs],)
        new_carry, ys = step(*args)
        for j in range(n_ys):
            ys_refs[j][0] = ys[j]
        carry_ref[...] = new_carry

    out_specs = []
    out_shapes = []
    # dtype follows the carry so forcing the kernel path under
    # jax_enable_x64 (the f64 validation workflow) stays f64
    dt = init.dtype
    for r in ys_rows:
        if r:
            out_specs.append(pl.BlockSpec((1, r, ng, _LB), lmap4,
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(
                (nlev, r, ng, ncol_pad), dt))
        else:
            out_specs.append(pl.BlockSpec((1, ng, _LB), lmap3,
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(
                (nlev, ng, ncol_pad), dt))

    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nc_tiles, nlev),
        in_specs=[spec_for(x) for x in xs]
        + [pl.BlockSpec((1, x.shape[1], _LB), lmap3,
                        memory_space=pltpu.VMEM) for x in col_xs]
        + [pl.BlockSpec((k, ng, _LB), lambda c, l: (0, 0, c),
                        memory_space=pltpu.VMEM)],
        out_specs=out_specs
        + [pl.BlockSpec((k, ng, _LB), lambda c, l: (0, 0, c),
                        memory_space=pltpu.VMEM)],
        out_shape=out_shapes
        + [jax.ShapeDtypeStruct((k, ng, ncol_pad), dt)],
    )(*xs, *col_xs, init)
    ys = [o[..., :ncol] for o in outs[:n_ys]]
    return ys, outs[n_ys][..., :ncol]


def adding_sw_fused(ref, trans, ref_dir, trans_dir_diff, trans_dir_dir,
                    incoming_toa, albedo_diffuse, albedo_direct, cs_g,
                    interpret=False):
    """Fused-g-first SW adding (the three sweeps of
    radiation_adding_ica_sw.F90:85-143 as three level-sweep kernels).

    All layer inputs (nlev, ng, ncol); incoming_toa/albedos (ng,
    ncol); cs_g (1, ncol). Semantics identical to
    solvers/adding.py _adding_sw_sequential(gfirst=True)."""
    # 1) direct beam descent; emit the flux ENTERING each layer
    def dir_step(fd, x):
        fd_top = fd[0]
        return (x[0] * fd_top)[None], (fd_top,)

    (fdir_top,), fdir_bot = level_sweep(
        dir_step, [trans_dir_dir], incoming_toa[None], 1,
        interpret=interpret)
    fdir_bot = fdir_bot[0]

    # 2) albedo & source ascent; emit UPDATED albedo/source (the
    # values below half-level l). 1/denom is NOT streamed: the descent
    # recomputes it bit-identically from albedo[l+1] and r (one divide
    # beats a slab write + read per level).
    source_surf = albedo_direct * fdir_bot * cs_g

    def up_step(carry, x):
        albedo_below = carry[0]
        source_below = carry[1]
        r, t, rd, tdd, fdt = x
        inv_denom = 1.0 / (1.0 - albedo_below * r)
        albedo = r + t * t * albedo_below * inv_denom
        source = (rd * fdt
                  + t * (source_below + albedo_below * tdd * fdt)
                  * inv_denom)
        return jnp.stack([albedo, source], 0), (albedo, source)

    (alb_t, src_t), _ = level_sweep(
        up_step, [ref, trans, ref_dir, trans_dir_diff, fdir_top],
        jnp.stack([albedo_diffuse, source_surf], 0), 2, reverse=True,
        interpret=interpret)
    albedo = jnp.concatenate([alb_t, albedo_diffuse[None]], 0)
    source = jnp.concatenate([src_t, source_surf[None]], 0)

    # 3) diffuse flux descent; emits the downward flux AND the
    # upward flux below the layer (albedo/source already resident)
    def dn_step(fd, x):
        t, r, tdd, fdt, s_below, alb_below = x
        invd = 1.0 / (1.0 - alb_below * r)
        fd_next = (t * fd[0] + r * s_below + tdd * fdt) * invd
        fu_next = alb_below * fd_next + s_below
        return fd_next[None], (fd_next, fu_next)

    (fd_rest, fu_rest), _ = level_sweep(
        dn_step, [trans, ref, trans_dir_diff, fdir_top, source[1:],
                  albedo[1:]],
        jnp.zeros_like(incoming_toa)[None], 2, interpret=interpret)
    flux_dn_diffuse = jnp.concatenate(
        [jnp.zeros_like(incoming_toa)[None], fd_rest], 0)
    # flux_up at TOA: albedo[0] * 0 + source[0]
    flux_up = jnp.concatenate([source[:1], fu_rest], 0)
    # fdir_top[0] == incoming_toa (entry value of the first level)
    flux_dn_direct = jnp.concatenate([fdir_top, fdir_bot[None]],
                                     0) * cs_g
    return flux_up, flux_dn_diffuse, flux_dn_direct


def adding_lw_fused(ref, trans, src_up, src_dn, emission_surf,
                    albedo_surf, interpret=False):
    """Fused g-first LW adding with scattering
    (radiation_adding_ica_lw.F90:32-131). Semantics identical to
    solvers/adding.py _adding_lw_sequential(gfirst=True)."""
    def up_step(carry, x):
        albedo_below = carry[0]
        source_below = carry[1]
        r, t, su, sd = x
        inv_denom = 1.0 / (1.0 - albedo_below * r)
        albedo = r + t * t * albedo_below * inv_denom
        source = su + t * (source_below + albedo_below * sd) * inv_denom
        return jnp.stack([albedo, source], 0), (albedo, source)

    (alb_t, src_t), _ = level_sweep(
        up_step, [ref, trans, src_up, src_dn],
        jnp.stack([albedo_surf, emission_surf], 0), 2, reverse=True,
        interpret=interpret)
    albedo = jnp.concatenate([alb_t, albedo_surf[None]], 0)
    source = jnp.concatenate([src_t, emission_surf[None]], 0)

    def dn_step(fd, x):
        t, r, sd, s_below, alb_below = x
        invd = 1.0 / (1.0 - alb_below * r)
        fd_next = (t * fd[0] + r * s_below + sd) * invd
        fu_next = alb_below * fd_next + s_below
        return fd_next[None], (fd_next, fu_next)

    (fd_rest, fu_rest), _ = level_sweep(
        dn_step, [trans, ref, src_dn, source[1:], albedo[1:]],
        jnp.zeros_like(emission_surf)[None], 2, interpret=interpret)
    flux_dn = jnp.concatenate([jnp.zeros_like(emission_surf)[None],
                               fd_rest], 0)
    flux_up = jnp.concatenate([source[:1], fu_rest], 0)
    return flux_up, flux_dn


def affine_fused(a, b, x0, reverse=False, interpret=False):
    """Fused x_{k+1} = a_k x_k + b_k sweep (g-first), the kernel form
    of solvers/adding.py _affine_seq — the LW no-scattering fluxes
    (radiation_adding_ica_lw.F90:272-324)."""
    def step(x, ab):
        x_next = ab[0] * x[0] + ab[1]
        return x_next[None], (x_next,)

    (xs,), _ = level_sweep(step, [a, b], x0[None], 1, reverse=reverse,
                           interpret=interpret)
    if reverse:
        return jnp.concatenate([xs, x0[None]], 0)
    return jnp.concatenate([x0[None], xs], 0)


# =========================================================================
# Tripleclouds region sweeps (solvers/tripleclouds.py up/dn bodies)
# =========================================================================

def _m33(col, base):
    """9 consecutive (1, L) col rows -> (3, 3, 1, L)."""
    return jnp.stack([
        jnp.stack([col[base + 3 * i + j] for j in range(3)], 0)
        for i in range(3)], 0)


def _m33_t(col, base):
    return jnp.stack([
        jnp.stack([col[base + 3 * j + i] for j in range(3)], 0)
        for i in range(3)], 0)


def _rows(c, n):
    return [c[i:i + 1] for i in range(n)]


def _zero_cloudy_regs(x, is_clear):
    """Zero regions 1.. where the layer is clear; x (3, ng, L),
    is_clear (1, L)."""
    return jnp.concatenate(
        [x[:1], jnp.where(is_clear, 0.0, x[1:])], 0)


def tc_sw_sweeps(ref, trans, ref_dir, tdd, tdir, vm_rows, clear_rows,
                 init_up, init_dir, interpret=False):
    """Tripleclouds SW up+down sweeps as level-sweep kernels.

    ref..tdir: (nlev, 3, ng, ncol) region-leading g-first; vm_rows:
    (nlev+1, 9, ncol) flattened V overlap matrices; clear_rows:
    (nlev, 3, ncol) [clear | clear_prev | clear_next]; init_up:
    (6, ng, ncol) [alb_surf 3 | albdir_surf 3]; init_dir (3, ng,
    ncol). Semantics identical to solvers/tripleclouds.py
    solver_tripleclouds_sw up_body/dn_body. Returns (alb_top,
    albdir_top, ys_up (nlev, 6, ng, ncol), dn (nlev, 9, ng, ncol)
    [fup | fdn | ddn])."""
    from ..solvers.matrix import mv_gu

    def up_step(carry, xs, cols):
        r, t, rd, td, tdl = xs
        vmr = _rows(cols[0], 9)
        cl = cols[1]
        alb = carry[0:3]
        albdir = carry[3:6]
        inv = 1.0 / (1.0 - alb * r)
        alb_below = r + t * t * alb * inv
        albdir_below = rd + (tdl * albdir + td * alb) * t * inv
        is_clear = cl[0:1] > 0.5
        alb_below = _zero_cloudy_regs(alb_below, is_clear)
        albdir_below = _zero_cloudy_regs(albdir_below, is_clear)
        both_clear = is_clear & (cl[1:2] > 0.5)
        vm_t = _m33_t(vmr, 0)
        alb_mixed = mv_gu(vm_t, alb_below)
        albdir_mixed = mv_gu(vm_t, albdir_below)
        alb_new = jnp.where(both_clear, alb_below, alb_mixed)
        albdir_new = jnp.where(both_clear, albdir_below, albdir_mixed)
        return (jnp.concatenate([alb_new, albdir_new], 0), (carry,))

    (ys_up,), final_up = level_sweep(
        up_step, [ref, trans, ref_dir, tdd, tdir], init_up, [6],
        reverse=True, interpret=interpret,
        col_xs=[vm_rows[:-1], clear_rows], lb=256)

    def dn_step(carry, xs, cols):
        r, t, rd, td, tdl, ab = xs
        vmr = _rows(cols[0], 9)
        cl = cols[1]
        flux_dn = carry[0:3]
        direct_dn = carry[3:6]
        alb_b = ab[0:3]
        albdir_b = ab[3:6]
        inv = 1.0 / (1.0 - r * alb_b)
        fdn_new = (t * flux_dn
                   + direct_dn * (tdl * albdir_b * r + td)) * inv
        ddn_new = tdl * direct_dn
        is_clear = cl[0:1] > 0.5
        fdn_new = _zero_cloudy_regs(fdn_new, is_clear)
        ddn_new = _zero_cloudy_regs(ddn_new, is_clear)
        fup_new = ddn_new * albdir_b + fdn_new * alb_b
        both_clear = is_clear & (cl[2:3] > 0.5)
        vm_l = _m33(vmr, 0)
        fdn_mixed = mv_gu(vm_l, fdn_new)
        ddn_mixed = mv_gu(vm_l, ddn_new)
        fdn_out = jnp.where(both_clear, fdn_new, fdn_mixed)
        ddn_out = jnp.where(both_clear, ddn_new, ddn_mixed)
        out = jnp.concatenate([fup_new, fdn_out, ddn_out], 0)
        return jnp.concatenate([fdn_out, ddn_out], 0), (out,)

    (dn,), _ = level_sweep(
        dn_step, [ref, trans, ref_dir, tdd, tdir, ys_up],
        jnp.concatenate([jnp.zeros_like(init_dir), init_dir], 0), [9],
        interpret=interpret, col_xs=[vm_rows[1:], clear_rows], lb=256)
    return final_up[0:3], final_up[3:6], ys_up, dn


def tc_lw_sweeps(ref, trans, sup, sdn, vm_rows, um_rows, clear_rows,
                 init_up, interpret=False):
    """Tripleclouds LW up+down sweeps (solver_tripleclouds_lw
    up_body/dn_body). init_up: (6, ng, ncol) [alb_surf 3 | src_surf
    3]. Returns (src_top (3, ng, ncol), ys_up (nlev, 6, ng, ncol),
    dn (nlev, 6, ng, ncol) [fup | fdn])."""
    from ..solvers.matrix import mv_gu

    def up_step(carry, xs, cols):
        r, t, su, sd = xs
        vmr = _rows(cols[0], 9)
        umr = _rows(cols[1], 9)
        cl = cols[2]
        alb = carry[0:3]
        src = carry[3:6]
        inv = 1.0 / (1.0 - alb * r)
        alb_below = r + t * t * alb * inv
        src_below = su + t * (src + alb * sd) * inv
        is_clear = cl[0:1] > 0.5
        alb_below = _zero_cloudy_regs(alb_below, is_clear)
        src_below = _zero_cloudy_regs(src_below, is_clear)
        both_clear = is_clear & (cl[1:2] > 0.5)
        alb_mixed = mv_gu(_m33_t(vmr, 0), alb_below)
        src_mixed = mv_gu(_m33(umr, 0), src_below)
        alb_new = jnp.where(both_clear, alb_below, alb_mixed)
        src_new = jnp.where(both_clear, src_below, src_mixed)
        return (jnp.concatenate([alb_new, src_new], 0), (carry,))

    (ys_up,), final_up = level_sweep(
        up_step, [ref, trans, sup, sdn], init_up, [6], reverse=True,
        interpret=interpret,
        col_xs=[vm_rows[:-1], um_rows, clear_rows], lb=256)

    def dn_step(carry, xs, cols):
        r, t, sd, ab = xs
        vmr = _rows(cols[0], 9)
        cl = cols[1]
        flux_dn = carry[0:3]
        alb_b = ab[0:3]
        src_b = ab[3:6]
        inv = 1.0 / (1.0 - r * alb_b)
        fdn_new = (t * flux_dn + r * src_b + sd) * inv
        is_clear = cl[0:1] > 0.5
        fdn_new = _zero_cloudy_regs(fdn_new, is_clear)
        fup_new = src_b + fdn_new * alb_b
        both_clear = is_clear & (cl[2:3] > 0.5)
        fdn_mixed = mv_gu(_m33(vmr, 0), fdn_new)
        fdn_out = jnp.where(both_clear, fdn_new, fdn_mixed)
        out = jnp.concatenate([fup_new, fdn_out], 0)
        return fdn_out, (out,)

    (dn,), _ = level_sweep(
        dn_step, [ref, trans, sdn, ys_up],
        jnp.zeros_like(init_up[0:3]), [6], interpret=interpret,
        col_xs=[vm_rows[1:], clear_rows], lb=256)
    return final_up[3:6], ys_up, dn
