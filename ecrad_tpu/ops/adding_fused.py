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


def level_sweep(step, xs, init, n_ys, reverse=False, interpret=False):
    """Run `step` over levels with a VMEM-resident carry.

    step(carry, x_list) -> (new_carry, ys_tuple): carry (k, ng, L);
    each x (ng, L); ys_tuple of n_ys (ng, L) values, stored at the
    level's index. xs: list of (nlev, ng, ncol) arrays; init: (k, ng,
    ncol). reverse=True sweeps levels surface->TOA (ys still land at
    their level index). Returns (ys list of (nlev, ng, ncol), final
    carry (k, ng, ncol))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nlev, ng, ncol = xs[0].shape
    k = init.shape[0]
    ncol_pad = -(-ncol // _LB) * _LB
    xs = [_pad_l(x, ncol_pad) for x in xs]
    init = _pad_l(init, ncol_pad)
    nc_tiles = ncol_pad // _LB

    if reverse:
        lmap = lambda c, l, n=nlev: (n - 1 - l, 0, c)
    else:
        lmap = lambda c, l: (l, 0, c)

    def kernel(*refs):
        x_refs = refs[:1 + len(xs)]
        init_ref = x_refs[-1]
        x_refs = x_refs[:-1]
        out_refs = refs[1 + len(xs):]
        ys_refs = out_refs[:n_ys]
        carry_ref = out_refs[n_ys]
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            carry_ref[...] = init_ref[...]

        new_carry, ys = step(carry_ref[...],
                             [r[0] for r in x_refs])
        for j in range(n_ys):
            ys_refs[j][0] = ys[j]
        carry_ref[...] = new_carry

    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nc_tiles, nlev),
        in_specs=[pl.BlockSpec((1, ng, _LB), lmap,
                               memory_space=pltpu.VMEM)
                  for _ in xs]
        + [pl.BlockSpec((k, ng, _LB), lambda c, l: (0, 0, c),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, ng, _LB), lmap,
                                memory_space=pltpu.VMEM)
                   for _ in range(n_ys)]
        + [pl.BlockSpec((k, ng, _LB), lambda c, l: (0, 0, c),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nlev, ng, ncol_pad),
                                        jnp.float32)
                   for _ in range(n_ys)]
        + [jax.ShapeDtypeStruct((k, ng, ncol_pad), jnp.float32)],
    )(*xs, init)
    ys = [o[:, :, :ncol] for o in outs[:n_ys]]
    return ys, outs[n_ys][:, :, :ncol]


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
    # values below half-level l) + 1/denom
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
        return (jnp.stack([albedo, source], 0),
                (albedo, source, inv_denom))

    (alb_t, src_t, inv_denom), _ = level_sweep(
        up_step, [ref, trans, ref_dir, trans_dir_diff, fdir_top],
        jnp.stack([albedo_diffuse, source_surf], 0), 3, reverse=True,
        interpret=interpret)
    albedo = jnp.concatenate([alb_t, albedo_diffuse[None]], 0)
    source = jnp.concatenate([src_t, source_surf[None]], 0)

    # 3) diffuse flux descent; emit the UPDATED downward flux
    def dn_step(fd, x):
        t, r, tdd, fdt, s_below, invd = x
        fd_next = (t * fd[0] + r * s_below + tdd * fdt) * invd
        return fd_next[None], (fd_next,)

    (fd_rest,), _ = level_sweep(
        dn_step, [trans, ref, trans_dir_diff, fdir_top, source[1:],
                  inv_denom],
        jnp.zeros_like(incoming_toa)[None], 1, interpret=interpret)
    flux_dn_diffuse = jnp.concatenate(
        [jnp.zeros_like(incoming_toa)[None], fd_rest], 0)
    flux_up = albedo * flux_dn_diffuse + source
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
        return (jnp.stack([albedo, source], 0),
                (albedo, source, inv_denom))

    (alb_t, src_t, inv_denom), _ = level_sweep(
        up_step, [ref, trans, src_up, src_dn],
        jnp.stack([albedo_surf, emission_surf], 0), 3, reverse=True,
        interpret=interpret)
    albedo = jnp.concatenate([alb_t, albedo_surf[None]], 0)
    source = jnp.concatenate([src_t, emission_surf[None]], 0)

    def dn_step(fd, x):
        t, r, sd, s_below, invd = x
        fd_next = (t * fd[0] + r * s_below + sd) * invd
        return fd_next[None], (fd_next,)

    (fd_rest,), _ = level_sweep(
        dn_step, [trans, ref, src_dn, source[1:], inv_denom],
        jnp.zeros_like(emission_surf)[None], 1, interpret=interpret)
    flux_dn = jnp.concatenate([jnp.zeros_like(emission_surf)[None],
                               fd_rest], 0)
    flux_up = albedo * flux_dn + source
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
