"""Weighted table-row interpolation as a Pallas TPU kernel.

The RRTMG taumol stage is dominated by expressions of the form

    out[cell, g] = sum_k  w_k[cell] * TABLE_s(k)[row_k[cell], g]

(k-table corner interpolation, water-vapour continuum, minor gases,
Planck fractions; e.g. ifsrrtm/rrtm_taumol1.F90:199-283). XLA lowers the
per-cell dynamic row lookup to a serial gather (~9 M rows/s on TPU
regardless of row width), which made gas optics ~100x slower than its
bandwidth bound. This op reformulates each band's lookups as a sparse
one-hot matrix product evaluated on the MXU:

    out (G, N-tile) = TABLE^T (G, R) @ W (R, N-tile)

where W is built in VMEM from the row indices/weights with iota
comparisons (never materialized in HBM). Orientation matters: cells fill
the 128-lane axis (no padding) and the band's few g-points sit in
sublanes, so neither operand nor result is padded to 128 g-lanes.

A band's different lookup tables (k-tables, continuum, minor gas) are
"sections" stacked along the row axis of one concatenated table so the
whole band costs a single kernel launch.

The pure-JAX fallback (jnp.take) implements identical semantics for
CPU/testing.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


class Section(NamedTuple):
    """One lookup table plus its per-cell rows/weights.

    table: (R_s, G) numpy/jnp — rows indexed per cell.
    rows:  list of (N,) int32 arrays (0-based row index per cell).
    weights: list of (N,) float arrays, same length as rows.
    """
    table: jnp.ndarray
    rows: Sequence[jnp.ndarray]
    weights: Sequence[jnp.ndarray]


def use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def _eval_sections_reference(sections: List[Section], g: int,
                             dtype) -> jnp.ndarray:
    """jnp.take fallback, output (G, N)."""
    out = None
    for sec in sections:
        tab = jnp.asarray(sec.table, dtype)           # (R, G)
        for r, w in zip(sec.rows, sec.weights):
            term = jnp.take(tab, jnp.clip(r, 0, tab.shape[0] - 1),
                            axis=0).T * w[None, :]
            out = term if out is None else out + term
    return out


def _pallas_kernel(meta, tile, r_total, g, n_inputs):
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(*refs):
        out_ref = refs[-1]
        tab_ref = refs[-2]
        pieces = []
        idx = 0
        for (k_s, r_s) in meta:
            rows_ref = refs[idx]
            w_ref = refs[idx + 1]
            idx += 2
            iot = jax.lax.broadcasted_iota(jnp.int32, (r_s, tile), 0)
            w_acc = jnp.zeros((r_s, tile), jnp.float32)
            for k in range(k_s):
                w_acc = w_acc + jnp.where(
                    iot == rows_ref[k, :][None, :],
                    w_ref[k, :][None, :], 0.0)
            pieces.append(w_acc)
        w_full = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=0)
        out_ref[:] = jax.lax.dot_general(
            tab_ref[:], w_full, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    return kernel


def _eval_sections_pallas(sections: List[Section], g: int, n: int,
                          dtype, tile: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = -(-n // tile) * tile
    meta = []
    inputs = []
    tabs = []
    for sec in sections:
        tab = np.asarray(sec.table, np.float32)
        r_s = tab.shape[0]
        k_s = len(sec.rows)
        rows = jnp.stack([jnp.clip(r, 0, r_s - 1).astype(jnp.int32)
                          for r in sec.rows])          # (K_s, N)
        ws = jnp.stack([w.astype(jnp.float32) for w in sec.weights])
        if n_pad != n:
            rows = jnp.pad(rows, ((0, 0), (0, n_pad - n)))
            ws = jnp.pad(ws, ((0, 0), (0, n_pad - n)))
        meta.append((k_s, r_s))
        inputs.extend([rows, ws])
        tabs.append(tab.T)                              # (G, R_s)
    table_t = jnp.asarray(np.concatenate(tabs, axis=1))  # (G, R_tot)
    r_total = table_t.shape[1]

    kernel = _pallas_kernel(meta, tile, r_total, g, len(inputs))
    in_specs = []
    for (k_s, r_s) in meta:
        in_specs.append(pl.BlockSpec((k_s, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((k_s, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((g, r_total), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n_pad), jnp.float32),
    )(*inputs, table_t)
    return out[:, :n].astype(dtype)


def eval_sections(sections: List[Section], n: int,
                  use_pallas: Optional[bool] = None,
                  tile: int = 512, dtype=jnp.float32) -> jnp.ndarray:
    """Evaluate sum of weighted row-lookups. Returns (G, N).

    All sections must share the table's second (g) dimension.
    """
    g = int(np.asarray(sections[0].table).shape[1])
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas:
        return _eval_sections_pallas(sections, g, n, dtype, tile)
    return _eval_sections_reference(sections, g, dtype)
