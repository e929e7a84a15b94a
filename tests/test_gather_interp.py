"""Unit tests for the table-interpolation op (ops/gather_interp.py).

On CPU these exercise the jnp.take fallback; the TPU Pallas kernel is
asserted equivalent by tools/check_kernel_equivalence.py (run on real
hardware) and indirectly by the gas-optics golden tests.
"""
import numpy as np
import jax.numpy as jnp

from ecrad_tpu.ops.gather_interp import (EtaSection, Section,
                                         _eta_to_plain, eval_sections)


def _rand_eta_section(rng, n, r1=13, r2=9, g=12, n_fam=2):
    table = rng.rand(r1, r2, g).astype(np.float32)
    grids, grid_terms, etas, eta_terms = [], [], [], []
    for _ in range(n_fam):
        grids.append(jnp.asarray(
            rng.randint(0, r1 - 1, n).astype(np.int32)))
        grid_terms.append([(o, jnp.asarray(rng.rand(n).astype(np.float32)))
                           for o in (0, 1)])
        etas.append(jnp.asarray(
            rng.randint(1, r2 - 2, n).astype(np.int32)))
        eta_terms.append([(o, jnp.asarray(rng.rand(n).astype(np.float32)))
                          for o in (-1, 0, 1, 2)])
    return EtaSection(table, grids, grid_terms, etas, eta_terms)


def test_eta_section_matches_manual():
    rng = np.random.RandomState(0)
    n = 257
    sec = _rand_eta_section(rng, n)
    out = np.asarray(eval_sections([sec], n, use_pallas=False))
    table = np.asarray(sec.table)
    r1, r2, g = table.shape
    want = np.zeros((g, n))
    for fam in range(2):
        grid = np.asarray(sec.grids[fam])
        eta = np.asarray(sec.etas[fam])
        for go, gw in sec.grid_terms[fam]:
            for eo, ew in sec.eta_terms[fam]:
                w = np.asarray(gw) * np.asarray(ew)
                want += w[None, :] * table[np.clip(grid + go, 0, r1 - 1),
                                           np.clip(eta + eo, 0, r2 - 1)].T
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_eta_flatten_roundtrip():
    rng = np.random.RandomState(1)
    n = 64
    sec = _rand_eta_section(rng, n)
    plain = _eta_to_plain(sec)
    a = np.asarray(eval_sections([sec], n, use_pallas=False))
    b = np.asarray(eval_sections([plain], n, use_pallas=False))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_mixed_plain_and_eta():
    rng = np.random.RandomState(2)
    n = 100
    eta = _rand_eta_section(rng, n)
    tab = rng.rand(20, 12).astype(np.float32)
    plain = Section(tab,
                    [jnp.asarray(rng.randint(0, 20, n).astype(np.int32))],
                    [jnp.asarray(rng.rand(n).astype(np.float32))])
    got = np.asarray(eval_sections([plain, eta], n, use_pallas=False))
    a = np.asarray(eval_sections([plain], n, use_pallas=False))
    b = np.asarray(eval_sections([eta], n, use_pallas=False))
    np.testing.assert_allclose(got, a + b, rtol=1e-5, atol=1e-5)
