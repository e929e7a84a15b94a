#!/usr/bin/env python
"""Assert the Pallas gather-interp kernel matches the jnp.take fallback
on the attached TPU, for plain, eta, and mixed section lists.

Run on real hardware: python tools/check_kernel_equivalence.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ecrad_tpu.ops.gather_interp import (EtaSection, Section,
                                         eval_sections)


def main():
    rng = np.random.RandomState(0)
    n = 2048 * 9 + 133          # deliberately not a tile multiple

    def rand_plain(r, k, g):
        return Section(
            rng.rand(r, g).astype(np.float32),
            [jnp.asarray(rng.randint(0, r, n).astype(np.int32))
             for _ in range(k)],
            [jnp.asarray(rng.rand(n).astype(np.float32))
             for _ in range(k)])

    def rand_eta(r1, r2, g, gos, eos):
        return EtaSection(
            rng.rand(r1, r2, g).astype(np.float32),
            [jnp.asarray(rng.randint(0, r1 - 1, n).astype(np.int32))
             for _ in range(2)],
            [[(o, jnp.asarray(rng.rand(n).astype(np.float32)))
              for o in gos] for _ in range(2)],
            [jnp.asarray(rng.randint(1, r2 - 2, n).astype(np.int32))
             for _ in range(2)],
            [[(o, jnp.asarray(rng.rand(n).astype(np.float32)))
              for o in eos] for _ in range(2)])

    cases = {
        "plain": [rand_plain(65, 4, 12)],
        "eta_lw_absa": [rand_eta(65, 9, 12, (0, 1), (-1, 0, 1, 2))],
        "eta_lw_absb": [rand_eta(235, 5, 12, (0, 1), (0, 1))],
        "mixed": [rand_plain(10, 2, 12), rand_eta(19, 9, 12, (0, 1),
                                                  (0, 1)),
                  rand_plain(300, 4, 12)],
    }
    for name, secs in cases.items():
        ref = np.asarray(eval_sections(secs, n, use_pallas=False))
        got = np.asarray(eval_sections(secs, n, use_pallas=True))
        err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-30)
        status = "OK" if err < 5e-6 else "FAIL"
        print(f"{name}: rel err {err:.2e}  {status}")
        assert err < 5e-6, name
    print("kernel equivalence OK")


if __name__ == "__main__":
    main()
