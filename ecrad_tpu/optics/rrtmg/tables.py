"""Load the RRTMG-IFS coefficient tables extracted by
tools/extract_rrtmg_tables.py.

The npz holds the reduced (140 LW / 112 SW g-point) tables keyed
'lw{band}_{name}' / 'sw{band}_{name}' plus global maps (g->band,
reduction group sizes, reference profiles, Planck LUT).
"""
from __future__ import annotations

import functools
import os
from typing import Dict

import numpy as np

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "data",
                             "rrtmg_tables.npz")


@functools.lru_cache(maxsize=2)
def _load_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: np.asarray(z[k]) for k in z.files}


def load_tables(path: str = None) -> Dict[str, np.ndarray]:
    return _load_npz(os.path.abspath(path or _DEFAULT_PATH))
