"""Profiling scopes: the Dr Hook analogue.

Reference parity: drhook/ (the IFS profiler that brackets every routine
with dr_hook(name, 0/1, handle), zero-cost when off). The TPU-native
equivalent is jax.named_scope (annotates the XLA HLO so scopes show in
the JAX profiler / xprof traces) plus an optional wall-clock accumulator
for eager timing. Controlled by ECRAD_HOOK=1 — zero overhead otherwise.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict

import jax

LHOOK = os.environ.get("ECRAD_HOOK", "0") == "1"

_accum: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def hook(name: str):
    """Named scope for traces; accumulates wall time when ECRAD_HOOK=1.

    Inside jit, wall-time is trace time only (compute is async); the
    named scope still labels the HLO for the profiler.
    """
    if not LHOOK:
        with jax.named_scope(name):
            yield
        return
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    _accum[name] += time.perf_counter() - t0
    _counts[name] += 1


def profile_report() -> str:
    """Dr Hook-style profile summary (drhook_merge_walltime analogue)."""
    lines = ["name                                      calls   walltime"]
    for name, t in sorted(_accum.items(), key=lambda kv: -kv[1]):
        lines.append(f"{name:40s} {_counts[name]:7d} {t:10.4f}s")
    return "\n".join(lines)


def reset_profile() -> None:
    _accum.clear()
    _counts.clear()


def start_trace(logdir: str) -> None:
    """Start a JAX profiler trace (viewable in TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
