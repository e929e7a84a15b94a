"""Profiling scopes: the Dr Hook analogue.

Reference parity: drhook/ (the IFS profiler that brackets every routine
with dr_hook(name, 0/1, handle), zero-cost when off; C core
drhook/drhook/drhook.c). Two layers here:

 - jax.named_scope annotation (always on): labels the XLA HLO so scopes
   appear in JAX profiler / xprof traces — the device-side story.
 - the native C++ core (native/ecrhook.cc via utils/native.py) when
   ECRAD_HOOK=1: per-thread call-stack accounting with wall/CPU self and
   total time, peak RSS, and fatal-signal hook-stack dumps — the
   host-side story, matching Dr Hook's profile output. Falls back to a
   pure-Python accumulator when no compiler is available.

Controlled by ECRAD_HOOK=1 — near-zero overhead otherwise.
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


def _native():
    if not LHOOK:
        return None
    from .native import hook_lib
    return hook_lib()


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
    lib = _native()
    if lib is not None:
        lib.ecr_hook_enter(name.encode())
        try:
            with jax.named_scope(name):
                yield
        finally:
            lib.ecr_hook_exit(name.encode())
        return
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    _accum[name] += time.perf_counter() - t0
    _counts[name] += 1


def install_signal_handlers() -> bool:
    """Install Dr Hook-style fatal-signal handlers that dump the active
    hook stack (drhook.c signal machinery). Returns True if the native
    core is available."""
    from .native import hook_lib
    lib = hook_lib()
    if lib is None:
        return False
    lib.ecr_hook_install_signals()
    return True


def profile_report() -> str:
    """Dr Hook-style profile summary (drhook_merge_walltime analogue)."""
    lib = _native()
    if lib is not None:
        import ctypes
        cap = 512
        names = ctypes.create_string_buffer(cap * 64)
        calls = (ctypes.c_long * cap)()
        tw = (ctypes.c_double * cap)()
        sw = (ctypes.c_double * cap)()
        tc = (ctypes.c_double * cap)()
        rss = (ctypes.c_long * cap)()
        n = lib.ecr_hook_report(names, calls, tw, sw, tc, rss, cap)
        lines = ["name                                     calls"
                 "   total(s)    self(s)     cpu(s)  maxrss(MB)"]
        for i in range(n):
            nm = names.raw[i * 64:(i + 1) * 64].split(b"\0")[0].decode()
            lines.append(f"{nm:40s} {calls[i]:6d} {tw[i]:10.4f} "
                         f"{sw[i]:10.4f} {tc[i]:10.4f} "
                         f"{rss[i] / 1024.0:10.1f}")
        return "\n".join(lines)
    lines = ["name                                      calls   walltime"]
    for name, t in sorted(_accum.items(), key=lambda kv: -kv[1]):
        lines.append(f"{name:40s} {_counts[name]:7d} {t:10.4f}s")
    return "\n".join(lines)


def profile_rows():
    """Profile data as rows of (name, calls, self_seconds)."""
    lib = _native()
    if lib is not None:
        import ctypes
        cap = 512
        names = ctypes.create_string_buffer(cap * 64)
        calls = (ctypes.c_long * cap)()
        tw = (ctypes.c_double * cap)()
        sw = (ctypes.c_double * cap)()
        tc = (ctypes.c_double * cap)()
        rss = (ctypes.c_long * cap)()
        n = lib.ecr_hook_report(names, calls, tw, sw, tc, rss, cap)
        return [(names.raw[i * 64:(i + 1) * 64].split(b"\0")[0].decode(),
                 int(calls[i]), float(sw[i])) for i in range(n)]
    return [(name, _counts[name], t) for name, t in _accum.items()]


def dump_profile(path: str | None = None) -> str:
    """Write this process's profile to `ecrhook.prof.<process_index>`
    (the per-rank `drhook.prof.N` files of DR_HOOK_OPT=prof); merge
    across processes with tools/merge_hook_profiles.py — the
    bin/drhook_merge_walltime.pl analogue. Returns the path written."""
    if path is None:
        try:
            pid = jax.process_index()
        except Exception:
            pid = 0
        path = f"ecrhook.prof.{pid}"
    rows = profile_rows()
    total = sum(r[2] for r in rows)
    with open(path, "w") as f:
        f.write(f"# ecrhook profile process={path.rsplit('.', 1)[-1]} "
                f"walltime={total:.6f}\n")
        f.write("# name calls self_seconds\n")
        for name, calls, self_s in rows:
            f.write(f"{name} {calls} {self_s:.6f}\n")
    return path


def reset_profile() -> None:
    lib = _native()
    if lib is not None:
        lib.ecr_hook_reset()
    _accum.clear()
    _counts.clear()


def start_trace(logdir: str) -> None:
    """Start a JAX profiler trace (viewable in TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
