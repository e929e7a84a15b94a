"""Native runtime components: profiler core + Fortran binary loader.

Reference parity targets: drhook/drhook/drhook.c (profiler) and the
ifsrrtm/rrtm_kgb*.F90 binary READ path (loader). Both have pure-Python
fallbacks; these tests exercise whichever is available and, when g++
built the native library, cross-check it against the fallback.
"""
import os
import shutil
import struct

import numpy as np
import pytest

RADRRTM = "/root/reference/data/RADRRTM"


def test_fortran_file_reads_reference_tables():
    if not os.path.exists(RADRRTM):
        pytest.skip("reference binary tables not available")
    from ecrad_tpu.utils.native import FortranFile
    recs = []
    with FortranFile(RADRRTM) as f:
        while True:
            try:
                recs.append(f.read_f64())
            except EOFError:
                break
    assert len(recs) == 16  # one KA/KB record pair set per read statement
    assert recs[0].shape == (4800,)  # band 1 KAO: 5*13*16*... (kgb1)
    # cross-check against an independent pure-python read
    recs_py = []
    with open(RADRRTM, "rb") as fh:
        while True:
            h = fh.read(4)
            if len(h) < 4:
                break
            n = int.from_bytes(h, "big")
            p = fh.read(n)
            fh.read(4)
            recs_py.append(np.frombuffer(p, ">f8"))
    assert len(recs) == len(recs_py)
    for a, b in zip(recs, recs_py):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_fortran_file_roundtrip(tmp_path):
    """Write a framed big-endian record and read it back."""
    from ecrad_tpu.utils.native import FortranFile
    data = np.linspace(0.0, 1.0, 37)
    path = tmp_path / "rec.bin"
    payload = data.astype(">f8").tobytes()
    with open(path, "wb") as f:
        f.write(struct.pack(">i", len(payload)))
        f.write(payload)
        f.write(struct.pack(">i", len(payload)))
    with FortranFile(str(path)) as f:
        out = f.read_f64()
    np.testing.assert_allclose(out, data)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no compiler")
def test_native_hook_profile():
    from ecrad_tpu.utils.native import hook_lib
    lib = hook_lib()
    if lib is None:
        pytest.skip("native hook library unavailable")
    import ctypes
    lib.ecr_hook_reset()
    lib.ecr_hook_enter(b"outer")
    lib.ecr_hook_enter(b"inner")
    lib.ecr_hook_exit(b"inner")
    lib.ecr_hook_exit(b"outer")
    cap = 16
    names = ctypes.create_string_buffer(cap * 64)
    calls = (ctypes.c_long * cap)()
    tw = (ctypes.c_double * cap)()
    sw = (ctypes.c_double * cap)()
    tc = (ctypes.c_double * cap)()
    rss = (ctypes.c_long * cap)()
    n = lib.ecr_hook_report(names, calls, tw, sw, tc, rss, cap)
    got = {}
    for i in range(n):
        nm = names.raw[i * 64:(i + 1) * 64].split(b"\0")[0].decode()
        got[nm] = (calls[i], tw[i], sw[i])
    assert set(got) == {"outer", "inner"}
    assert got["outer"][0] == 1 and got["inner"][0] == 1
    # parent total includes child; parent self excludes it
    assert got["outer"][1] >= got["inner"][1]
    assert got["outer"][2] <= got["outer"][1]
    assert lib.ecr_hook_stack_depth() == 0


def test_hooks_python_api():
    from ecrad_tpu.utils import hooks
    with hooks.hook("scope_a"):
        pass
    # report callable regardless of backend
    assert isinstance(hooks.profile_report(), str)


def test_profile_dump_and_merge(tmp_path, monkeypatch):
    """dump_profile writes per-process files; merge_hook_profiles
    aggregates them like bin/drhook_merge_walltime.pl (avg/min/max,
    imbalance, call counts across ranks)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import merge_hook_profiles as mhp

    from ecrad_tpu.utils import hooks
    monkeypatch.setattr(hooks, "LHOOK", True)
    hooks.reset_profile()
    with hooks.hook("radiation"):
        with hooks.hook("gas_optics"):
            pass
    p0 = hooks.dump_profile(str(tmp_path / "ecrhook.prof.0"))
    # synthesize a second, slower rank
    wall1, rows1 = mhp.parse_profile(p0)
    p1 = tmp_path / "ecrhook.prof.1"
    with open(p1, "w") as f:
        f.write(f"# ecrhook profile process=1 walltime={wall1 * 3}\n")
        for name, calls, self_s in rows1:
            f.write(f"{name} {calls * 2} {self_s * 3 + 1.0}\n")
    acc, wall = mhp.merge([mhp.parse_profile(p0),
                           mhp.parse_profile(str(p1))])
    assert wall["nproc"] == 2
    assert set(acc) >= {"radiation", "gas_optics"}
    st = acc["radiation"]
    assert st["tasks"] == 2
    assert st["calls"] == 3  # 1 + 2
    assert st["max"] > st["min"]
    report = mhp.format_report(acc, wall, threshold_percent=0.0)
    assert "radiation" in report and "gas_optics" in report
    assert "2 processes" in report
