"""Hardware-only kernel checks (skipped on CPU, where the suite runs).

The CPU suite validates the jnp fallback paths; the Pallas kernels
themselves (including the 3-pass bf16x2 class matmuls, which only
exist under Mosaic) are asserted against the fallbacks here whenever
the suite runs with a real TPU attached. tools/check_kernel_equivalence.py
is the standalone form of the same checks.
"""
import jax
import pytest


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _on_tpu(), reason="requires TPU hardware (suite runs on CPU)")


def test_gather_and_fused_taumol_equivalence():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "check_kernel_equivalence",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "check_kernel_equivalence.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()        # asserts internally
