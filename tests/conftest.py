"""Test configuration: force a deterministic 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU benchmarks run
separately via ``bench.py``.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU harness overrides JAX_PLATFORMS at plugin discovery; only the
# config flag reliably forces CPU, so set it before any backend is touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# repo root importable regardless of pytest invocation directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache():
    """Drop compiled executables at module boundaries.

    The full suite jits thousands of programs in one process; past ~600
    tests the XLA CPU compiler segfaults deterministically (observed at
    test_wave4 with 128 GB RAM free — in-process compiler state, not
    OOM).  Clearing per module bounds the accumulation; cross-module
    programs rarely share shapes, so the recompile cost is minor."""
    yield
    import jax

    jax.clear_caches()

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "models"))
