"""Test environment: force the CPU backend with 8 virtual devices so the
full suite (including multi-chip sharding tests) runs without TPU
hardware. Pallas kernels run in interpreter mode on CPU (gated inside
the library by backend detection)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# timing fidelity is irrelevant on CPU; keep bench loops short
os.environ.setdefault("VOLTRIX_TPU_BENCH_WINDOW_MS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
