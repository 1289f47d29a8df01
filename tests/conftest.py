"""Test environment: force the CPU backend with 8 virtual devices so the
full suite (including multi-chip sharding tests) runs without TPU
hardware. Pallas kernels run in interpreter mode on CPU (gated inside
the library by backend detection).

On-device tier: `VOLTRIX_TPU_DEVICE_TESTS=1 python -m pytest tests/ -m
tpu` keeps the real backend and runs the `tpu`-marked smoke subset on
the chip (catches Mosaic-only regressions — lane alignment, SMEM limits
— that interpret mode cannot)."""

import os

DEVICE_TESTS = os.environ.get("VOLTRIX_TPU_DEVICE_TESTS", "0") == "1"

if not DEVICE_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
# timing fidelity is irrelevant on CPU; keep bench loops short
os.environ.setdefault("VOLTRIX_TPU_BENCH_WINDOW_MS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if not DEVICE_TESTS and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not DEVICE_TESTS:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
