"""Utils tests: metrics, timers, the on-device loop bench harness."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from voltrix_spmm_tpu.utils import (
    CPU_bench,
    DurationTimer,
    calc_diff,
    device_loop_bench,
    env_flag,
    relative_error,
)


def test_calc_diff_identical_and_scaled():
    x = np.arange(100, dtype=np.float64)
    assert calc_diff(x, x) == 0.0
    assert calc_diff(x, 2 * x) > 0.05
    assert calc_diff(np.zeros(4), np.zeros(4)) == 0.0


def test_relative_error():
    x = np.ones(10)
    assert relative_error(x, x) == 0.0
    assert abs(relative_error(x, 1.1 * x) - 0.1) < 1e-12


def test_device_loop_bench_positive_and_scales():
    x = jnp.ones((256, 256), jnp.float32)
    t = device_loop_bench(lambda c: c @ c * 1e-3, x, iters=4, trials=2)
    assert t > 0


def test_device_loop_bench_rest_args():
    x = jnp.ones((64, 64))
    w = jnp.ones((64, 64)) * 0.5
    t = device_loop_bench(lambda c, ww: c @ ww, x, w, iters=2, trials=1)
    assert t > 0


def test_device_loop_bench_shape_changing_fn():
    # output shape != carry shape (e.g. a model forward returning
    # logits): the loop chains through a scalar reduction instead
    x = jnp.ones((64, 32), jnp.float32)
    w = jnp.ones((32, 8), jnp.float32)
    t = device_loop_bench(lambda c, ww: c @ ww, x, w, iters=2, trials=1)
    assert t > 0
    # pytree outputs work too
    t = device_loop_bench(
        lambda c, ww: {"a": c @ ww, "b": c.sum()}, x, w, iters=2, trials=1
    )
    assert t > 0


def test_duration_timer():
    with DurationTimer() as t:
        time.sleep(0.01)
    assert t.get_duration() >= 5.0  # ms


def test_cpu_bench():
    assert CPU_bench(lambda: sum(range(100)), iters=3, warmup=1) >= 0


def test_env_flag(monkeypatch):
    monkeypatch.setenv("VXT_TEST_FLAG", "1")
    assert env_flag("VXT_TEST_FLAG")
    monkeypatch.setenv("VXT_TEST_FLAG", "0")
    assert not env_flag("VXT_TEST_FLAG")
    assert not env_flag("VXT_TEST_FLAG_ABSENT")
