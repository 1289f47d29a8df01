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


def test_fp8_per_tensor_roundtrip(rng):
    import jax.numpy as jnp

    from voltrix_spmm_tpu.utils import (
        per_tensor_dequant_fp8,
        per_tensor_quant_fp8,
    )

    x = rng.standard_normal((64, 64)).astype(np.float32) * 10
    q, s = per_tensor_quant_fp8(x)
    assert q.dtype == jnp.float8_e4m3fn
    back = np.asarray(per_tensor_dequant_fp8(q, s))
    # e4m3 has ~2 decimal digits: relative error class
    assert np.abs(back - x).max() / np.abs(x).max() < 0.1


def test_fp8_block_quant_outliers(rng):
    """Per-block scaling isolates outliers: non-outlier blocks keep
    fine resolution (the point of block vs per-tensor scaling)."""
    from voltrix_spmm_tpu.utils import (
        block_dequant_fp8,
        block_quant_fp8,
        gen_outlier_normal,
        per_tensor_dequant_fp8,
        per_tensor_quant_fp8,
    )

    x = rng.standard_normal((256, 256)).astype(np.float32)
    x[0, 0] = 5000.0  # one outlier confined to block (0, 0)
    del gen_outlier_normal
    qb, sb = block_quant_fp8(x, (128, 128))
    assert sb.shape == (2, 2)
    back_b = np.asarray(block_dequant_fp8(qb, sb, (128, 128)))
    qt, st = per_tensor_quant_fp8(x)
    back_t = np.asarray(per_tensor_dequant_fp8(qt, st))
    err_b = np.abs(back_b - x).mean()
    err_t = np.abs(back_t - x).mean()
    assert err_b < err_t  # block scaling strictly better on outlier data


def test_fp8_round_quant_cast(rng):
    import jax.numpy as jnp

    from voltrix_spmm_tpu.utils import round_quant_fp8

    x = np.array([1.0, 2.0, 448.0], np.float32)
    q = round_quant_fp8(x)
    assert q.dtype == jnp.float8_e4m3fn
    np.testing.assert_allclose(np.asarray(q).astype(np.float32), x)


def test_device_trace_bench_runs(rng):
    """Smoke: the memory-lean trace harness runs end to end and returns
    a finite non-negative ms/iter (on CPU the xplane may carry no
    '/device:' plane, in which case 0.0 is the documented floor)."""
    import jax.numpy as jnp

    from voltrix_spmm_tpu.utils import device_trace_bench

    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    t = device_trace_bench(lambda c: c @ c, x, iters=2)
    assert isinstance(t, float) and t >= 0.0 and np.isfinite(t)
