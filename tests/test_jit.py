"""JIT layer tests: codegen -> g++ build -> ctypes launch roundtrip.

Parity with the reference JIT smoke test (tests/test_jit.py:33-64:
generate a kernel that echoes pointers/scalars, build with nvcc, launch
via ctypes, compare) and the cache-hit semantics of its compiler
(voltrix/jit/compiler.py:140-149).
"""

import os

import numpy as np
import pytest

from voltrix_spmm_tpu import jit

pytestmark = pytest.mark.skipif(
    os.environ.get("VOLTRIX_TPU_DISABLE_NATIVE", "0") == "1",
    reason="native disabled",
)


def test_generate_and_launch_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("VOLTRIX_TPU_CACHE_DIR", str(tmp_path))
    arg_defs = (("x", np.float32), ("n", int), ("scale", float))
    code = jit.generate(
        ("<cstdint>",),
        arg_defs,
        """
    for (long long i = 0; i < n; ++i) x[i] *= (float)scale;
""",
    )
    rt = jit.build("scale_kernel", arg_defs, code)
    x = np.arange(8, dtype=np.float32)
    rc = rt(x, 8, 2.5)
    assert rc == 0
    np.testing.assert_allclose(x, np.arange(8) * 2.5)


def test_cpp_format_brace_safe():
    out = jit.cpp_format("if (x) { y = {VAL}; }", {"VAL": 7})
    assert out == "if (x) { y = 7; }"


def test_cache_hit_across_cache_objects(tmp_path, monkeypatch):
    monkeypatch.setenv("VOLTRIX_TPU_CACHE_DIR", str(tmp_path))
    arg_defs = (("x", np.int32), ("n", int))
    code = jit.generate(
        (), arg_defs, "for (long long i = 0; i < n; ++i) x[i] += 1;"
    )
    rt1 = jit.build("inc_kernel", arg_defs, code)
    # second build must hit the in-memory cache (same object back)
    rt2 = jit.build("inc_kernel", arg_defs, code)
    assert rt1 is rt2
    # on-disk hit: a fresh RuntimeCache loads arg defs from kernel.args
    fresh = jit.RuntimeCache()
    rt3 = fresh[rt1.path]
    assert rt3 is not None
    x = np.zeros(4, dtype=np.int32)
    assert rt3(x, 4) == 0
    np.testing.assert_array_equal(x, [1, 1, 1, 1])


def test_arg_validation(tmp_path, monkeypatch):
    monkeypatch.setenv("VOLTRIX_TPU_CACHE_DIR", str(tmp_path))
    arg_defs = (("x", np.float32),)
    rt = jit.build(
        "noop_kernel", arg_defs, jit.generate((), arg_defs, "(void)x;")
    )
    with pytest.raises(AssertionError):
        rt(np.zeros(4, dtype=np.float64))  # wrong dtype
    with pytest.raises(AssertionError):
        rt()  # wrong arity


def test_build_failure_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("VOLTRIX_TPU_CACHE_DIR", str(tmp_path))
    with pytest.raises(RuntimeError, match="JIT build failed"):
        jit.build("bad_kernel", (), "this is not C++")
