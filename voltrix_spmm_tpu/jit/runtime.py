"""Compiled-kernel handle + cache.

Role-parity with the reference's runtime layer (voltrix/jit/runtime.py:
1-72): `Runtime` lazily dlopens the built .so, validates arguments
against the recorded arg_defs, and calls `launch`, returning its int
status; `RuntimeCache` provides memory + on-disk hits.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .template import map_ctype


class Runtime:
    def __init__(self, path: str, arg_defs):
        self.path = path
        self.arg_defs = tuple(arg_defs)
        self.lib = None
        self._launch = None

    @staticmethod
    def is_path_valid(path: str) -> bool:
        return os.path.isdir(path) and all(
            os.path.exists(os.path.join(path, f))
            for f in ("kernel.cpp", "kernel.args", "kernel.so")
        )

    def _load(self):
        self.lib = ctypes.CDLL(os.path.join(self.path, "kernel.so"))
        fn = self.lib.launch
        fn.restype = ctypes.c_int
        fn.argtypes = [map_ctype(dtype) for _, dtype in self.arg_defs]
        self._launch = fn

    def __call__(self, *args) -> int:
        if self._launch is None:
            self._load()
        assert len(args) == len(self.arg_defs), (
            f"expected {len(self.arg_defs)} args, got {len(args)}"
        )
        cargs = []
        for arg, (name, dtype) in zip(args, self.arg_defs):
            if isinstance(dtype, type) and issubclass(dtype, np.generic):
                assert isinstance(arg, np.ndarray), f"{name}: expected ndarray"
                assert arg.dtype == dtype, (
                    f"{name}: expected {np.dtype(dtype)}, got {arg.dtype}"
                )
                assert arg.flags["C_CONTIGUOUS"], f"{name}: must be C-contiguous"
                cargs.append(ctypes.c_void_p(arg.ctypes.data))
            elif dtype is int:
                assert isinstance(arg, (int, np.integer)), f"{name}: expected int"
                cargs.append(ctypes.c_int64(int(arg)))
            elif dtype is float:
                assert isinstance(arg, (int, float, np.floating)), (
                    f"{name}: expected float"
                )
                cargs.append(ctypes.c_double(float(arg)))
            else:
                raise TypeError(f"{name}: unsupported arg_def dtype {dtype!r}")
        return int(self._launch(*cargs))


class RuntimeCache:
    def __init__(self):
        self.cache: dict[str, Runtime] = {}

    def __getitem__(self, path: str) -> Runtime | None:
        if path in self.cache:
            return self.cache[path]
        # on-disk hit from a previous process (reference runtime.py:59-69)
        if Runtime.is_path_valid(path):
            import json

            with open(os.path.join(path, "kernel.args")) as f:
                arg_defs = [
                    (name, _dtype_from_str(ds)) for name, ds in json.load(f)
                ]
            rt = Runtime(path, arg_defs)
            self.cache[path] = rt
            return rt
        return None

    def __setitem__(self, path: str, runtime: Runtime):
        self.cache[path] = runtime


def _dtype_from_str(s: str):
    if s == "int":
        return int
    if s == "float":
        return float
    return np.dtype(s).type


def dtype_to_str(dtype) -> str:
    if dtype is int:
        return "int"
    if dtype is float:
        return "float"
    return np.dtype(dtype).name
