"""g++ JIT build with a persistent content-addressed cache.

Role-parity with the reference's nvcc JIT compiler
(voltrix/jit/compiler.py:1-189): compiler discovery with env override,
a signature hash over (name, sources, code, compiler, flags), cache
directories under the user home with POSIX-atomic writes, and a
`build()` returning a callable Runtime. nvcc/CUDA specifics are
replaced by g++/OpenMP for the host-native runtime.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import tempfile

from ..project import const
from .runtime import Runtime, RuntimeCache, dtype_to_str

runtime_cache = RuntimeCache()

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")


def get_cxx_compiler() -> str:
    override = os.environ.get(const.CXX_COMPILER_FLAG)
    if override:
        return override
    for cand in ("g++", "clang++", "c++"):
        path = shutil.which(cand)
        if path:
            return path
    raise RuntimeError("no C++ compiler found")


def get_cache_dir() -> str:
    return os.environ.get(
        const.CACHE_DIR_FLAG,
        os.path.join(os.path.expanduser("~"), ".voltrix_spmm_tpu", "cache"),
    )


def get_repo_version() -> str:
    """md5 over all shipped native sources (reference compiler.py:45-59
    hashes all .cuh) so cache entries invalidate on source change."""
    md5 = hashlib.md5()
    if os.path.isdir(_CSRC_DIR):
        for fname in sorted(os.listdir(_CSRC_DIR)):
            if fname.endswith((".hpp", ".h", ".cpp")):
                with open(os.path.join(_CSRC_DIR, fname), "rb") as f:
                    md5.update(f.read())
    return md5.hexdigest()[:16]


def _atomic_write(path: str, data: str):
    # tmp + os.replace, as in reference compiler.py:109-114
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, "w") as f:
        f.write(data)
    os.replace(tmp, path)


def default_flags() -> list[str]:
    return [
        "-std=c++17",
        "-O3",
        "-shared",
        "-fPIC",
        "-fopenmp",
        "-march=native",
        f"-I{_CSRC_DIR}",
    ]


def build(name: str, arg_defs, code: str) -> Runtime:
    """Compile `code` (a full translation unit from `generate`) into a
    cached shared library; return its Runtime handle."""
    compiler = get_cxx_compiler()
    flags = default_flags()
    try:
        cxx_version = subprocess.check_output(
            [compiler, "--version"], text=True
        ).splitlines()[0]
    except Exception:
        cxx_version = "unknown"

    signature = "$$".join(
        [name, get_repo_version(), code, compiler, cxx_version, " ".join(flags)]
    )
    digest = hashlib.md5(signature.encode()).hexdigest()[:16]
    path = os.path.join(get_cache_dir(), f"kernel.{name}.{digest}")

    cached = runtime_cache[path]
    if cached is not None:
        return cached

    os.makedirs(path, exist_ok=True)
    _atomic_write(os.path.join(path, "kernel.cpp"), code)
    _atomic_write(
        os.path.join(path, "kernel.args"),
        json.dumps([(n, dtype_to_str(d)) for n, d in arg_defs]),
    )

    so_tmp = os.path.join(path, "kernel.so.tmp")
    so_path = os.path.join(path, "kernel.so")
    cmd = [compiler, *flags, "-o", so_tmp, os.path.join(path, "kernel.cpp")]
    debug = os.environ.get(const.DEBUG_FLAG, "0") == "1"
    if debug or os.environ.get(const.PRINT_CXX_COMMAND_FLAG, "0") == "1":
        print("voltrix_tpu jit:", " ".join(cmd))
    if debug:
        print(f"voltrix_tpu jit: cache dir {path}")
        print(f"voltrix_tpu jit: source\n{code}")
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        raise RuntimeError(
            f"C++ JIT build failed for {name}:\n{result.stderr}"
        )
    os.replace(so_tmp, so_path)

    rt = Runtime(path, arg_defs)
    runtime_cache[path] = rt
    return rt
