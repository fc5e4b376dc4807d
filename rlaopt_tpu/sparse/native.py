"""Build + registration of the native CPU sparse kernels.

Replaces the reference's setuptools/TORCH_LIBRARY extension machinery
(``setup.py:23-106``, ``csrc/cpp/module.cpp``): the C++ file is compiled
on first use with g++ against the XLA FFI headers shipped in jaxlib, cached
by content hash, dlopen'ed, and its handlers registered as XLA custom calls
on the CPU platform.

Env toggles (analog of ``RLAOPT_CPU_ONLY``/``RLAOPT_USE_OPENMP``/
``RLAOPT_DEBUG``):
    RLAOPT_TPU_NATIVE=0      disable native kernels (pure-XLA fallback)
    RLAOPT_TPU_NO_OPENMP=1   build without OpenMP
    RLAOPT_TPU_DEBUG=1       build -O0 -g
    RLAOPT_TPU_CACHE=<dir>   build cache directory
"""

import ctypes
import hashlib
import os
import pathlib
import subprocess


__all__ = ["native_available", "ensure_registered", "TARGET_PREFIX"]

TARGET_PREFIX = "rlaopt_tpu_"

_HANDLERS = {
    "csc_matvec": "RlaoptCscMatvec",
    "csc_matmat": "RlaoptCscMatmat",
    "csr_matvec": "RlaoptCsrMatvec",
    "csr_matmat": "RlaoptCsrMatmat",
    "gather_rows": "RlaoptGatherRows",
}

_state = {"lib": None, "registered": False, "failed": False}


def _source_path() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parent.parent / "csrc" / "sparse_ops.cc"


def _build_lib() -> pathlib.Path:
    import jax.ffi

    src = _source_path()
    cache_dir = pathlib.Path(
        os.environ.get(
            "RLAOPT_TPU_CACHE",
            pathlib.Path.home() / ".cache" / "rlaopt_tpu",
        )
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha1(src.read_bytes()).hexdigest()[:12]
    so = cache_dir / f"sparse_ops_{tag}.so"
    if so.exists():
        return so
    debug = os.environ.get("RLAOPT_TPU_DEBUG") == "1"
    cmd = [
        "g++",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-O0" if debug else "-O3",
    ]
    if debug:
        cmd.append("-g")
    if os.environ.get("RLAOPT_TPU_NO_OPENMP") != "1":
        cmd.append("-fopenmp")
    cmd += [f"-I{jax.ffi.include_dir()}", str(src), "-o", str(so)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def ensure_registered() -> bool:
    """Build (if needed), load, and register the FFI targets. Idempotent."""
    if _state["registered"]:
        return True
    if _state["failed"] or os.environ.get("RLAOPT_TPU_NATIVE") == "0":
        return False
    try:
        import jax.ffi

        so = _build_lib()
        lib = ctypes.CDLL(str(so))
        for op, symbol in _HANDLERS.items():
            fn = getattr(lib, symbol)
            jax.ffi.register_ffi_target(
                TARGET_PREFIX + op, jax.ffi.pycapsule(fn), platform="cpu"
            )
        _state["lib"] = lib
        _state["registered"] = True
        return True
    except Exception:
        _state["failed"] = True
        return False


def native_available() -> bool:
    return ensure_registered()
