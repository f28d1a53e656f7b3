"""ctypes binding for the native vector-I/O library, built on demand with g++.

Falls back cleanly (ImportError from this module) when no compiler is available;
callers (utils/vectors.py) then use the vectorized numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "vector_io.cpp"
_SO = _DIR / "libvector_io.so"
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.parse_entries.restype = None
        lib.parse_entries.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.entries_to_grid.restype = ctypes.c_int64
        lib.entries_to_grid.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        for name in ("complex_to_ri", "ri_to_complex"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
        lib.ri_to_complex_mt.restype = None
        lib.ri_to_complex_mt.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.assemble_batch_ri.restype = None
        lib.assemble_batch_ri.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_entries(raw: bytes) -> np.ndarray:
    """Parse expected_entry_t records via the native library."""
    lib = _get_lib()
    n = len(raw) // 12
    out = np.empty(
        n, dtype=[("sym", np.int32), ("port", np.int32), ("sc", np.int32), ("value", np.complex64)]
    )
    sym = np.empty(n, np.int32)
    port = np.empty(n, np.int32)
    sc = np.empty(n, np.int32)
    val = np.empty(n, np.complex64)
    lib.parse_entries(raw, n, _i32p(sym), _i32p(port), _i32p(sc), _f32p(val.view(np.float32)))
    out["sym"] = sym
    out["port"] = port
    out["sc"] = sc
    out["value"] = val
    return out


def entries_to_grid(raw: bytes, n_sc: int, n_sym: int, n_layers: int) -> np.ndarray:
    """Parse + scatter records straight into a dense complex64 grid (fused path)."""
    lib = _get_lib()
    n = len(raw) // 12
    grid = np.zeros((n_sc, n_sym, n_layers), dtype=np.complex64)
    oob = lib.entries_to_grid(raw, n, _f32p(grid.view(np.float32)), n_sc, n_sym, n_layers)
    if oob:
        raise ValueError(f"{oob} records outside the ({n_sc},{n_sym},{n_layers}) grid")
    return grid


def complex_to_ri(x: np.ndarray) -> np.ndarray:
    """(B, ...) complex64 -> (B, 2, ...) float32 planar, native speed."""
    lib = _get_lib()
    x = np.ascontiguousarray(x, dtype=np.complex64)
    b = x.shape[0]
    n = x.size // b
    out = np.empty((b, 2) + x.shape[1:], np.float32)
    lib.complex_to_ri(_f32p(x.view(np.float32)), _f32p(out), b, n)
    return out


def ri_to_complex(x: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """(B, 2, ...) float32 planar -> (B, ...) complex64, native speed.

    n_threads > 1 splits the interleave over problems (serving result-scatter
    merges whole output batches this way); 0 = auto (min(8, cpu count))."""
    import os

    lib = _get_lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    b = x.shape[0]
    n = x.size // (2 * b)
    out = np.empty((b,) + x.shape[2:], np.complex64)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.ri_to_complex_mt(_f32p(x), _f32p(out.view(np.float32)), b, n, n_threads)
    return out


def assemble_batch_ri(arrays, n_threads: int = 0) -> np.ndarray:
    """Gather B independently-allocated complex64 problems (same shape) into one
    contiguous (B, 2, ...) float32 ri batch, multithreaded.

    This is the serving front-end's host-side packing step (serving.process):
    problems arrive as separate buffers per (cell, UE, slot); the assembled batch
    feeds jax.device_put directly.
    """
    import os

    lib = _get_lib()
    arrays = [np.ascontiguousarray(a, dtype=np.complex64) for a in arrays]
    b = len(arrays)
    assert b > 0 and all(a.shape == arrays[0].shape for a in arrays)
    n = arrays[0].size
    out = np.empty((b, 2) + arrays[0].shape, np.float32)
    ptrs = (ctypes.POINTER(ctypes.c_float) * b)(
        *[_f32p(a.view(np.float32)) for a in arrays]
    )
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.assemble_batch_ri(ptrs, _f32p(out), b, n, n_threads)
    return out
