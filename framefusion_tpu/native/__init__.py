"""Build-on-demand ctypes bindings for the native preprocessing kernels.

``load()`` compiles ``prep.cpp`` with the system g++ the first time (cached
as ``_build/libffprep-<hash>.so``, keyed by source hash so edits rebuild)
and returns the loaded library, or ``None`` when no toolchain is available —
callers fall back to the NumPy twin in framefusion_tpu/preprocess.py, which
computes the identical math. ctypes releases the GIL for the call, so the
threaded C++ resize genuinely overlaps the Python serving loop.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "prep.cpp")
_LOCK = threading.Lock()
_CACHE = {"lib": None, "tried": False, "error": None}

_RESAMPLE = {"bilinear": 0, "bicubic": 1}


def _build() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    build_dir = os.path.join(_DIR, "_build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, f"libffprep-{tag}.so")
    if not os.path.exists(so):
        # Unique temp per builder: concurrent processes (parallel pytest,
        # multiple serving hosts) must not interleave writes to one .tmp —
        # a torn file os.replace()d into the hash-keyed path would poison
        # the cache permanently. os.replace itself is atomic.
        tmp = f"{so}.{os.getpid()}.tmp"
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-pthread", "-std=c++17",
               _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    return so


def load(required: bool = False):
    """Compile (once) and load the native library; None if unavailable."""
    with _LOCK:
        if _CACHE["lib"] is not None:
            return _CACHE["lib"]
        if _CACHE["tried"] and not required:
            return None
        try:
            lib = ctypes.CDLL(_build())
        except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
            _CACHE["tried"] = True
            _CACHE["error"] = repr(e)
            if required:
                raise RuntimeError(f"native preprocessing unavailable: {e!r}") from e
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ff_resize_frames.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_float, f32p,
        ]
        lib.ff_resize_frames.restype = None
        lib.ff_normalize.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, f32p, f32p, ctypes.c_float,
        ]
        lib.ff_normalize.restype = None
        _CACHE["lib"] = lib
        _CACHE["tried"] = True
        return lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_frames(lib, frames: np.ndarray, out_h: int, out_w: int,
                  resample: str, normalize: Optional[tuple] = None) -> np.ndarray:
    """(T, H, W, C) float32 -> (T, out_h, out_w, C) float32 via the native
    threaded kernel; ``normalize=(mean, std, rescale)`` fuses the epilogue."""
    t, h, w, c = frames.shape
    frames = np.ascontiguousarray(frames, np.float32)
    out = np.empty((t, out_h, out_w, c), np.float32)
    if normalize is not None:
        mean, std, rescale = normalize
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        assert mean.shape == (c,) and std.shape == (c,)
        mp, sp, rs = _f32p(mean), _f32p(std), float(rescale)
    else:
        mp = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        sp = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        rs = 1.0
    lib.ff_resize_frames(_f32p(frames), t, h, w, c, out_h, out_w,
                         _RESAMPLE[resample], mp, sp, rs, _f32p(out))
    return out


def normalize_frames(lib, frames: np.ndarray, mean, std, rescale: float) -> np.ndarray:
    """In-place threaded normalize over the trailing channel axis."""
    frames = np.ascontiguousarray(frames, np.float32)
    c = frames.shape[-1]
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.ff_normalize(_f32p(frames), frames.size // c, c,
                     _f32p(mean), _f32p(std), float(rescale))
    return frames
