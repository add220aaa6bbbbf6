"""Native (C++) runtime components, bound via ctypes.

Currently: the WAV chunk reader/writer behind the data pipeline
(wav_reader.cpp).  The shared library is compiled with g++ on first use and
cached next to the source, keyed by a source hash so edits rebuild.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "wav_reader.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> str:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    out = os.path.join(os.path.dirname(_SRC), f"_wav_reader_{digest}.so")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, out)
        # drop stale builds
        for f in os.listdir(os.path.dirname(_SRC)):
            if f.startswith("_wav_reader_") and f.endswith(".so") and f not in out:
                try:
                    os.remove(os.path.join(os.path.dirname(_SRC), f))
                except OSError:
                    pass
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                lib = ctypes.CDLL(_build_lib())
                lib.tfswa_wav_info.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.tfswa_wav_info.restype = ctypes.c_int
                lib.tfswa_wav_read.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.tfswa_wav_read.restype = ctypes.c_int
                lib.tfswa_wav_write.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ctypes.c_int32,
                ]
                lib.tfswa_wav_write.restype = ctypes.c_int
                _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def wav_info(path: str) -> Tuple[int, int, int]:
    """-> (num_frames, channels, sample_rate)."""
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = _lib().tfswa_wav_info(
        path.encode(), ctypes.byref(frames), ctypes.byref(channels),
        ctypes.byref(sr),
    )
    if rc != 0:
        raise IOError(f"wav_info({path}) failed with code {rc}")
    return frames.value, channels.value, sr.value


def wav_read(
    path: str, start: int, num_frames: int, num_channels: int = 2
) -> np.ndarray:
    """Positioned read -> planar float32 (num_channels, num_frames);
    zero-padded past EOF, mono duplicated."""
    out = np.zeros((num_channels, num_frames), dtype=np.float32)
    rc = _lib().tfswa_wav_read(
        path.encode(), start, num_frames, num_channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"wav_read({path}) failed with code {rc}")
    return out


def wav_write(path: str, data: np.ndarray, sample_rate: int) -> None:
    """Write planar float32 (channels, frames) as PCM16 WAV."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    assert data.ndim == 2
    rc = _lib().tfswa_wav_write(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[1], data.shape[0], sample_rate,
    )
    if rc != 0:
        raise IOError(f"wav_write({path}) failed with code {rc}")
