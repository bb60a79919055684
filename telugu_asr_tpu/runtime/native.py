"""ctypes bindings + on-demand build for the native audio runtime.

The shared library is compiled once per machine into the package directory
(g++ is in the image; no pip/pybind needed).  ``NativeAudioDecoder`` is a
drop-in fast path for the dataset's audio loading: it decodes a whole batch
of WAV files into one row-major float32 buffer on a thread pool, overlapping
disk I/O with device compute.  Python fallback: telugu_asr_tpu.audio.io.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "audio_io.cc")
_LIB = os.path.join(os.path.dirname(__file__), "libtasr_audio.so")

__all__ = ["build_native_library", "native_available", "NativeAudioDecoder"]


def build_native_library(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed; returns its path or None."""
    if os.path.exists(_LIB) and not force:
        if os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _LIB
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def native_available() -> bool:
    return build_native_library() is not None


class NativeAudioDecoder:
    def __init__(self, num_threads: int = 4):
        lib_path = build_native_library()
        if lib_path is None:
            raise RuntimeError("native audio library unavailable (g++ build failed)")
        self._lib = ctypes.CDLL(lib_path)
        self._lib.decode_wav.restype = ctypes.c_long
        self._lib.decode_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        self._lib.decode_wav_batch.restype = ctypes.c_long
        self._lib.decode_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
        ]
        self.num_threads = num_threads

    def decode(self, path: str, max_samples: int) -> Tuple[np.ndarray, int]:
        out = np.zeros((max_samples,), np.float32)
        rate = ctypes.c_int(0)
        got = self._lib.decode_wav(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples,
            ctypes.byref(rate),
        )
        if got < 0:
            raise IOError(f"failed to decode {path}")
        return out[:got], int(rate.value)

    def decode_batch(
        self, paths: Sequence[str], max_samples: int, out: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Decode ``paths`` into ``[n, max_samples]`` float32 (zero-padded).

        Returns (buffer, lengths, failure_count) — failed rows have length 0.
        """
        n = len(paths)
        if out is None:
            out = np.zeros((n, max_samples), np.float32)
        assert out.shape == (n, max_samples) and out.dtype == np.float32
        lengths = np.zeros((n,), np.int64)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self._lib.decode_wav_batch(
            arr,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            self.num_threads,
        )
        return out, lengths.astype(np.int32), int(failures)
