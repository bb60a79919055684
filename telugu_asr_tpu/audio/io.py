"""WAV audio I/O — pure NumPy RIFF parsing, no librosa/soundfile dependency.

The reference's load path (src/utils/data_util.py:10-40) decodes WAV via
librosa / ``tf.audio.decode_wav``; both scale 16-bit PCM by 1/32768 to
float32 in [-1, 1).  We parse RIFF directly (PCM 8/16/24/32 and IEEE float)
with identical scaling.  Note the reference's tensor path never resamples —
source audio is assumed to already be at the target rate (data_util.py:30-33);
``resample_poly`` is provided for callers that need it.
"""
from __future__ import annotations

import io
import struct
from typing import Tuple

import numpy as np

__all__ = ["read_wav_bytes", "read_wav_file", "resample_poly"]


def read_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE byte string → (float32 mono waveform, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    n = len(data)
    while pos + 8 <= n:
        chunk_id = data[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif chunk_id == b"data":
            raw = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks are word-aligned
        if fmt is not None and raw is not None:
            break
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(raw) >= 0:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = 1  # assume PCM subformat (most common)

    if audio_format == 1:  # integer PCM
        if bits == 16:
            wave = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            wave = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            wave = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            wave = vals.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    elif audio_format == 3:  # IEEE float
        dtype = "<f4" if bits == 32 else "<f8"
        wave = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format code: {audio_format}")

    if channels > 1:
        wave = wave[: (len(wave) // channels) * channels]
        wave = wave.reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(wave, dtype=np.float32), int(sample_rate)


def read_wav_file(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return read_wav_bytes(f.read())


def resample_poly(wave: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (scipy) for off-rate sources."""
    if orig_sr == target_sr:
        return wave
    from math import gcd

    from scipy.signal import resample_poly as _rp

    g = gcd(orig_sr, target_sr)
    return _rp(wave, target_sr // g, orig_sr // g).astype(np.float32)


def write_wav_file(path: str, wave: np.ndarray, sample_rate: int) -> None:
    """Write float32 mono audio as 16-bit PCM (test fixtures / tooling)."""
    pcm = np.clip(np.asarray(wave, dtype=np.float64) * 32768.0, -32768, 32767).astype("<i2")
    body = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(body)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(body)))
        f.write(body)
