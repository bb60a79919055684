"""Long-form transcription: segment → batched recognize → stitch.

The reference model is trained on utterances ≤17.73 s (SURVEY §5: max test
utterance; RoPE extrapolates but quality is out-of-distribution beyond the
training durations, reference model.py:231-234 caps decode at 24 tokens/s of
*whatever* duration arrives).  For longer recordings the standard scheme is
Whisper-style windowing: cut the audio into segments no longer than the
training maximum — at LOW-ENERGY points so words are not split — recognize
the segments as one padded batch (reusing the bucketed batch pipeline and
the fused decode kernel), and join the texts.

Segmentation is exact-cover and non-overlapping: greedy forward cuts, each
at the minimum-RMS frame inside the last ``search_seconds`` before the
``max_seconds`` boundary.  No audio is dropped or duplicated, so a file
that is already ≤ ``max_seconds`` round-trips unchanged through a single
segment (tested), and the concatenated segment lengths always sum to the
input length.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = ["segment_longform", "recognize_long_form"]


def segment_longform(
    wave: np.ndarray,
    sample_rate: int = 16000,
    max_seconds: float = 15.0,
    search_seconds: float = 2.0,
    frame_ms: float = 25.0,
) -> List[Tuple[int, int]]:
    """Cut ``wave`` into consecutive [start, end) sample spans ≤ max_seconds.

    Each cut lands on the lowest-RMS ``frame_ms`` frame inside the trailing
    ``search_seconds`` of the would-be maximal segment (pauses between words
    are energy minima).  The spans partition the signal exactly.
    """
    n = int(len(wave))
    max_n = max(1, int(max_seconds * sample_rate))
    search_n = min(max(1, int(search_seconds * sample_rate)), max_n)
    frame_n = max(1, int(frame_ms * sample_rate / 1000.0))
    spans: List[Tuple[int, int]] = []
    start = 0
    while n - start > max_n:
        hi = start + max_n
        lo = hi - search_n
        window = np.asarray(wave[lo:hi], np.float32)
        # frame RMS over the search window; cut at the quietest frame center
        n_frames = max(1, len(window) // frame_n)
        frames = window[: n_frames * frame_n].reshape(n_frames, frame_n)
        rms = np.sqrt(np.mean(frames * frames, axis=1))
        best = int(np.argmin(rms))
        cut = lo + best * frame_n + frame_n // 2
        cut = int(min(max(cut, start + 1), hi))  # never an empty segment
        spans.append((start, cut))
        start = cut
    spans.append((start, n))
    return spans


def recognize_long_form(
    model,
    params: dict,
    featurizer,
    tokenizer,
    wave: np.ndarray,
    *,
    decode_params: Optional[dict] = None,
    max_seconds: float = 15.0,
    search_seconds: float = 2.0,
    sample_rate: int = 16000,
    attention_impl: Optional[str] = None,
    cache_dtype: Optional[str] = None,
) -> str:
    """Transcribe arbitrarily long audio through ≤ ``max_seconds`` windows.

    Segments are recognized as ONE padded batch (they share a compiled
    shape: every span but the last is within ``frame_ms`` of ``max_seconds``
    long, and the batch pads to the longest), then the per-segment texts are
    stitched with single spaces.  ``decode_params`` lets the caller pass an
    int8-quantized decoder tree while the encoder runs float (transcribe.py
    --int8 convention).
    """
    import jax.numpy as jnp

    from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode_staged

    spans = segment_longform(
        wave, sample_rate, max_seconds=max_seconds, search_seconds=search_seconds
    )
    longest = max(end - start for start, end in spans)
    padded = -(-longest // sample_rate) * sample_rate  # 1 s quantum
    audio = np.zeros((len(spans), padded), np.float32)
    lengths = np.zeros((len(spans),), np.int32)
    for row, (start, end) in enumerate(spans):
        audio[row, : end - start] = wave[start:end]
        lengths[row] = end - start
    feats, fl = featurizer(jnp.asarray(audio), jnp.asarray(lengths))
    encoder_out, encoder_mask = model.encode(params, feats, fl)
    tokens, _ = greedy_decode_staged(
        model,
        decode_params if decode_params is not None else params,
        encoder_out,
        encoder_mask,
        max_length=default_max_length(int(feats.shape[1])),
        bos_id=tokenizer.bos_token_id,
        eos_id=tokenizer.eos_token_id,
        pad_id=tokenizer.pad_token_id,
        attention_impl=attention_impl,
        cache_dtype=cache_dtype,
    )
    texts = tokenizer.batch_decode(np.asarray(tokens).tolist(), skip_special_tokens=True)
    return " ".join(t.strip() for t in texts if t.strip())
