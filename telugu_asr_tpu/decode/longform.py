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
    # never larger than the search window (a sub-frame window degrades to a
    # plain boundary cut instead of crashing the reshape)
    frame_n = min(max(1, int(frame_ms * sample_rate / 1000.0)), search_n)
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
    batch_size: int = 16,
    beam_size: int = 1,
    attention_impl: Optional[str] = None,
    cache_dtype: Optional[str] = None,
) -> str:
    """Transcribe arbitrarily long audio through ≤ ``max_seconds`` windows.

    Segments are recognized in padded batches of exactly ``batch_size`` rows
    (short tails are padded with zero-length rows — the mask laws make them
    inert — so an hour-long recording compiles the SAME program as a short
    one and device memory stays bounded), then the per-segment texts are
    stitched with single spaces in time order.  ``decode_params`` lets the
    caller pass an int8-quantized decoder tree while the encoder runs float;
    ``beam_size > 1`` runs beam search over the float params instead
    (transcribe.py --int8/--beam conventions).
    """
    import jax.numpy as jnp

    from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode_staged

    spans = segment_longform(
        wave, sample_rate, max_seconds=max_seconds, search_seconds=search_seconds
    )
    padded = -(-max(e - s for s, e in spans) // sample_rate) * sample_rate  # 1 s quantum
    texts: List[str] = []
    for lo in range(0, len(spans), batch_size):
        group = spans[lo : lo + batch_size]
        rows = batch_size if len(spans) > batch_size else len(group)
        audio = np.zeros((rows, padded), np.float32)
        lengths = np.zeros((rows,), np.int32)
        for row, (start, end) in enumerate(group):
            audio[row, : end - start] = wave[start:end]
            lengths[row] = end - start
        feats, fl = featurizer(jnp.asarray(audio), jnp.asarray(lengths))
        encoder_out, encoder_mask = model.encode(params, feats, fl)
        kwargs = dict(
            max_length=default_max_length(int(feats.shape[1])),
            bos_id=tokenizer.bos_token_id,
            eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id,
        )
        if beam_size > 1:
            from telugu_asr_tpu.decode.beam import beam_search_decode

            tokens, _ = beam_search_decode(
                model, params, encoder_out, encoder_mask,
                beam_size=beam_size, **kwargs,
            )
        else:
            tokens, _ = greedy_decode_staged(
                model,
                decode_params if decode_params is not None else params,
                encoder_out,
                encoder_mask,
                attention_impl=attention_impl,
                cache_dtype=cache_dtype,
                **kwargs,
            )
        texts += tokenizer.batch_decode(
            np.asarray(tokens)[: len(group)].tolist(), skip_special_tokens=True
        )
    return " ".join(t.strip() for t in texts if t.strip())
