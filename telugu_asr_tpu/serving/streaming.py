"""Growing-window streaming recognition over the offline Moonshine stack.

Design: the Moonshine encoder is BIDIRECTIONAL (full self-attention over the
whole utterance, models/moonshine/encoder.py), so a mathematically exact
"incremental encoder state" does not exist — any true chunked-attention
streaming encoder computes a different function from the one the weights
were trained for.  Instead of silently changing the model, this recognizer
re-runs the (fast) full pipeline over ALL audio buffered so far at each
partial-result tick — the standard growing-window scheme:

* ``accept(chunk)`` buffers host audio; when at least ``partial_interval``
  seconds arrived since the last tick it runs featurize → encode → fused
  greedy decode over the padded buffer and returns a PARTIAL transcript
  (partials may revise as right-context grows — inherent to a
  bidirectional model, not an implementation artifact).
* ``finalize()`` runs the same pipeline once over the exact buffered audio
  and is IDENTICAL to offline :func:`telugu_asr_tpu.decode.greedy.recognize`
  on the full signal (tested) — padding to a bucket is invisible because
  the featurizer masks padded samples before per-utterance peak
  normalization and the encoder mask laws make padded frames inert, and the
  decode length cap is taken from the TRUE frame count.
* Audio is padded to a fixed ladder of duration buckets so the number of
  compiled programs is bounded (one per bucket), mirroring the batch
  pipeline's bucketing strategy (data/dataset.py).

Cost: each tick re-encodes the whole buffer, so total work over an
utterance of N ticks is O(N²) in encoder FLOPs — for the 3.26M-param
flagship this is milliseconds per tick on one chip (the fused decode kernel
carries the decode), which is what makes the simple-and-exact scheme
practical.  A latency-optimal chunked-attention encoder would need
streaming-aware training (no such weights exist in the reference) and is
out of scope.
"""
from __future__ import annotations

import bisect
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode

__all__ = ["StreamingRecognizer"]

DEFAULT_BUCKETS_SECONDS = (2.0, 4.0, 8.0, 12.0, 17.73, 30.0)


class StreamingRecognizer:
    """Incremental speech→text over a Moonshine model.

    Args:
      model/params: the ASRModel and its param pytree.
      featurizer: a :class:`telugu_asr_tpu.audio.featurizer.SpeechFeaturizer`.
      tokenizer: any tokenizer with ``decode(ids, skip_special_tokens=True)``.
      sample_rate: of the incoming audio chunks.
      partial_interval: seconds of new audio between partial-result ticks
        (``accept`` returns None between ticks).
      buckets_seconds: padded-duration ladder bounding compile count.
    """

    def __init__(
        self,
        model,
        params: dict,
        featurizer,
        tokenizer,
        *,
        sample_rate: int = 16000,
        partial_interval: float = 1.0,
        buckets_seconds: Tuple[float, ...] = DEFAULT_BUCKETS_SECONDS,
        attention_impl: Optional[str] = None,
        decode_params: Optional[dict] = None,
    ):
        self.model = model
        self.params = params
        self.featurizer = featurizer
        self.tokenizer = tokenizer
        # e.g. an int8-quantized tree served VMEM-resident by the fused
        # kernel while the encoder runs the float params (transcribe --int8)
        self.decode_params = decode_params if decode_params is not None else params
        self.sample_rate = int(sample_rate)
        self.partial_interval = float(partial_interval)
        self.bucket_samples = sorted(
            int(round(s * sample_rate)) for s in buckets_seconds
        )
        self.attention_impl = attention_impl
        self.reset()

    # -- lifecycle -----------------------------------------------------------

    def reset(self) -> None:
        self._chunks: List[np.ndarray] = []
        self._num_samples = 0
        self._since_tick = 0
        self._last_partial = ""

    @property
    def buffered_seconds(self) -> float:
        return self._num_samples / self.sample_rate

    # -- streaming interface ---------------------------------------------------

    def accept(self, chunk: np.ndarray) -> Optional[str]:
        """Buffer an audio chunk; returns a partial transcript on ticks."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        self._chunks.append(chunk)
        self._num_samples += chunk.size
        self._since_tick += chunk.size
        if self._since_tick < self.partial_interval * self.sample_rate:
            return None
        self._since_tick = 0
        self._last_partial = self._recognize_buffer()
        return self._last_partial

    def partial(self) -> str:
        """Latest partial transcript (may be stale; force with accept ticks)."""
        return self._last_partial

    def finalize(self) -> str:
        """Final transcript over everything buffered — identical to the
        offline ``recognize`` on the concatenated audio."""
        if self._num_samples == 0:
            return ""
        text = self._recognize_buffer(exact_cap=True)
        self._last_partial = text
        return text

    # -- internals -------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.bucket_samples, n)
        if i < len(self.bucket_samples):
            return self.bucket_samples[i]
        # beyond the ladder: round up to the largest bucket's granularity
        top = self.bucket_samples[-1]
        return -(-n // top) * top

    def _recognize_buffer(self, exact_cap: bool = False) -> str:
        audio = np.concatenate(self._chunks) if len(self._chunks) > 1 else self._chunks[0]
        self._chunks = [audio]  # keep the buffer flat
        n = audio.size
        padded = self._bucket(n)
        signal = jnp.asarray(
            np.pad(audio, (0, padded - n))[None, :]
        )
        lengths = jnp.asarray([n], jnp.int32)
        feats, feat_lengths = self.featurizer(signal, lengths)
        # ``max_length`` is a static jit arg of greedy_decode, so partial
        # ticks derive it from the PADDED bucket's frame count — compiled
        # programs stay bounded by the bucket ladder instead of retracing on
        # every tick's true sample count.  finalize() uses the exact
        # true-frame cap, where offline parity is required.
        cap_frames = self.featurizer.get_nframes(n if exact_cap else padded)
        max_length = default_max_length(
            int(cap_frames),
            frame_step=self.featurizer.config.frame_step,
            frame_length=self.featurizer.config.frame_length,
            sample_rate=self.sample_rate,
        )
        encoder_out, encoder_mask = self.model.encode(
            self.params, feats, feat_lengths
        )
        tokens, token_lengths = greedy_decode(
            self.model,
            self.decode_params,
            encoder_out,
            encoder_mask,
            max_length=max_length,
            bos_id=self.tokenizer.bos_token_id,
            eos_id=self.tokenizer.eos_token_id,
            pad_id=self.tokenizer.pad_token_id,
            attention_impl=self.attention_impl,
        )
        ids = np.asarray(tokens)[0, : int(token_lengths[0])]
        return self.tokenizer.decode([int(t) for t in ids], skip_special_tokens=True)
