"""Benchmark: batched greedy-decode inference throughput (RTFx) on one chip.

Measures end-to-end recognition — on-device log-mel featurization, encoder,
and KV-cached batched greedy decode — on synthetic 16 kHz audio matching the
reference test set's utterance statistics (mean 5.46 s; BASELINE.md).  The
decode runs the FULL reference length cap (duration × 24 tokens) with no
early EOS exit (untrained weights), so this is a worst-case RTFx: a trained
model stops at EOS and goes faster.

Prints one JSON line:
``{"metric": "rtfx", "value": N, "unit": "x_realtime", "vs_baseline": N}``
where the baseline is the north-star ≥20× real-time per chip (BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode
    from telugu_asr_tpu.text import make_default_tokenizer

    from __graft_entry__ import _flagship

    tokenizer = make_default_tokenizer()
    model = _flagship(tokenizer.vocab_size)
    params = model.init(jax.random.PRNGKey(0))
    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))

    batch = 64
    seconds = 5.46  # reference test-set mean utterance
    samples = int(seconds * 16000)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, samples)) * 0.1, jnp.float32)
    audio_lengths = jnp.full((batch,), samples, jnp.int32)

    @jax.jit
    def recognize(params, audio, audio_lengths):
        features, feat_lengths = featurizer(audio, audio_lengths)
        encoder_out, encoder_mask = model.encode(params, features, feat_lengths)
        max_len = default_max_length(features.shape[1])
        tokens, lengths = greedy_decode(
            model, params, encoder_out, encoder_mask,
            max_length=max_len,
            bos_id=tokenizer.bos_token_id,
            eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id,
        )
        return tokens, lengths

    # warmup / compile
    tokens, lengths = recognize(params, audio, audio_lengths)
    jax.block_until_ready(tokens)

    iters = 5
    start = time.perf_counter()
    for _ in range(iters):
        tokens, lengths = recognize(params, audio, audio_lengths)
    jax.block_until_ready(tokens)
    elapsed = time.perf_counter() - start

    audio_hours_processed = iters * batch * seconds
    rtfx = audio_hours_processed / elapsed
    baseline = 20.0  # north-star: >=20x real-time per chip
    print(
        json.dumps(
            {
                "metric": "rtfx",
                "value": round(rtfx, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
