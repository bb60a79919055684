"""Benchmark: batched greedy-decode inference throughput (RTFx) on one chip.

Workload mirrors the reference test set's duration statistics (BASELINE.md:
2,226 utterances, mean 5.46 s, min 1.72 s, max 17.73 s): four duration
buckets weighted to the test-set mix, batch 64, decoding the FULL reference
length cap (duration × 24 tokens) with untrained weights and no early EOS
exit — a worst-case RTFx (trained models stop at EOS and go faster).

The pipeline per batch: fused Pallas log-mel featurizer → encoder → KV-cached
batched greedy decode, all device-resident under one jit per bucket shape.

Prints one JSON line:
``{"metric": "rtfx", "value": N, "unit": "x_realtime", "vs_baseline": N}``
where the baseline is the north-star ≥20× real-time per chip (BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np

# (seconds, batches_of_64): roughly the test-set duration mix, mean ~5.5s
WORKLOAD = [(2.0, 1), (5.46, 2), (9.0, 1), (17.73, 1)]
BATCH = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode
    from telugu_asr_tpu.text import make_default_tokenizer
    from telugu_asr_tpu.utils import setup_environment

    from __graft_entry__ import _flagship

    setup_environment()
    tokenizer = make_default_tokenizer()
    model = _flagship(tokenizer.vocab_size)
    params = model.init(jax.random.PRNGKey(0))
    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))
    on_tpu = jax.devices()[0].platform not in ("cpu",)

    @jax.jit
    def recognize(params, audio, audio_lengths):
        if on_tpu:
            features, feat_lengths = featurizer.fused(audio, audio_lengths)
        else:
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
        # scalar checksum: fetching it forces the device to have finished
        # (this image's remote backend returns early from block_until_ready,
        # so timing must synchronize through a data dependency)
        return jnp.sum(tokens) + jnp.sum(lengths)

    rng = np.random.default_rng(0)
    batches = []
    for seconds, count in WORKLOAD:
        samples = int(seconds * 16000)
        audio = jnp.asarray(rng.standard_normal((BATCH, samples)) * 0.1, jnp.float32)
        lengths = jnp.full((BATCH,), samples, jnp.int32)
        batches.append((seconds, count, audio, lengths))

    # warmup / compile every bucket shape
    for _, _, audio, lengths in batches:
        float(recognize(params, audio, lengths))

    # host<->device round-trip baseline (subtracted from each trial)
    @jax.jit
    def _scalar(x):
        return jnp.sum(x)

    float(_scalar(batches[0][3]))
    trip_start = time.perf_counter()
    for _ in range(5):
        float(_scalar(batches[0][3]))
    round_trip = (time.perf_counter() - trip_start) / 5

    # Per-bucket median over several trials; each trial runs `inner`
    # back-to-back executions (device-serialized) and synchronizes ONCE via
    # the scalar checksum, so the tunnel round-trip amortizes away.
    trials, inner = 5, 4
    total_time = 0.0
    total_audio = 0.0
    for seconds, count, audio, lengths in batches:
        times = []
        for _ in range(trials):
            start = time.perf_counter()
            checksum = None
            for _ in range(inner):
                checksum = recognize(params, audio, lengths)
            float(checksum)  # single sync
            times.append(max(time.perf_counter() - start - round_trip, 1e-9) / inner)
        med = sorted(times)[len(times) // 2]
        total_time += med * count
        total_audio += BATCH * seconds * count
    rtfx = total_audio / total_time
    baseline = 20.0  # north-star: >=20x real-time per chip (BASELINE.md)
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
