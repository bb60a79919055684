"""telugu_asr_tpu — a TPU-native (JAX / XLA / Pallas / pjit) speech-recognition framework.

A from-scratch rebuild of the capabilities of HemanthSai7/Telugu-ASR
(reference snapshot 2025-09-12), redesigned TPU-first:

* functional models — pure ``init(rng, cfg) -> params`` / ``apply(params, ...)``
  functions over named pytrees (no layer objects, no global state),
* a single jitted train step sharded with ``jax.sharding`` over a device mesh,
* static-shape, duration-bucketed host data pipeline,
* batched KV-cached greedy decoding as one ``lax.while_loop``,
* Pallas kernels for the hot host-bound ops (log-mel featurizer + SpecAugment).

Subpackages
-----------
- ``configs``   — YAML config schema (reference-compatible: speech_config /
  model_config / data_config / learning_config).
- ``text``      — Telugu / character tokenizers (no network access needed).
- ``audio``     — WAV I/O, log-mel featurizer, SpecAugment.
- ``ops``       — model building blocks (RoPE, attention, FFN, convs).
- ``models``    — Moonshine-style encoder/decoder and Conformer RNN-T families.
- ``losses``    — masked CE and RNN-T (wavefront scan + custom VJP).
- ``optim``     — Noam schedule, Adam+L2 factories.
- ``data``      — TSV datasets, bucketed batching.
- ``parallel``  — mesh construction and sharding helpers.
- ``train``     — train state, loops, checkpointing.
- ``decode``    — greedy/beam seq2seq decode, greedy transducer decode.
- ``metrics``   — WER/CER and streaming ErrorRate.
- ``eval``      — prediction harness writing the reference TSV format.
"""

__version__ = "0.1.0"
