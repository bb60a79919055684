#!/usr/bin/env python3
"""Transcribe WAV files with a trained model (serving entry point).

Usage:
    python transcribe.py --checkpoint-dir runs/flagship/checkpoints \
        [--config config/model.yaml] audio1.wav audio2.wav ...
    python transcribe.py --checkpoint-dir ... --audio-dir wavs/ [--beam 4]

Prints ``path\ttranscript`` per input; batches inputs by duration for static
shapes; greedy by default, beam search with ``--beam K``.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("paths", nargs="*")
    parser.add_argument("--audio-dir", default=None)
    parser.add_argument("--config", default="config/model.yaml")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--checkpoint-step", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--beam", type=int, default=1, help="beam size (1 = greedy)")
    parser.add_argument(
        "--int8", action="store_true",
        help="serve int8-quantized weights (symmetric per-channel; the on-TPU "
        "analog of the reference's TFLite dynamic-range quantization)",
    )
    parser.add_argument(
        "--streaming", action="store_true",
        help="simulate live streaming: feed each file in chunks through "
        "StreamingRecognizer and print partial transcripts as they revise",
    )
    parser.add_argument(
        "--chunk-ms", type=int, default=200,
        help="simulated audio chunk size for --streaming",
    )
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX backend (default: auto — the TPU when present)",
    )
    parser.add_argument(
        "--longform-seconds", type=float, default=17.73,
        help="files longer than this are transcribed through energy-aware "
             "≤15 s windows (decode/longform.py; the model's training data "
             "caps at 17.73 s — longer one-shot windows are out of "
             "distribution); 0 disables windowing",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.WARNING)
    paths = list(args.paths)
    if args.audio_dir:
        for root, _, files in os.walk(args.audio_dir):
            paths += [os.path.join(root, f) for f in sorted(files) if f.lower().endswith(".wav")]
    if not paths:
        parser.error("no audio given (positional paths or --audio-dir)")

    from telugu_asr_tpu.utils import setup_environment

    setup_environment(platform=args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from telugu_asr_tpu.audio.io import read_wav_file
    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.decode.beam import beam_search_decode
    from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode_staged
    from telugu_asr_tpu.helpers import prepare_featurizers
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    config = load_config(args.config)
    featurizer, tokenizer = prepare_featurizers(config)
    model = ASRModel(MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size))
    if args.checkpoint_dir:
        params = CheckpointManager(args.checkpoint_dir).restore_params(args.checkpoint_step)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        print("WARNING: no checkpoint; random weights", file=sys.stderr)
        params = model.init(jax.random.PRNGKey(42))

    decode_params = params
    if args.int8:
        from telugu_asr_tpu.ops.quant import (
            dequantize_pytree,
            pytree_num_bytes,
            quantize_pytree,
        )

        qparams = quantize_pytree(params)
        print(
            f"int8 weights: {pytree_num_bytes(params)/1e6:.2f} MB -> "
            f"{pytree_num_bytes(qparams)/1e6:.2f} MB at rest",
            file=sys.stderr,
        )
        # Encoder/beam compute in float; the greedy decoder serves the int8
        # tree directly (the fused TPU kernel keeps the weights int8 in
        # VMEM; the XLA path dequantizes inside the compiled step).
        params = dequantize_pytree(qparams)
        decode_params = dict(params)
        for key in ("decoder", "text_embedding", "classifier"):
            decode_params[key] = qparams[key]

    if args.streaming:
        from telugu_asr_tpu.serving import StreamingRecognizer

        recognizer = StreamingRecognizer(
            model, params, featurizer, tokenizer, decode_params=decode_params
        )
        chunk_samples = max(1, int(16000 * args.chunk_ms / 1000))
        for p in paths:
            wave, _sr = read_wav_file(p)
            recognizer.reset()
            for off in range(0, len(wave), chunk_samples):
                partial = recognizer.accept(wave[off : off + chunk_samples])
                if partial is not None:
                    t_audio = (off + chunk_samples) / 16000
                    print(f"{p}\t[{t_audio:6.2f}s partial]\t{partial}", flush=True)
            print(f"{p}\t[final]\t{recognizer.finalize()}")
        return

    # load + duration-sort + bucket
    waves = []
    for p in paths:
        wave, sr = read_wav_file(p)
        waves.append((p, wave))
    order = sorted(range(len(waves)), key=lambda i: len(waves[i][1]))

    results = {}
    if args.longform_seconds > 0:
        from telugu_asr_tpu.decode.longform import recognize_long_form

        long_idx = [i for i in order if len(waves[i][1]) > args.longform_seconds * 16000]
        for i in long_idx:
            results[i] = recognize_long_form(
                model, params, featurizer, tokenizer, waves[i][1],
                decode_params=decode_params, batch_size=args.batch_size,
                beam_size=args.beam,
            )
        order = [i for i in order if i not in set(long_idx)]
    for start in range(0, len(order), args.batch_size):
        chunk = order[start : start + args.batch_size]
        max_n = max(len(waves[i][1]) for i in chunk)
        max_n = -(-max_n // 16000) * 16000  # 1s quantum
        audio = np.zeros((len(chunk), max_n), np.float32)
        lengths = np.zeros((len(chunk),), np.int32)
        for row, i in enumerate(chunk):
            w = waves[i][1]
            audio[row, : len(w)] = w
            lengths[row] = len(w)
        feats, fl = featurizer(jnp.asarray(audio), jnp.asarray(lengths))
        eo, em = model.encode(params, feats, fl)
        max_len = default_max_length(int(feats.shape[1]))
        if args.beam > 1:
            tokens, _ = beam_search_decode(
                model, params, eo, em, max_length=max_len, beam_size=args.beam,
                bos_id=tokenizer.bos_token_id, eos_id=tokenizer.eos_token_id,
                pad_id=tokenizer.pad_token_id,
            )
        else:
            # staged caps: trained models emit EOS early, so the common case
            # pays the short-cache decode only
            tokens, _ = greedy_decode_staged(
                model, decode_params, eo, em, max_length=max_len,
                bos_id=tokenizer.bos_token_id, eos_id=tokenizer.eos_token_id,
                pad_id=tokenizer.pad_token_id,
            )
        texts = tokenizer.batch_decode(np.asarray(tokens).tolist(), skip_special_tokens=True)
        for i, text in zip(chunk, texts):
            results[i] = text

    for i, (p, _) in enumerate(waves):
        print(f"{p}\t{results[i]}")


if __name__ == "__main__":
    main()
