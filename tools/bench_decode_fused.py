#!/usr/bin/env python3
"""Microbench the fused whole-decode-loop kernel on the real TPU.

Times ``fused_greedy_decode`` end-to-end (encode excluded) on the flagship
B=64 × 5.46 s bucket at the full reference length cap, f32 or int8-resident
weights (``--int8``), any cache dtype.  Prints one JSON line with ms/decode
and µs/step.

Usage:
    python tools/bench_decode_fused.py [--int8] [--cache-dtype bfloat16]
        [--batch 64] [--seconds 5.46] [--trials 5] [--inner 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--cache-dtype", default=None)
    parser.add_argument("--cross-cache-dtype", default=None,
                        help="pin the CROSS cache dtype separately (the "
                             "mixed tail mode is bf16 self + int8 cross)")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=5.46)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--inner", type=int, default=4)
    parser.add_argument("--fast-scores", action="store_true",
                        help="bf16 q·k head-sum (precise_scores=False)")
    parser.add_argument("--fast-segments", action="store_true",
                        help="bf16 per-segment vector math (mask/exp/trees)")
    parser.add_argument("--deflate-scores", action="store_true",
                        help="per-head scores on one lane each (exact; "
                             "mask/exp/max/sum at 128 lanes + MXU re-expand)")
    parser.add_argument("--combine-kv", action="store_true",
                        help="ONE [.., 2D] K|V self scratch (exact; no "
                             "192->256 lane padding; implies fused wkv "
                             "matmul; requires --deflate-scores)")
    parser.add_argument("--rows-per-cell", type=int, default=None,
                        help="pin the batch-row group size (default: auto)")
    parser.add_argument("--beam", type=int, default=1,
                        help=">1 times the fused BEAM kernel at width K instead")
    args = parser.parse_args()

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.decode.greedy import default_max_length
    from telugu_asr_tpu.ops.pallas.decode_fused import fused_greedy_decode
    from telugu_asr_tpu.text import make_default_tokenizer
    from telugu_asr_tpu.utils import setup_environment

    from __graft_entry__ import _flagship

    setup_environment()
    tokenizer = make_default_tokenizer()
    model = _flagship(tokenizer.vocab_size)
    params = model.init(jax.random.PRNGKey(0))

    if args.int8:
        from telugu_asr_tpu.ops.quant import quantize_pytree

        qp = quantize_pytree(params)
        dec_params = qp["decoder"]
        emb = qp["text_embedding"]["table"]
        cls_w = qp["classifier"]["kernel"]
    else:
        dec_params = params["decoder"]
        emb = params["text_embedding"]["table"]
        cls_w = params["classifier"]["kernel"]
    cls_b = params["classifier"]["bias"]

    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))
    rng = np.random.default_rng(0)
    samples = int(args.seconds * 16000)
    audio = jnp.asarray(rng.standard_normal((args.batch, samples)) * 0.1, jnp.float32)
    lengths = jnp.full((args.batch,), samples, jnp.int32)
    feats, fl = featurizer(audio, lengths)
    enc_out, enc_mask = jax.jit(model.encode)(params, feats, fl)
    max_len = default_max_length(int(feats.shape[1]))

    if args.beam > 1:
        from telugu_asr_tpu.ops.pallas.decode_fused_beam import fused_beam_search_decode

        @jax.jit
        def decode(dec_params, emb, cls_w, cls_b, enc_out, enc_mask):
            tok, sc = fused_beam_search_decode(
                dec_params, model.cfg.decoder, enc_out, enc_mask, emb, cls_w,
                cls_b, max_len, beam_size=args.beam,
                bos_id=tokenizer.bos_token_id, eos_id=tokenizer.eos_token_id,
                pad_id=tokenizer.pad_token_id, cache_dtype=args.cache_dtype,
                probe=os.environ.get("TELUGU_FUSED_PROBE", "none"),
                rows_per_cell=args.rows_per_cell,
            )
            return jnp.sum(tok) + jnp.sum(sc)

        fargs = (dec_params, emb, cls_w, cls_b, enc_out, enc_mask)
        float(decode(*fargs))  # compile

        from telugu_asr_tpu.utils.timing import round_trip_baseline, sync_timer

        med = sync_timer(decode, *fargs, trials=args.trials, inner=args.inner,
                         round_trip=round_trip_baseline(lengths))
        print(json.dumps({
            "metric": "fused_beam_decode_ms",
            "value": round(med * 1000, 3),
            "unit": f"ms_per_decode_b{args.batch}_k{args.beam}_cap{max_len}",
            "us_per_step": round(med * 1e6 / max_len, 2),
            "int8": args.int8,
            "cache_dtype": args.cache_dtype,
        }))
        return

    @jax.jit
    def decode(dec_params, emb, cls_w, cls_b, enc_out, enc_mask):
        tok, ln = fused_greedy_decode(
            dec_params, model.cfg.decoder, enc_out, enc_mask, emb, cls_w, cls_b,
            max_len, bos_id=tokenizer.bos_token_id, eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id, cache_dtype=args.cache_dtype,
            cross_cache_dtype=args.cross_cache_dtype,
            precise_scores=not args.fast_scores,
            fast_segments=args.fast_segments,
            deflate_scores=args.deflate_scores,
            combine_kv=args.combine_kv,
            # probe_fused_costs.py sets the env per subprocess; forwarding it
            # as the explicit static arg keys the jit cache per probe mode
            probe=os.environ.get("TELUGU_FUSED_PROBE", "none"),
            rows_per_cell=args.rows_per_cell,
        )
        return jnp.sum(tok) + jnp.sum(ln)

    fargs = (dec_params, emb, cls_w, cls_b, enc_out, enc_mask)
    float(decode(*fargs))  # compile

    from telugu_asr_tpu.utils.timing import round_trip_baseline, sync_timer

    med = sync_timer(decode, *fargs, trials=args.trials, inner=args.inner,
                     round_trip=round_trip_baseline(lengths))
    print(
        json.dumps(
            {
                "metric": "fused_decode_ms",
                "value": round(med * 1000, 3),
                "unit": f"ms_per_decode_b{args.batch}_cap{max_len}",
                "us_per_step": round(med * 1e6 / max_len, 2),
                "int8": args.int8,
                "cache_dtype": args.cache_dtype,
                "cross_cache_dtype": args.cross_cache_dtype,
            }
        )
    )


if __name__ == "__main__":
    main()
