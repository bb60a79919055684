#!/usr/bin/env python3
"""Per-component timing of the RNN-T train step on the real chip.

Times fwd+bwd of each stage in isolation under the checksum-sync recipe —
full step, encoder-only, prediction-net-only, joint+loss-only (on fixed
enc/pred activations) — so the next transducer-training optimization target
falls out by inspection.  Mirrors tools/bench_stages.py for the decode side.

Usage: python tools/profile_transducer_train.py [--batch 8] [--seconds 5.46]
           [--u 40]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=5.46)
    parser.add_argument("--u", type=int, default=40, help="label length")
    args = parser.parse_args()

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.losses.rnnt import rnnt_loss
    from telugu_asr_tpu.models.conformer.decoder import (
        joint_apply,
        prediction_apply,
    )
    from telugu_asr_tpu.models.conformer.encoder import conformer_encoder_apply
    from telugu_asr_tpu.text import make_transducer_tokenizer
    from telugu_asr_tpu.utils import setup_environment
    from telugu_asr_tpu.utils.timing import round_trip_baseline, sync_timer

    from bench import _flagship_conformer

    setup_environment()
    tokenizer = make_transducer_tokenizer()
    model = _flagship_conformer(tokenizer.vocab_size)
    params, state = model.init(jax.random.PRNGKey(0))
    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))

    b, u = args.batch, args.u
    samples = int(args.seconds * 16000)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, samples)) * 0.1, jnp.float32)
    audio_lengths = jnp.full((b,), samples, jnp.int32)
    labels = jnp.asarray(
        rng.integers(2, tokenizer.vocab_size, (b, u)), jnp.int32
    )
    prediction = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), labels], axis=1
    )
    pred_len = jnp.full((b,), u + 1, jnp.int32)
    lab_len = jnp.full((b,), u, jnp.int32)

    features, feat_lengths = featurizer(audio, audio_lengths)
    cfg = model.cfg

    # precomputed activations for the isolated stages
    enc_out, enc_len, _ = conformer_encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder, features,
        feat_lengths, training=False,
    )
    pred_out = prediction_apply(
        params["prediction"], cfg.prediction, prediction, pred_len
    )

    @jax.jit
    def full_step(params, state):
        def loss_fn(p):
            eo, el, new_state = conformer_encoder_apply(
                p["encoder"], state["encoder"], cfg.encoder, features,
                feat_lengths, training=True,
            )
            po = prediction_apply(p["prediction"], cfg.prediction,
                                  prediction, pred_len)
            logits = joint_apply(p["joint"], cfg.joint, eo, po)
            per = rnnt_loss(logits, labels, el, lab_len)
            return jnp.mean(per)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(jnp.abs(g)) * 0.0
                          for g in jax.tree_util.tree_leaves(grads)) + jnp.float32(0)

    @jax.jit
    def encoder_step(params):
        def loss_fn(p):
            eo, _, _ = conformer_encoder_apply(
                p["encoder"], state["encoder"], cfg.encoder, features,
                feat_lengths, training=True,
            )
            return jnp.sum(eo * 1e-6)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(jnp.abs(g)) * 0.0
                          for g in jax.tree_util.tree_leaves(grads))

    @jax.jit
    def prediction_step(params):
        def loss_fn(p):
            po = prediction_apply(p["prediction"], cfg.prediction,
                                  prediction, pred_len)
            return jnp.sum(po * 1e-6)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(jnp.abs(g)) * 0.0
                          for g in jax.tree_util.tree_leaves(grads))

    @jax.jit
    def joint_loss_step(params):
        def loss_fn(p):
            logits = joint_apply(p["joint"], cfg.joint, enc_out, pred_out)
            per = rnnt_loss(logits, labels, enc_len, lab_len)
            return jnp.mean(per)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(jnp.abs(g)) * 0.0
                          for g in jax.tree_util.tree_leaves(grads))

    # warm
    for fn, a in ((full_step, (params, state)), (encoder_step, (params,)),
                  (prediction_step, (params,)), (joint_loss_step, (params,))):
        float(fn(*a))

    rt = round_trip_baseline(audio_lengths)
    out = {
        "batch": b,
        "seconds": args.seconds,
        "u": u,
        "t_enc": int(enc_len[0]),
        "full_ms": round(sync_timer(full_step, params, state, round_trip=rt) * 1e3, 2),
        "encoder_fwdbwd_ms": round(sync_timer(encoder_step, params, round_trip=rt) * 1e3, 2),
        "prediction_fwdbwd_ms": round(sync_timer(prediction_step, params, round_trip=rt) * 1e3, 2),
        "joint_loss_fwdbwd_ms": round(sync_timer(joint_loss_step, params, round_trip=rt) * 1e3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
