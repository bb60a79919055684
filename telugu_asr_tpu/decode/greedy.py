"""Batched KV-cached greedy decoding for the seq2seq family.

The reference decodes one utterance at a time with an outer batch while_loop
and re-runs the FULL decoder over the whole prefix every step with no KV
cache (moonshine/model.py:120-229) — O(B · U² · decoder).  Here the whole
batch advances together through ONE ``lax.while_loop`` whose body is a single
cached decoder step — O(U · decoder) with all matmuls batched on the MXU.

Decode semantics preserved (moonshine/model.py:165-234):
* start from ``[BOS]``; per step take argmax over the vocab;
* a sequence finishes when it emits EOS (the EOS itself is kept — decoding
  strips specials);
* generated PAD tokens are excluded from subsequent self-attention keys (the
  reference rebuilds ``text_mask = input != pad`` each step, :189);
* the default length cap is ``duration_seconds * 24`` tokens computed from
  the BATCH's padded frame count (:233-234 — one shared cap per batch);
* ``parity_unmasked_cross=True`` reproduces the reference's quirk of passing
  NO cross-attention mask during greedy decode (:192), letting queries attend
  padded encoder positions; default is the corrected masked behavior.

Early exit: the while_loop condition stops as soon as every sequence has
finished, so short batches don't pay for the worst-case cap.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.models.moonshine.decoder import (
    decoder_init_cache,
    decoder_init_cache_tiled,
    decoder_step,
    decoder_step_tiled,
)
from telugu_asr_tpu.models.moonshine.model import ASRModel

__all__ = ["greedy_decode", "greedy_decode_staged", "recognize", "default_max_length"]


def _resolve_attention_impl(attention_impl: Optional[str], cfg) -> str:
    """``None``/"auto" → "fused" on TPU when the config supports it, else
    "xla".

    * "fused": ONE Pallas kernel runs the whole decode loop with weights and
      KV caches VMEM-resident (ops/pallas/decode_fused.py) — measured
      3.2× faster than "xla" on the B=64 flagship bucket (17.4 ms vs
      55.9 ms, v5e).  Exact reference semantics; tokens can differ from
      "xla" only at float-associativity argmax near-ties.
    * "xla": the einsum/while_loop path — the portable reference.
    * "tiled": opt-in Pallas prefix-read attention over tiled caches.  Its
      kernel beats the full-cache einsum per call (17–21 µs vs 33–42 µs on
      partial prefixes), but 12 separate launches per decode step cost
      ~58 µs each in launch/sync overhead, so end-to-end it is ~3× slower;
      kept as groundwork/reference.  On CPU, "tiled" runs the identical
      math through the jnp reference path (used by tests)."""
    if attention_impl in ("xla", "tiled", "fused"):
        return attention_impl
    if attention_impl not in (None, "auto"):
        raise ValueError(
            f"unknown attention_impl {attention_impl!r}; "
            "expected None, 'auto', 'xla', 'tiled', or 'fused'"
        )
    from telugu_asr_tpu.ops.pallas.decode_fused import fused_supported

    # decode_fused is a Mosaic TPU kernel: auto-select it only on a TPU
    # backend ("axon" is this image's tunnelled TPU PJRT plugin), never on
    # GPU/other backends where it cannot compile.
    if jax.default_backend() in ("tpu", "axon") and fused_supported(cfg):
        return "fused"
    return "xla"


def default_max_length(num_frames: int, frame_step: int = 160, frame_length: int = 400,
                       sample_rate: int = 16000, tokens_per_second: float = 24.0) -> int:
    """Reference length cap (moonshine/model.py:233-234)."""
    duration = ((num_frames - 1) * frame_step + frame_length) / sample_rate
    return int(duration * tokens_per_second)


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "max_length",
        "bos_id",
        "eos_id",
        "pad_id",
        "parity_unmasked_cross",
        "cache_dtype",
        "cross_cache_dtype",
        "attention_impl",
        "fast_segments",
        "repetition_penalty",
    ),
)
def greedy_decode(
    model: ASRModel,
    params: dict,
    encoder_out: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    *,
    max_length: int,
    bos_id: int = 0,
    eos_id: int = 1,
    pad_id: int = 2,
    parity_unmasked_cross: bool = False,
    cache_dtype: Optional[str] = None,
    cross_cache_dtype: Optional[str] = None,
    attention_impl: Optional[str] = None,
    forced_prefix: Optional[jnp.ndarray] = None,
    forced_length=None,
    max_new_tokens: Optional[int] = None,
    fast_segments: bool = False,
    repetition_penalty: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode a batch: returns ``(tokens [B, max_length], lengths [B])``.

    ``repetition_penalty`` (CTRL-style, >1.0 activates; XLA path only —
    auto impl resolution falls back from the fused kernel) demotes
    already-emitted tokens at every step: log-probs are <=0, so
    multiplying a seen token's log-prob by the penalty pushes it down
    while EOS stays untouched.  The decisive exposure-bias mitigation on
    trained models (greedy WER 0.66 -> see REPORT.md round 5); identical
    decode when left at 1.0 (the penalty branch is not traced).

    ``fast_segments=True`` (fused kernel only) runs the per-segment vector
    chain in bfloat16 — the fastest serving mode; its WER delta vs f32 is
    pinned by tools/precision_wer_study.py on the trained checkpoint.

    ``tokens`` holds the generated sequence (EOS inclusive) padded with PAD,
    exactly the layout ``_perform_greedy_batch`` stacks (:147-163).

    ``attention_impl``: "fused" (whole-decode-loop Pallas kernel, the
    default on TPU — 3.2× faster than "xla"), "xla" (full-cache einsum
    reads, the portable reference and CPU default), "tiled" (opt-in Pallas
    prefix-read attention; see :func:`_resolve_attention_impl`), or
    None/"auto".

    ``forced_prefix [B, P]`` (with dynamic ``forced_length`` ≤ P; PAD beyond
    each row's prefix, no EOS inside) teacher-forces the first tokens: the
    prefix KV cache builds in ONE batched ``decoder_prefill`` pass and the
    sequential loop starts at ``forced_length`` — the streaming recognizer's
    partial-tick fast path (per-tick sequential work drops from O(total
    tokens) to O(new tokens)).  A forced decode equals feeding the same
    prefix through the unforced loop (tested).  XLA path only; combine with
    ``max_new_tokens`` to bound the continuation.
    """
    cfg = model.cfg.decoder
    if repetition_penalty != 1.0:
        if attention_impl == "fused":
            raise ValueError(
                "repetition_penalty runs in the XLA decode loop; drop "
                "attention_impl='fused' (auto picks xla)")
        if attention_impl in (None, "auto"):
            attention_impl = "xla"
    if forced_prefix is not None and attention_impl in (None, "auto"):
        attention_impl = "xla"  # prefill lives on the einsum cache layout
    impl = _resolve_attention_impl(attention_impl, cfg)
    if forced_prefix is not None and impl != "xla":
        raise ValueError("forced_prefix requires attention_impl='xla'")
    if impl == "fused" and attention_impl in (None, "auto"):
        # Auto-selected fused must also FIT: larger HPO d_models with long
        # caps can exceed the VMEM-resident budget — fall back to XLA there
        # rather than fail inside Mosaic (shapes are static at trace time).
        from telugu_asr_tpu.ops.pallas.decode_fused import (
            fused_fits,
            tree_fully_quantized,
        )

        # int8 residency (4× smaller weights) only applies when EVERY matmul
        # weight is quantized — a partially quantized tree runs the float
        # kernel, so budget f32 weights for it.  A pinned cache_dtype checks
        # that mode's law (int8 fits strictly more shapes than f32/bf16).
        if not fused_fits(
            cfg, encoder_out.shape[0], encoder_out.shape[1], max_length,
            vocab=model.cfg.vocab_size,
            quantized=tree_fully_quantized(
                params["decoder"], params["text_embedding"]["table"],
                params["classifier"]["kernel"],
            ),
            cache_dtype=cache_dtype,
            cross_cache_dtype=cross_cache_dtype,
        ):
            impl = "xla"
    if fast_segments and impl != "fused":
        raise ValueError("fast_segments is a fused-kernel mode (TPU); "
                         "the XLA/tiled paths compute segments in f32")
    if impl == "fused":
        from telugu_asr_tpu.ops.pallas.decode_fused import fused_greedy_decode

        # int8 params pass through as-is: the fused kernel serves them
        # VMEM-resident in int8, dequantizing at each use site.
        return fused_greedy_decode(
            params["decoder"],
            cfg,
            encoder_out,
            encoder_mask,
            params["text_embedding"]["table"],
            params["classifier"]["kernel"],
            params["classifier"]["bias"],
            max_length,
            bos_id=bos_id,
            eos_id=eos_id,
            pad_id=pad_id,
            parity_unmasked_cross=parity_unmasked_cross,
            cache_dtype=cache_dtype,
            cross_cache_dtype=cross_cache_dtype,
            fast_segments=fast_segments,
        )
    if cache_dtype == "int8" or cross_cache_dtype == "int8":
        raise ValueError(
            "int8 KV caches are a fused-kernel mode (per-column scale "
            "bookkeeping lives in the kernel); use attention_impl='fused' "
            "or cache_dtype='bfloat16' on the XLA path"
        )
    from telugu_asr_tpu.ops.quant import dequantize_pytree, pytree_has_quantized

    if pytree_has_quantized(params):
        # XLA/tiled paths compute in float: restore floats once (jit-safe);
        # the at-rest/HBM copy outside this jit stays int8.
        params = dequantize_pytree(params)
    batch = encoder_out.shape[0]
    cross_mask = None if parity_unmasked_cross else encoder_mask
    # bfloat16 caches halve the per-step HBM traffic (the decode bottleneck);
    # scores/softmax stay float32 inside the attention op either way.
    dtype = jnp.dtype(cache_dtype) if cache_dtype else encoder_out.dtype
    # +1: position 0 holds BOS; generated tokens live at 1..max_length.
    if impl == "tiled":
        from telugu_asr_tpu.ops.pallas.decode_attention import TILE

        use_pallas = jax.default_backend() not in ("cpu",)
        token_cols = -(-(max_length + 1) // TILE) * TILE
        cache = decoder_init_cache_tiled(
            params["decoder"], cfg, encoder_out, max_length + 1, dtype=dtype
        )
        t_enc = encoder_out.shape[1]
        t_pad = cache["blocks"][0]["cross"]["k"].shape[1] * TILE
        enc_cols = jnp.arange(t_pad)[None, :]
        if parity_unmasked_cross:
            # reference quirk: greedy passes NO cross mask (model.py:192) —
            # queries attend every encoder position incl. feature padding
            cross_n_valid = jnp.full((batch,), t_enc, jnp.int32)
            cross_key_valid = (enc_cols < t_enc).astype(jnp.int32) * jnp.ones(
                (batch, 1), jnp.int32
            )
            cross_q_uniform = None
        else:
            cross_n_valid = jnp.sum(encoder_mask.astype(jnp.int32), axis=-1)
            cross_key_valid = jnp.pad(
                encoder_mask.astype(jnp.int32), [(0, 0), (0, t_pad - t_enc)]
            )
            # Keras additive-mask law: in a row whose keys are ALL masked (a
            # zero-length encoding) every score gets -1e9 added, which ABSORBS
            # the score in float32 (ulp(1e9)=64) — the softmax is exactly
            # UNIFORM over every encoder position.  Reproduce by lifting such
            # rows to the full t_enc width AND zeroing their cross query
            # (softmax of all-zero scores == uniform).
            empty = cross_n_valid == 0
            cross_n_valid = jnp.where(empty, t_enc, cross_n_valid)
            cross_key_valid = jnp.where(
                empty[:, None], (enc_cols < t_enc).astype(jnp.int32), cross_key_valid
            )
            cross_q_uniform = empty
    else:
        token_cols = max_length + 1
        cache = decoder_init_cache(
            params["decoder"], cfg, encoder_out, max_length + 1, dtype=dtype
        )

    tokens0 = jnp.full((batch, token_cols), pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(bos_id)
    finished0 = jnp.zeros((batch,), bool)

    step0 = jnp.int32(0)
    step_cap = jnp.int32(max_length)
    if forced_prefix is not None:
        from telugu_asr_tpu.models.moonshine.decoder import decoder_prefill

        p = int(forced_prefix.shape[1])
        if forced_length is None:
            forced_length = p
        forced_length = jnp.asarray(forced_length, jnp.int32)
        tokens0 = jax.lax.dynamic_update_slice(
            tokens0, forced_prefix.astype(jnp.int32), (0, 1)
        )
        # Prefill positions 0..P-1 (BOS + prefix[:-1]); PAD slots beyond each
        # row's true length are written but masked out by the key-valid law,
        # and the loop overwrites them column-by-column as it advances.
        embedded = model.embed(params, tokens0[:, :p])
        _, cache = decoder_prefill(
            params["decoder"], cfg, embedded, cache,
            key_valid_mask=tokens0 != pad_id,
            encoder_mask=cross_mask,
        )
        step0 = forced_length
    if max_new_tokens is not None:
        step_cap = jnp.minimum(step_cap, step0 + jnp.int32(max_new_tokens))

    def cond(carry):
        step, tokens, finished, cache = carry
        return (step < step_cap) & ~jnp.all(finished)

    def body(carry):
        step, tokens, finished, cache = carry
        current = tokens[:, step]  # token to feed at position `step`
        embedded = model.embed(params, current)[:, None, :]
        # Keras masked-softmax subtlety (tf MHA _masked_softmax): a PAD query
        # row is FULLY masked, and additive -1e9 on every entry is a no-op
        # under softmax's shift invariance — so the reference's PAD queries
        # attend the whole prefix, PAD keys included.  Reproduce by lifting
        # the key-validity restriction when the current token is PAD.
        key_valid = jnp.where(
            (current == pad_id)[:, None], True, tokens != pad_id
        )
        if impl == "tiled":
            dec_out, cache = decoder_step_tiled(
                params["decoder"],
                cfg,
                embedded,
                cache,
                step,
                key_valid=key_valid,
                cross_n_valid=cross_n_valid,
                cross_key_valid=cross_key_valid,
                cross_q_uniform=cross_q_uniform,
                use_pallas=use_pallas,
            )
        else:
            dec_out, cache = decoder_step(
                params["decoder"],
                cfg,
                embedded,
                cache,
                step,
                key_valid_mask=key_valid,
                encoder_mask=cross_mask,
            )
        logits = model.classify(params, dec_out)[:, 0, :]
        if repetition_penalty != 1.0:
            # demote every token this row has already produced (the BOS and
            # any forced prefix count; PAD never does); argmax over the
            # penalized log-probs — softmax is monotone per row, so the
            # penalty-off path stays the plain logits argmax bit-for-bit
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            valid = tokens != pad_id
            seen = (
                jnp.zeros(logp.shape, bool)
                .at[jnp.arange(batch)[:, None], jnp.where(valid, tokens, pad_id)]
                .max(valid)
            )
            seen = seen.at[:, pad_id].set(False)
            logits = jnp.where(seen, logp * repetition_penalty, logp)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # Finished rows emit PAD from here on.
        next_token = jnp.where(finished, pad_id, next_token)
        tokens = tokens.at[:, step + 1].set(next_token)
        finished = finished | (next_token == eos_id)
        return step + 1, tokens, finished, cache

    _, tokens, finished, _ = jax.lax.while_loop(
        cond, body, (step0, tokens0, finished0, cache)
    )
    generated = tokens[:, 1 : max_length + 1]  # strip the BOS slot
    # length = up to and including the first EOS; max_length if none emitted
    is_eos = generated == eos_id
    lengths = jnp.where(
        jnp.any(is_eos, axis=-1),
        jnp.argmax(is_eos, axis=-1) + 1,
        max_length,
    ).astype(jnp.int32)
    return generated, lengths


def greedy_decode_staged(
    model: ASRModel,
    params: dict,
    encoder_out: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    *,
    max_length: int,
    first_stage_cap: int = 128,
    bos_id: int = 0,
    eos_id: int = 1,
    pad_id: int = 2,
    parity_unmasked_cross: bool = False,
    cache_dtype=None,
    attention_impl: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage greedy decode: per-step cost scales with the KV-cache
    LENGTH (every step reads the whole padded cache), so decoding at the
    worst-case ``duration*24`` cap wastes ~3x on typical utterances.  Stage 1
    decodes at a small cap; only if some sequence hasn't emitted EOS does
    stage 2 re-decode the batch at the full cap (one host sync between
    stages).  Outputs are identical to single-stage decoding at
    ``max_length`` padded/truncated to ``max_length`` columns.
    """
    kwargs = dict(
        bos_id=bos_id, eos_id=eos_id, pad_id=pad_id,
        parity_unmasked_cross=parity_unmasked_cross, cache_dtype=cache_dtype,
        attention_impl=attention_impl,
    )
    if max_length <= first_stage_cap:
        return greedy_decode(
            model, params, encoder_out, encoder_mask, max_length=max_length, **kwargs
        )
    tokens, lengths = greedy_decode(
        model, params, encoder_out, encoder_mask, max_length=first_stage_cap, **kwargs
    )
    # host sync: did every sequence emit EOS within the first cap?
    finished = bool(jnp.all(jnp.any(tokens == eos_id, axis=-1)))
    if finished:
        pad = jnp.full(
            (tokens.shape[0], max_length - first_stage_cap), pad_id, tokens.dtype
        )
        return jnp.concatenate([tokens, pad], axis=-1), lengths
    return greedy_decode(
        model, params, encoder_out, encoder_mask, max_length=max_length, **kwargs
    )


def recognize(
    model: ASRModel,
    params: dict,
    features: jnp.ndarray,
    feature_lengths: jnp.ndarray,
    *,
    model_max_length: Optional[int] = None,
    tokens_per_second: float = 24.0,
    bos_id: int = 0,
    eos_id: int = 1,
    pad_id: int = 2,
    parity_unmasked_cross: bool = False,
) -> jnp.ndarray:
    """Featurized audio → token ids (reference ``recognize``, model.py:231-250)."""
    if model_max_length is None:
        model_max_length = default_max_length(
            int(features.shape[1]), tokens_per_second=tokens_per_second
        )
    encoder_out, encoder_mask = model.encode(params, features, feature_lengths)
    tokens, _ = greedy_decode(
        model,
        params,
        encoder_out,
        encoder_mask,
        max_length=model_max_length,
        bos_id=bos_id,
        eos_id=eos_id,
        pad_id=pad_id,
        parity_unmasked_cross=parity_unmasked_cross,
    )
    return tokens
