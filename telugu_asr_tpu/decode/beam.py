"""Batched beam-search decoding for the seq2seq family.

Capability extension over the reference (greedy only, moonshine/model.py:118;
its TFLite export stub accepted a ``beam_width`` that was never implemented,
exec_helpers.py:41-58).  Beams fold into the batch dimension (``B*K`` rows
share one KV cache), the whole search runs as one ``lax.while_loop``, and
each step does one cached decoder pass + a top-K over ``K*V`` candidates with
cache rows re-gathered to the surviving beams.

``beam_size=1`` reduces exactly to greedy decoding (tested).  Scores are
summed token log-probs with optional length normalization ``score / len^α``
applied at the final ranking.

Perf notes (the per-step cost is dominated by the surviving-parent cache
re-gather, which copies HBM):

* Only the SELF caches are re-gathered.  The cross-attention K/V depend on
  the encoder output alone, and a parent beam always belongs to the same
  utterance (``src_beam`` indexes within each utterance's ``k`` rows), so
  every beam of an utterance holds identical cross rows — the gather is
  semantically the identity there and is skipped entirely (~T_enc/L_dec of
  the naive per-step cache traffic).
* ``cache_dtype="bfloat16"`` stores the self/cross caches (and thus the
  re-gather traffic) in bf16, halving per-step HBM bytes — same error class
  as the greedy decoder's bf16 cache mode.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.models.moonshine.decoder import decoder_init_cache, decoder_step
from telugu_asr_tpu.models.moonshine.model import ASRModel
from telugu_asr_tpu.ops.attention import (
    _masked_softmax,
    _split_heads,
    cross_attention_module_apply,
)
from telugu_asr_tpu.ops.mlp import ffn_module_apply
from telugu_asr_tpu.ops.norm import layer_norm
from telugu_asr_tpu.ops.rope import apply_rope, rope_rot_dim

__all__ = ["beam_search_decode"]

NEG_INF = -1e9


def _lazy_self_mha(mp, x, cache, step, w_anc, attend, num_heads, k_beams):
    """Self-attention over an UNREORDERED beam cache via ancestor weights.

    Rows are beam-folded (``F = G utterances × K beams``); ``cache`` K/V
    columns stay where the step that produced them wrote them, and
    ``w_anc [G, K, K, L]`` (one-hot over the third axis) says which beam
    SLOT ``p`` holds hypothesis ``(g, q)``'s key/value at column ``t``:
    attention weights/values are computed all-pairs within the group and
    combined with ``w_anc`` — the standard per-step gather of the whole
    cache (the dominant beam-decode cost) disappears in exchange for K×
    the attention FLOPs on the MXU.

    ``attend [F, L]``: causal+validity mask.  Returns ``(out [F, 1, d],
    new_cache)`` with this step's K/V written at column ``step`` in the
    row's OWN slot (callers keep ``w_anc`` column ``step`` = identity).
    """
    head_dim = mp["query_kernel"].shape[-1] // num_heads
    rot_dim = rope_rot_dim(head_dim)
    inv_freq = mp["rope_inv_freq"]
    f = x.shape[0]
    g = f // k_beams
    pos = jnp.full((f, 1), step, jnp.int32)

    q = _split_heads(x @ mp["query_kernel"], num_heads)
    q = apply_rope(q, pos, inv_freq, rot_dim)
    kn = _split_heads(x @ mp["key_kernel"], num_heads)
    kn = apply_rope(kn, pos, inv_freq, rot_dim)
    vn = _split_heads(x @ mp["value_kernel"], num_heads)
    k = jax.lax.dynamic_update_slice_in_dim(
        cache["k"], kn.transpose(0, 2, 3, 1).astype(cache["k"].dtype), step, axis=3
    )
    v = jax.lax.dynamic_update_slice_in_dim(
        cache["v"], vn.transpose(0, 2, 3, 1).astype(cache["v"].dtype), step, axis=3
    )

    length = k.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, q.dtype))
    qr = (q[:, 0] * scale).reshape(g, k_beams, num_heads, head_dim)
    kr = k.reshape(g, k_beams, num_heads, head_dim, length)
    vr = v.reshape(g, k_beams, num_heads, head_dim, length)
    # all-pairs scores within each utterance group, ancestor-combined
    s_all = jnp.einsum("gqhd,gphdl->gqphl", qr, kr.astype(qr.dtype))
    w5 = w_anc[:, :, :, None, :]
    scores = jnp.sum(s_all * w5.astype(s_all.dtype), axis=2)  # [G, K, H, L]
    probs = _masked_softmax(scores, attend.reshape(g, k_beams, 1, length))
    pw = probs[:, :, None].astype(vr.dtype) * w5.astype(vr.dtype)
    out = jnp.einsum("gqphl,gphdl->gqhd", pw, vr)
    out = out.reshape(f, 1, num_heads * head_dim) @ mp["projection_kernel"]
    return out, {"k": k, "v": v}


def _lazy_decoder_step(params, cfg, embedded, cache, step, w_anc, attend,
                       encoder_mask, k_beams):
    """``decoder_step`` with the self-attention replaced by the
    ancestor-weighted form (cross caches are beam-invariant and the FFN/LN
    are row-local, so they need no reorder awareness)."""
    x = embedded
    positions = jnp.full((x.shape[0], 1), step, jnp.int32)
    new_blocks = []
    for block, bcache in zip(params["blocks"], cache["blocks"]):
        attn, new_self = _lazy_self_mha(
            block["masked_mhsa"]["mha"], x, bcache["self"], step, w_anc,
            attend, cfg.num_heads, k_beams,
        )
        x = layer_norm(block["masked_mhsa"]["ln"], x + attn)
        x = cross_attention_module_apply(
            block["cross_attention"], x, None, cfg.num_heads,
            key_value_mask=encoder_mask, q_positions=positions,
            cross_cache=bcache["cross"],
        )
        x = ffn_module_apply(block["ffn"], x, cfg.activation)
        new_blocks.append({"self": new_self, "cross": bcache["cross"]})
    return x, {"blocks": new_blocks}


def _select_best(generated, scores, length_penalty: float, pad_id: int):
    """Final beam selection (shared by the XLA and fused paths):
    length-normalized when ``length_penalty > 0``, else raw scores."""
    batch = generated.shape[0]
    if length_penalty > 0.0:
        lengths = jnp.sum(generated != pad_id, axis=-1).astype(jnp.float32)
        norm = jnp.maximum(lengths, 1.0) ** length_penalty
        ranked = scores / norm
    else:
        ranked = scores
    best = jnp.argmax(ranked, axis=-1)
    idx = jnp.arange(batch)
    return generated[idx, best], scores[idx, best]


@partial(
    jax.jit,
    static_argnames=(
        "model", "max_length", "beam_size", "bos_id", "eos_id", "pad_id",
        "length_penalty", "cache_dtype", "lazy_reorder", "attention_impl",
        "repetition_penalty", "no_repeat_ngram",
    ),
)
def beam_search_decode(
    model: ASRModel,
    params: dict,
    encoder_out: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    *,
    max_length: int,
    beam_size: int = 4,
    bos_id: int = 0,
    eos_id: int = 1,
    pad_id: int = 2,
    length_penalty: float = 0.0,
    repetition_penalty: float = 1.0,
    no_repeat_ngram: int = 0,
    cache_dtype: Optional[str] = None,
    lazy_reorder: bool = True,
    attention_impl: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(tokens [B, max_length], scores [B])`` for the best beam.

    ``attention_impl``: "fused" runs the ENTIRE beam decode in one Pallas
    kernel (weights + KV caches VMEM-resident, in-kernel top-K and parent
    reorder — ops/pallas/decode_fused_beam.py); "xla" is the portable
    while_loop path; ``None``/"auto" picks fused on TPU when the config,
    power-of-two beam width, cache dtype and VMEM budget allow, else xla.
    Fused beams can diverge from xla at top-K boundary near-ties (scores
    ACCUMULATE float differences, unlike greedy's memoryless argmax) —
    measured ~3e-4/step score drift on v5e; on trained models hypotheses
    separate decisively and flips land on near-equivalent beams.

    Exposure-bias controls (both OFF by default — parity with the
    reference's unconstrained decode; they target the free-running
    repetition loops a trained seq2seq model falls into past its training
    length distribution):

    * ``repetition_penalty`` (CTRL-style, >1.0 activates): tokens already
      emitted by a hypothesis get their log-prob multiplied by the penalty
      (log-probs are ≤0, so >1 demotes) at every step.
    * ``no_repeat_ngram`` (n≥2 activates): a token is hard-banned (−1e9)
      when emitting it would repeat an n-gram already present in the
      hypothesis; EOS is never banned (the escape from a loop stays open).

    Both run inside the search (XLA path only — ``auto`` impl resolution
    falls back from the fused kernel when either is active).

    ``lazy_reorder=True`` (default, xla path) runs the ancestor-weighted
    self-attention (:func:`_lazy_self_mha`): no per-step cache gather at
    all, at K× the (tiny) attention FLOPs — same math, so the same beams up
    to float associativity at argmax near-ties; measured 611× vs 299× RTFx
    (2.04×) over the gathered form at B=64/K=4 f32 on v5e.  ``False`` keeps
    the textbook gather-the-parents form as a cross-check path.
    """
    cfg = model.cfg.decoder
    if attention_impl not in (None, "auto", "xla", "fused"):
        raise ValueError(
            f"unknown attention_impl {attention_impl!r}; "
            "expected None, 'auto', 'xla', or 'fused'"
        )
    from telugu_asr_tpu.ops.pallas.decode_fused import tree_fully_quantized

    quantized = tree_fully_quantized(
        params["decoder"], params["text_embedding"]["table"],
        params["classifier"]["kernel"],
    )
    penalties_active = repetition_penalty != 1.0 or no_repeat_ngram > 0
    if no_repeat_ngram == 1:
        raise ValueError("no_repeat_ngram=1 would ban every repeated token "
                         "outright; use repetition_penalty for soft control "
                         "or n>=2 for n-gram blocking")
    impl = attention_impl if attention_impl in ("xla", "fused") else None
    if impl == "fused" and penalties_active:
        raise ValueError(
            "repetition_penalty / no_repeat_ngram run in the XLA search "
            "loop only; drop attention_impl='fused' (auto picks xla)"
        )
    if impl is None and penalties_active:
        impl = "xla"
    if impl is None:
        from telugu_asr_tpu.ops.pallas.decode_fused_beam import fused_beam_fits

        impl = "fused" if (
            jax.default_backend() in ("tpu", "axon")
            and cache_dtype in (None, "float32", "bfloat16")
            and fused_beam_fits(
                cfg, encoder_out.shape[0], beam_size, encoder_out.shape[1],
                max_length, vocab=model.cfg.vocab_size,
                cache_dtype=cache_dtype, quantized=quantized,
            )
        ) else "xla"
    if impl == "xla":
        # the XLA while_loop path computes in float: restore floats once
        # (jit-safe, covers partially quantized trees too); the fused kernel
        # serves a fully int8 tree directly
        from telugu_asr_tpu.ops.quant import dequantize_pytree, pytree_has_quantized

        if pytree_has_quantized(params):
            params = dequantize_pytree(params)
    if impl == "fused":
        from telugu_asr_tpu.ops.pallas.decode_fused_beam import (
            fused_beam_search_decode,
        )

        generated, scores = fused_beam_search_decode(
            params["decoder"], cfg, encoder_out, encoder_mask,
            params["text_embedding"]["table"],
            params["classifier"]["kernel"], params["classifier"]["bias"],
            max_length, beam_size=beam_size,
            bos_id=bos_id, eos_id=eos_id, pad_id=pad_id,
            cache_dtype=cache_dtype,
        )
        return _select_best(generated, scores, length_penalty, pad_id)
    batch, t_enc, d = encoder_out.shape
    k = beam_size
    flat = batch * k

    mask_flat = jnp.repeat(encoder_mask, k, axis=0)
    dtype = jnp.dtype(cache_dtype) if cache_dtype else encoder_out.dtype
    # build the cache at batch width (cross K/V projected ONCE per utterance),
    # then repeat rows out to the beam-folded width
    cache = decoder_init_cache(params["decoder"], cfg, encoder_out,
                               max_length + 1, dtype=dtype)
    cache = jax.tree_util.tree_map(lambda x: jnp.repeat(x, k, axis=0), cache)

    tokens0 = jnp.full((flat, max_length + 1), pad_id, jnp.int32).at[:, 0].set(bos_id)
    # only beam 0 is live initially (all beams share the BOS prefix)
    scores0 = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1)), (batch,)).reshape(flat)
    finished0 = jnp.zeros((flat,), bool)

    # lazy mode: w_anc[g, q, p, t] — hypothesis (g, q)'s column-t K/V lives
    # in beam slot p (one-hot over p for t <= step, zero beyond)
    w_anc0 = jnp.zeros((batch, k, k, max_length + 1), jnp.float32)
    eye_col = jnp.broadcast_to(
        jnp.eye(k, dtype=jnp.float32)[None, :, :, None], (batch, k, k, 1)
    )

    def cond(carry):
        step, tokens, scores, finished, cache, w_anc = carry
        return (step < max_length) & ~jnp.all(finished)

    def body(carry):
        step, tokens, scores, finished, cache, w_anc = carry
        current = tokens[:, step]
        embedded = model.embed(params, current)[:, None, :]
        key_valid = jnp.where((current == pad_id)[:, None], True, tokens != pad_id)
        if lazy_reorder:
            # this step's K/V lands in each row's OWN slot
            w_anc = jax.lax.dynamic_update_slice_in_dim(
                w_anc, eye_col, step, axis=3
            )
            attend = (jnp.arange(max_length + 1)[None, :] <= step) & key_valid
            dec_out, new_cache = _lazy_decoder_step(
                params["decoder"], cfg, embedded, cache, step, w_anc, attend,
                mask_flat, k,
            )
        else:
            dec_out, new_cache = decoder_step(
                params["decoder"], cfg, embedded, cache, step,
                key_valid_mask=key_valid, encoder_mask=mask_flat,
            )
        logp = jax.nn.log_softmax(
            model.classify(params, dec_out)[:, 0, :].astype(jnp.float32), axis=-1
        )  # [flat, V]
        vocab = logp.shape[-1]
        rows = jnp.arange(flat)
        if repetition_penalty != 1.0:
            # CTRL-style demotion of already-emitted tokens.  Live rows
            # contain no PAD/EOS before `step`, but the PAD column is
            # cleared anyway so the finished-row override below can never
            # fight a penalty.
            valid_pos = jnp.arange(max_length + 1)[None, :] <= step
            tok_m = jnp.where(valid_pos, tokens, pad_id)
            seen = (
                jnp.zeros((flat, vocab), bool)
                .at[rows[:, None], tok_m]
                .max(jnp.broadcast_to(valid_pos, tok_m.shape))
            )
            seen = seen.at[:, pad_id].set(False)
            logp = jnp.where(seen, logp * repetition_penalty, logp)
        if no_repeat_ngram > 0:
            n = no_repeat_ngram
            length1 = max_length + 1
            # shifted[j][:, i] = tokens[:, i+j] (PAD past the end)
            shifted = [
                tokens if j == 0 else jnp.concatenate(
                    [tokens[:, j:],
                     jnp.full((flat, j), pad_id, jnp.int32)], axis=1)
                for j in range(n)
            ]
            # the hypothesis suffix: its last n-1 tokens, ending at `step`
            match = jnp.ones((flat, length1), bool)
            for j in range(n - 1):
                sfx_j = tokens[rows, jnp.clip(step - (n - 2) + j, 0, max_length)]
                match &= shifted[j] == sfx_j[:, None]
            # candidate window [i, i+n-1] must lie fully in the past
            match &= (jnp.arange(length1)[None, :] + (n - 1)) <= step
            match &= step >= (n - 1)
            banned_tok = shifted[n - 1]
            ban = (
                jnp.zeros((flat, vocab), bool)
                .at[rows[:, None], jnp.where(match, banned_tok, pad_id)]
                .max(match)
            )
            ban = ban.at[:, pad_id].set(False).at[:, eos_id].set(False)
            logp = jnp.where(ban, NEG_INF, logp)
        # finished beams emit only PAD at zero cost
        pad_only = jnp.full((vocab,), NEG_INF).at[pad_id].set(0.0)
        logp = jnp.where(finished[:, None], pad_only[None, :], logp)

        cand = scores[:, None] + logp  # [flat, V]
        cand = cand.reshape(batch, k * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # [batch, k]
        src_beam = top_idx // vocab  # which parent beam
        next_token = (top_idx % vocab).astype(jnp.int32)

        # flat gather indices of surviving parents
        parent = (jnp.arange(batch)[:, None] * k + src_beam).reshape(flat)
        tokens = tokens[parent].at[:, step + 1].set(next_token.reshape(flat))
        finished = finished[parent]
        scores = top_scores.reshape(flat)
        finished = finished | (tokens[:, step + 1] == eos_id)
        if lazy_reorder:
            # compose ancestries through the surviving parents — the K/V
            # columns themselves never move
            p_onehot = jax.nn.one_hot(src_beam, k, dtype=w_anc.dtype)
            w_anc = jnp.einsum("gqp,gpkl->gqkl", p_onehot, w_anc)
        else:
            # eager: re-gather ONLY the self caches — cross K/V rows are
            # identical across an utterance's beams (they depend on the
            # encoder output alone), so the parent gather is the identity
            # on them
            new_cache = {
                "blocks": [
                    {
                        "self": jax.tree_util.tree_map(
                            lambda x: x[parent], bcache["self"]
                        ),
                        "cross": bcache["cross"],
                    }
                    for bcache in new_cache["blocks"]
                ]
            }
        return step + 1, tokens, scores, finished, new_cache, w_anc

    _, tokens, scores, finished, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens0, scores0, finished0, cache, w_anc0)
    )

    generated = tokens[:, 1:].reshape(batch, k, max_length)
    scores = scores.reshape(batch, k)
    return _select_best(generated, scores, length_penalty, pad_id)
