"""Moonshine-style seq2seq ASR model (flagship family).

Functional rework of src/models/moonshine/model.py:9-250: text embedding →
encoder / decoder → vocab classifier.  The reference's ``final_dense`` bakes a
softmax in (:59-67); here ``apply`` returns LOGITS (losses use log-softmax —
identical function composition, numerically safer), with ``probs=True``
available for API parity.

Mask laws (reference ``create_masks`` :73-82): audio frame valid iff any
feature ≠ 0.0 (equals the explicit length mask our featurizer returns — it
zero-pads exactly like the reference's ``padded_batch``); text position valid
iff token ≠ PAD(2).  The canonical path threads explicit lengths; the
reference law is available via :func:`create_masks` for parity testing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.models.moonshine.decoder import (
    DecoderConfig,
    decoder_apply,
    decoder_init,
)
from telugu_asr_tpu.models.moonshine.encoder import (
    EncoderConfig,
    encoder_apply,
    encoder_init,
    encoder_output_length,
)
from telugu_asr_tpu.ops.initializers import embedding_uniform, glorot_uniform

__all__ = ["MoonshineConfig", "ASRModel", "create_masks"]

AUDIO_PAD_VALUE = 0.0
TEXT_PAD_VALUE = 2


def create_masks(
    audio_features: jnp.ndarray,
    text_tokens: jnp.ndarray,
    audio_pad_value: float = AUDIO_PAD_VALUE,
    text_pad_value: int = TEXT_PAD_VALUE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference mask derivation (moonshine/model.py:73-82), boolean."""
    audio_mask = jnp.any(audio_features != audio_pad_value, axis=-1)
    text_mask = text_tokens != text_pad_value
    return audio_mask, text_mask


def _tuple(x, n=None):
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return tuple([x] * (n or 1))


@dataclasses.dataclass(frozen=True)
class MoonshineConfig:
    vocab_size: int = 242
    d_model: int = 192
    encoder: EncoderConfig = EncoderConfig()
    decoder: DecoderConfig = DecoderConfig()

    @classmethod
    def from_model_config(cls, model_config, vocab_size: int) -> "MoonshineConfig":
        """Build from a reference-schema ``model_config`` dict (model.yaml:19-56).

        Note: the reference reads subsampling activations from key
        ``"activations"`` with default ``["tanh","gelu","gelu"]``
        (moonshine/encoder.py:25) while the committed YAML spells the key
        ``"activation"`` — so the shipped model EFFECTIVELY ran tanh/gelu/gelu.
        We replicate that exactly (the singular key is IGNORED, like the
        reference): reading it instead would silently build a different
        network than the one reference-trained h5 checkpoints belong to
        (verified against the reference's own Keras code in
        tests/test_reference_conversion.py).
        """
        mc = dict(model_config)
        d_model = int(mc.get("d_model", 192))
        sub = dict(mc.get("subsampling_config", {}) or {})
        enc = dict(mc.get("encoder_config", {}) or {})
        dec = dict(mc.get("decoder_config", {}) or {})
        sub_kernel = _tuple(sub.get("kernel_size", [9, 9, 9]))
        n = len(sub_kernel)
        sub_act = sub.get("activations", ["tanh", "gelu", "gelu"])
        encoder = EncoderConfig(
            d_model=d_model,
            num_blocks=int(enc.get("num_blocks", 6)),
            num_heads=int(enc.get("num_heads", 4)),
            head_dim=int(enc.get("head_dim", 32)),
            activation=enc.get("activation", "relu"),
            fc_factor=int(enc.get("fc_factor", 1)),
            dropout=float(enc.get("dropout", 0.1)),
            sub_kernel_size=sub_kernel,
            sub_strides=_tuple(sub.get("strides", [2, 2, 2]), n),
            sub_padding=_tuple(sub.get("padding", ["same"] * n), n),
            sub_activations=_tuple(sub_act, n),
        )
        decoder = DecoderConfig(
            d_model=d_model,
            num_blocks=int(dec.get("num_blocks", 6)),
            num_heads=int(dec.get("num_heads", 4)),
            head_dim=int(dec.get("head_dim", 32)),
            activation=dec.get("activation", "swiglu"),
            fc_factor=int(dec.get("fc_factor", 1)),
            dropout=float(dec.get("dropout", 0.1)),
        )
        return cls(vocab_size=vocab_size, d_model=d_model, encoder=encoder, decoder=decoder)


class ASRModel:
    """Stateless model namespace: ``init`` / ``apply`` / ``encode`` / ``embed``."""

    def __init__(self, cfg: MoonshineConfig):
        self.cfg = cfg

    # -- parameters ----------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        ke, kd, kemb, kcls = jax.random.split(key, 4)
        cfg = self.cfg
        return {
            "encoder": encoder_init(ke, cfg.encoder),
            "decoder": decoder_init(kd, cfg.decoder),
            "text_embedding": {"table": embedding_uniform(kemb, (cfg.vocab_size, cfg.d_model))},
            "classifier": {
                "kernel": glorot_uniform(kcls, (cfg.d_model, cfg.vocab_size)),
                "bias": jnp.zeros((cfg.vocab_size,)),
            },
        }

    def num_params(self, params: dict) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    # -- submodules ----------------------------------------------------------
    def embed(self, params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
        return params["text_embedding"]["table"][tokens]

    def classify(self, params: dict, decoder_out: jnp.ndarray) -> jnp.ndarray:
        return decoder_out @ params["classifier"]["kernel"] + params["classifier"]["bias"]

    def encode(
        self,
        params: dict,
        features: jnp.ndarray,
        feature_lengths: jnp.ndarray,
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return encoder_apply(
            params["encoder"],
            self.cfg.encoder,
            features,
            feature_lengths,
            deterministic=deterministic,
            rng=rng,
        )

    def encoder_output_length(self, feature_length):
        return encoder_output_length(self.cfg.encoder, feature_length)

    # -- forward -------------------------------------------------------------
    def apply(
        self,
        params: dict,
        features: jnp.ndarray,
        feature_lengths: jnp.ndarray,
        shifted_right_text: jnp.ndarray,
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        probs: bool = False,
    ) -> jnp.ndarray:
        """Teacher-forced forward: returns ``[B, U, vocab]`` logits.

        ``shifted_right_text = [BOS] + tokens`` (moonshine/dataset.py:187).
        """
        cfg = self.cfg
        renc = rdec = None
        if rng is not None and not deterministic:
            renc, rdec = jax.random.split(rng)
        text_mask = shifted_right_text != TEXT_PAD_VALUE
        embedded = self.embed(params, shifted_right_text)
        encoder_out, encoder_mask = self.encode(
            params, features, feature_lengths, deterministic=deterministic, rng=renc
        )
        decoder_out = decoder_apply(
            params["decoder"],
            cfg.decoder,
            embedded,
            encoder_out,
            text_mask=text_mask,
            encoder_mask=encoder_mask,
            deterministic=deterministic,
            rng=rdec,
        )
        logits = self.classify(params, decoder_out)
        if probs:
            return jax.nn.softmax(logits, axis=-1)
        return logits
