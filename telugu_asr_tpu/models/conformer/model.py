"""Conformer RNN-T transducer model.

Functional rework of src/models/conformer/model.py:19-248: encoder +
prediction net + joint net emitting ``OutputLogits``, plus greedy transducer
decoding.  The reference decodes one utterance at a time with nested
``tf.while_loop``s and a one-step joint (:103-116, :127-248); here the WHOLE
BATCH advances through one ``lax.scan`` over time frames with the standard
blank-hold rule — on blank, prediction-net state and last-token carry are
held; on a label, they advance (max one label per frame, exactly the
reference's per-frame argmax semantics at :225-236).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.data.schemas import OutputLogits
from telugu_asr_tpu.models.conformer.decoder import (
    JointConfig,
    PredictionConfig,
    joint_apply,
    joint_init,
    prediction_apply,
    prediction_init,
    prediction_init_state,
    prediction_step,
)
from telugu_asr_tpu.models.conformer.encoder import (
    ConformerEncoderConfig,
    conformer_encoder_apply,
    conformer_encoder_init,
)

__all__ = ["ConformerConfig", "Conformer"]


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    vocab_size: int = 241
    d_model: int = 144
    encoder: ConformerEncoderConfig = ConformerEncoderConfig()
    prediction: PredictionConfig = PredictionConfig()
    joint: JointConfig = JointConfig()
    blank_id: int = 0

    @classmethod
    def from_model_config(cls, model_config, vocab_size: int) -> "ConformerConfig":
        """Parse a reference-schema conformer model_config (conformer.yaml:19-47)."""
        mc = dict(model_config)
        d_model = int(mc.get("d_model", 144))
        sub = dict(mc.get("subsampling_config", {}) or {})
        enc = dict(mc.get("encoder_config", {}) or {})
        dec = dict(mc.get("decoder_config", {}) or {})
        encoder = ConformerEncoderConfig(
            d_model=d_model,
            num_blocks=int(enc.get("num_blocks", 16)),
            num_heads=int(enc.get("num_heads", 4)),
            head_dim=int(enc.get("head_dim", 36)),
            attention_type=enc.get("attention_type", "relmha"),
            kernel_size=int(enc.get("kernel_size", 31)),
            fc_factor=float(enc.get("fc_factor", 0.5)),
            dropout=float(enc.get("dropout", 0.1)),
            sub_filters=int(sub.get("filters", d_model)),
            sub_kernel_size=int(sub.get("kernel_size", 3)),
            sub_stride=int(sub.get("strides", 2)),
        )
        # Defaults mirror the reference's get() fallbacks (conformer/model.py:52-60)
        # except embed_dropout, where the reference's fallback is the absurd
        # 256 (a copy-paste of embed_dim) — its yaml always sets 0.
        prediction = PredictionConfig(
            vocab_size=vocab_size,
            embed_dim=int(dec.get("embed_dim", 256)),
            embed_dropout=float(dec.get("embed_dropout", 0.0)),
            num_rnns=int(dec.get("num_rnns", 1)),
            rnn_units=int(dec.get("rnn_units", 128)),
            rnn_type=dec.get("rnn_type", "lstm"),
            layer_norm=bool(dec.get("layer_norm", True)),
            projection_units=int(dec.get("projection_units", 256)),
        )
        # The reference's EFFECTIVE joint parsing law (conformer/model.py:69-77):
        # the activation key is "activation" with default "relu" — the yaml's
        # "joint_activation: tanh" is a DEAD key the reference never reads —
        # and postjoint_linear DEFAULTS ON.  The shipped reference conformer
        # therefore ran merge → ffn → relu → vocab; verified against the
        # reference's own h5 by tests/test_reference_parity_conformer.py.
        joint = JointConfig(
            vocab_size=vocab_size,
            joint_dim=int(dec.get("joint_dim", 256)),
            activation=dec.get("activation", "relu"),
            prejoint_linear=bool(dec.get("prejoint_linear", True)),
            postjoint_linear=bool(dec.get("postjoint_linear", True)),
            joint_mode=dec.get("joint_mode", "add"),
        )
        return cls(
            vocab_size=vocab_size, d_model=d_model,
            encoder=encoder, prediction=prediction, joint=joint,
        )


class Conformer:
    """Stateless namespace: ``init`` / ``apply`` / ``encode`` / ``recognize``."""

    def __init__(self, cfg: ConformerConfig):
        self.cfg = cfg

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        """Returns (params, state) — state holds BatchNorm running stats."""
        ke, kp, kj = jax.random.split(key, 3)
        enc_params, bn_state = conformer_encoder_init(ke, self.cfg.encoder)
        pred_dim = (
            self.cfg.prediction.projection_units
            if self.cfg.prediction.projection_units > 0
            else self.cfg.prediction.rnn_units
        )
        return (
            {
                "encoder": enc_params,
                "prediction": prediction_init(kp, self.cfg.prediction),
                "joint": joint_init(kj, self.cfg.joint, self.cfg.d_model, pred_dim),
            },
            {"encoder": bn_state},
        )

    def num_params(self, params: dict) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    def encode(
        self, params, state, features, feature_lengths, *, training=False, rng=None
    ):
        enc_out, enc_lengths, new_bn = conformer_encoder_apply(
            params["encoder"], state["encoder"], self.cfg.encoder,
            features, feature_lengths, training=training, rng=rng,
        )
        return enc_out, enc_lengths, {"encoder": new_bn}

    def apply(
        self,
        params: dict,
        state: dict,
        features: jnp.ndarray,
        feature_lengths: jnp.ndarray,
        prediction: jnp.ndarray,
        prediction_lengths: jnp.ndarray,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[dict, dict]:
        """Training forward (model.py:80-92): returns (OutputLogits, new state).

        ``prediction`` is the blank-prepended label sequence
        (src/dataset.py:167-197).  Logits shape ``[B, T', U+1, vocab]``.
        """
        renc = rpred = None
        if rng is not None and training:
            renc, rpred = jax.random.split(rng)
        enc_out, enc_lengths, new_state = self.encode(
            params, state, features, feature_lengths, training=training, rng=renc
        )
        pred_out = prediction_apply(
            params["prediction"], self.cfg.prediction, prediction, prediction_lengths,
            training=training, rng=rpred,
        )
        logits = joint_apply(params["joint"], self.cfg.joint, enc_out, pred_out)
        return OutputLogits(logits=logits, logits_length=enc_lengths), new_state

    # ------------------------- greedy transducer decode -------------------
    def recognize(
        self,
        params: dict,
        state: dict,
        features: jnp.ndarray,
        feature_lengths: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched greedy decode → (per-frame tokens ``[B, T']``, lengths).

        Blanks are left in place (the reference stacks per-frame predictions
        and strips blanks at text extraction, model.py:225-248); use
        ``strip_blanks`` for transcripts.
        """
        enc_out, enc_lengths, _ = self.encode(params, state, features, feature_lengths)
        return self._greedy_batch(params, enc_out, enc_lengths), enc_lengths

    def _greedy_batch(self, params, enc_out, enc_lengths):
        cfg = self.cfg
        batch, t_max, _ = enc_out.shape
        blank = cfg.blank_id

        init_states = prediction_init_state(cfg.prediction, batch)
        init_token = jnp.full((batch,), blank, jnp.int32)
        # initial prediction-net output for the blank start token
        init_pred_out, init_states = prediction_step(
            params["prediction"], cfg.prediction, init_token, init_states
        )

        def step(carry, xs):
            last_token, pred_out, states = carry
            enc_t, t_idx = xs
            ytu = joint_apply(params["joint"], cfg.joint, enc_t, pred_out)
            pred_token = jnp.argmax(ytu, axis=-1).astype(jnp.int32)
            in_range = t_idx < enc_lengths
            emit = (pred_token != blank) & in_range
            new_last = jnp.where(emit, pred_token, last_token)
            # advance the prediction net only on emission (blank-hold)
            stepped_out, stepped_states = prediction_step(
                params["prediction"], cfg.prediction, new_last, states
            )
            keep = emit[:, None]
            next_pred_out = jnp.where(keep, stepped_out, pred_out)
            next_states = jax.tree_util.tree_map(
                lambda new, old: jnp.where(keep, new, old), stepped_states, states
            )
            out_token = jnp.where(in_range, pred_token, blank)
            return (new_last, next_pred_out, next_states), out_token

        (_, _, _), tokens = jax.lax.scan(
            step,
            (init_token, init_pred_out, init_states),
            (jnp.swapaxes(enc_out, 0, 1), jnp.arange(t_max)),
        )
        return jnp.swapaxes(tokens, 0, 1)

    @staticmethod
    def strip_blanks(tokens, blank_id: int = 0) -> List[List[int]]:
        """Per-frame tokens → label sequences (host-side)."""
        import numpy as np

        out = []
        for row in np.asarray(tokens):
            out.append([int(t) for t in row if int(t) != blank_id])
        return out
