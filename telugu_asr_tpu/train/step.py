"""The jitted, mesh-sharded train/eval steps.

One XLA program per step: on-device featurization (log-mel) → SpecAugment →
model forward → masked CE + L2 → backward → Adam update.  Replaces the
reference's host-side tf.data featurization + Keras train_step
(moonshine/dataset.py:159-164, base_model.py:96-115) with a single fused
graph — the host only ships raw padded audio and token ids.

Data parallelism: batches are sharded over the mesh's ``data`` axis
(parallel/mesh.py), parameters are replicated, and the loss's
global-batch-size scaling makes XLA's gradient ``psum`` over ICI produce the
exact global-mean gradient (the ``compute_average_loss`` contract,
ce_loss.py:34-37).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from telugu_asr_tpu.audio.augment import Augmentation
from telugu_asr_tpu.audio.featurizer import SpeechFeaturizer
from telugu_asr_tpu.losses import l2_regularization, masked_cross_entropy
from telugu_asr_tpu.models.moonshine.model import ASRModel
from telugu_asr_tpu.train.state import TrainState

__all__ = ["make_train_step", "make_eval_step"]


def _forward_loss(
    model: ASRModel,
    featurizer: SpeechFeaturizer,
    augmentation: Optional[Augmentation],
    params,
    batch: dict,
    rng: Optional[jax.Array],
    *,
    deterministic: bool,
    global_batch_size: int,
    l2: float,
    pad_id: int,
    use_fused_featurizer: bool = False,
    compute_dtype=None,
):
    augment = augmentation is not None and augmentation.enabled and not deterministic
    if use_fused_featurizer:
        # Fused Pallas kernel: featurizer + SpecAugment bands in one HBM pass.
        aug_params = None
        if augment and augmentation.supports_fused():
            rng, kaug = jax.random.split(rng)
            feat_lengths_est = jnp.maximum(
                1
                + (batch["audio_lengths"] - featurizer.config.frame_length)
                // featurizer.config.frame_step,
                0,
            ).astype(jnp.int32)
            aug_params = augmentation.sample_fused_params(
                kaug, feat_lengths_est, featurizer.config.num_feature_bins
            )
            augment = False
        features, feat_lengths = featurizer.fused(
            batch["audio"], batch["audio_lengths"], aug_params
        )
    else:
        features, feat_lengths = featurizer(batch["audio"], batch["audio_lengths"])
    if augment:
        rng, kaug = jax.random.split(rng)
        features = augmentation.feature_augment(kaug, features, feat_lengths)
    if compute_dtype is not None:
        # Mixed precision: float32 master params, bfloat16 activations and
        # weights in the forward/backward (MXU-native); loss and the Adam
        # update stay float32.  Gradients flow through the casts back to the
        # float32 masters automatically.
        dtype = jnp.dtype(compute_dtype)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
        )
        features = features.astype(dtype)
    logits = model.apply(
        params,
        features,
        feat_lengths,
        batch["shifted_right_text_inputs"],
        deterministic=deterministic,
        rng=rng,
    )
    ce = masked_cross_entropy(
        logits, batch["text_targets"], pad_id=pad_id, global_batch_size=global_batch_size
    )
    reg = l2_regularization(params, l2) if l2 else 0.0
    return ce + reg, ce


def make_train_step(
    model: ASRModel,
    optimizer: optax.GradientTransformation,
    featurizer: SpeechFeaturizer,
    *,
    augmentation: Optional[Augmentation] = None,
    global_batch_size: int,
    l2: float = 0.0,
    pad_id: int = 2,
    donate: bool = True,
    use_fused_featurizer: bool = False,
    compute_dtype=None,
) -> Callable:
    """Returns jitted ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch``: ``{"audio" [B,N] f32, "audio_lengths" [B] i32,
    "shifted_right_text_inputs" [B,U] i32, "text_targets" [B,U] i32}``.
    ``compute_dtype="bfloat16"`` enables mixed-precision forward/backward.
    """

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return _forward_loss(
                model,
                featurizer,
                augmentation,
                params,
                batch,
                rng,
                deterministic=False,
                global_batch_size=global_batch_size,
                l2=l2,
                pad_id=pad_id,
                use_fused_featurizer=use_fused_featurizer,
                compute_dtype=compute_dtype,
            )

        (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state)
        metrics = {"loss": loss, "ce": ce, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model: ASRModel,
    featurizer: SpeechFeaturizer,
    *,
    global_batch_size: int,
    l2: float = 0.0,
    pad_id: int = 2,
) -> Callable:
    """Returns jitted ``eval_step(state, batch) -> metrics`` (teacher-forced)."""

    def step_fn(state: TrainState, batch: dict):
        loss, ce = _forward_loss(
            model,
            featurizer,
            None,
            state.params,
            batch,
            None,
            deterministic=True,
            global_batch_size=global_batch_size,
            l2=l2,
            pad_id=pad_id,
        )
        return {"loss": loss, "ce": ce}

    return jax.jit(step_fn)


# ---------------------------------------------------------------------------
# Transducer (Conformer RNN-T) steps
# ---------------------------------------------------------------------------


def make_transducer_train_step(
    model,
    optimizer: optax.GradientTransformation,
    featurizer: SpeechFeaturizer,
    *,
    augmentation: Optional[Augmentation] = None,
    global_batch_size: int,
    l2: float = 0.0,
    blank_id: int = 0,
    donate: bool = True,
    use_fused_featurizer: bool = False,
) -> Callable:
    """RNN-T train step for the Conformer family (reference train.py:23-106).

    ``batch``: ``{"audio", "audio_lengths", "prediction" (blank-prepended),
    "prediction_length", "labels", "labels_length"}`` (src/schemas.py laws).
    BatchNorm running stats thread through ``state.model_state``.
    """
    from telugu_asr_tpu.losses.rnnt import rnnt_loss

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            krng = rng
            augment = augmentation is not None and augmentation.enabled
            if use_fused_featurizer:
                aug_params = None
                if augment and augmentation.supports_fused():
                    krng, kaug = jax.random.split(krng)
                    est = jnp.maximum(
                        1
                        + (batch["audio_lengths"] - featurizer.config.frame_length)
                        // featurizer.config.frame_step,
                        0,
                    ).astype(jnp.int32)
                    aug_params = augmentation.sample_fused_params(
                        kaug, est, featurizer.config.num_feature_bins
                    )
                    augment = False
                features, feat_lengths = featurizer.fused(
                    batch["audio"], batch["audio_lengths"], aug_params
                )
            else:
                features, feat_lengths = featurizer(batch["audio"], batch["audio_lengths"])
            if augment:
                krng, kaug = jax.random.split(krng)
                features = augmentation.feature_augment(kaug, features, feat_lengths)
            out, new_model_state = model.apply(
                params,
                state.model_state,
                features,
                feat_lengths,
                batch["prediction"],
                batch["prediction_length"],
                training=True,
                rng=krng,
            )
            per_example = rnnt_loss(
                out["logits"],
                batch["labels"],
                out["logits_length"],
                batch["labels_length"],
                blank_id,
            )
            rnnt = jnp.sum(per_example) / jnp.asarray(global_batch_size, jnp.float32)
            reg = l2_regularization(params, l2) if l2 else 0.0
            return rnnt + reg, (rnnt, new_model_state)

        (loss, (rnnt, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            model_state=new_model_state,
        )
        return new_state, {"loss": loss, "rnnt": rnnt, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_transducer_eval_step(
    model,
    featurizer: SpeechFeaturizer,
    *,
    global_batch_size: int,
    l2: float = 0.0,
    blank_id: int = 0,
) -> Callable:
    from telugu_asr_tpu.losses.rnnt import rnnt_loss

    def step_fn(state: TrainState, batch: dict):
        features, feat_lengths = featurizer(batch["audio"], batch["audio_lengths"])
        out, _ = model.apply(
            state.params,
            state.model_state,
            features,
            feat_lengths,
            batch["prediction"],
            batch["prediction_length"],
            training=False,
        )
        per_example = rnnt_loss(
            out["logits"], batch["labels"], out["logits_length"], batch["labels_length"], blank_id
        )
        rnnt = jnp.sum(per_example) / jnp.asarray(global_batch_size, jnp.float32)
        reg = l2_regularization(state.params, l2) if l2 else 0.0
        return {"loss": rnnt + reg, "rnnt": rnnt}

    return jax.jit(step_fn)
