"""Optimizer factory resolving the reference's YAML optimizer_config.

The reference resolves ``class_name: Adam`` + a registry-string LR schedule
through ``tf.keras.optimizers.get`` (train.py:83, model.yaml:95-107).  Here
the same dict produces an optax chain.  Weight regularization stays in the
LOSS (matching Keras l2 regularizers) — not decoupled weight decay.
"""
from __future__ import annotations

from typing import Callable, Tuple

import optax

from telugu_asr_tpu.optim.schedules import transformer_schedule

__all__ = ["make_optimizer", "resolve_schedule"]


def resolve_schedule(lr_config) -> Callable:
    """Resolve a learning-rate spec: float | schedule dict."""
    if isinstance(lr_config, (int, float)):
        return lambda step: lr_config
    cfg = dict(lr_config)
    class_name = cfg.get("class_name", "")
    params = dict(cfg.get("config", {}))
    if "TransformerLearningRateSchedule" in str(class_name):
        params = {
            k: (float(v) if k in ("max_lr", "min_lr", "scale") and v is not None else v)
            for k, v in params.items()
        }
        return transformer_schedule(**params)
    raise ValueError(f"unsupported LR schedule: {class_name}")


def make_optimizer(
    optimizer_config, clip_norm: float | None = None
) -> Tuple[optax.GradientTransformation, Callable]:
    """``optimizer_config`` dict → (optax optimizer, schedule fn).

    ``global_clipnorm`` in the config dict (the Keras optimizer kwarg the
    reference schema would carry it under) or an explicit ``clip_norm``
    argument prepends global-norm gradient clipping.  High-LR recipes (the
    HPO winner peaks at 5e-3) measurably need it: the synth20k run rattled
    through warmup peak and collapsed out of its audio-conditioned minimum
    into the text-LM basin (val 1.5 → 19) without clipping.
    """
    cfg = dict(optimizer_config)
    class_name = str(cfg.get("class_name", "Adam")).lower()
    params = dict(cfg.get("config", {}))
    schedule = resolve_schedule(params.get("learning_rate", 1e-3))
    if class_name == "adam":
        opt = optax.adam(
            learning_rate=schedule,
            b1=float(params.get("beta_1", 0.9)),
            b2=float(params.get("beta_2", 0.999)),
            eps=float(params.get("epsilon", 1e-7)),
        )
    elif class_name == "adamw":
        opt = optax.adamw(
            learning_rate=schedule,
            b1=float(params.get("beta_1", 0.9)),
            b2=float(params.get("beta_2", 0.999)),
            eps=float(params.get("epsilon", 1e-7)),
            weight_decay=float(params.get("weight_decay", 1e-4)),
        )
    elif class_name == "sgd":
        opt = optax.sgd(learning_rate=schedule, momentum=float(params.get("momentum", 0.0)))
    else:
        raise ValueError(f"unsupported optimizer: {class_name}")
    clip = clip_norm if clip_norm is not None else params.get("global_clipnorm")
    if clip:
        opt = optax.chain(optax.clip_by_global_norm(float(clip)), opt)
    return opt, schedule
