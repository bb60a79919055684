"""Model export: StableHLO serialization and TFLite conversion.

Parity with the reference's TFLite export intent (exec_helpers.py:41-58 —
whose ``make_tflite_function`` was never implemented) done the JAX way:

* :func:`export_stablehlo` — ``jax.export`` serializes the jitted forward to
  a portable StableHLO artifact (the TPU-native interchange format; loadable
  from any XLA runtime via ``jax.export.deserialize``);
* :func:`convert_tflite` — ``jax2tf`` wraps the forward as a TF concrete
  function and runs the TFLite converter with the reference's settings
  (DEFAULT optimization, optional int8 representative dataset,
  SELECT_TF_OPS fallback).

Both export the teacher-forced forward ``(audio, audio_lengths, tokens) →
logits`` with the featurizer fused in, so the artifact is self-contained from
raw PCM.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger("telugu_asr_tpu")

__all__ = ["make_forward_fn", "export_stablehlo", "convert_tflite"]


def make_forward_fn(model, params, featurizer) -> Callable:
    """Self-contained forward closure: raw audio → vocab logits."""
    import jax

    def forward(audio, audio_lengths, shifted_right_text):
        features, feat_lengths = featurizer(audio, audio_lengths)
        return model.apply(params, features, feat_lengths, shifted_right_text)

    return jax.jit(forward)


def _example_args(batch: int, seconds: float, text_len: int, sample_rate: int = 16000):
    import jax.numpy as jnp

    n = int(seconds * sample_rate)
    return (
        jnp.zeros((batch, n), jnp.float32),
        jnp.full((batch,), n, jnp.int32),
        jnp.zeros((batch, text_len), jnp.int32),
    )


def export_stablehlo(
    model,
    params,
    featurizer,
    output_path: str,
    *,
    batch: int = 1,
    seconds: float = 5.46,
    text_len: int = 128,
) -> str:
    """Serialize the forward step to a StableHLO artifact file."""
    import jax
    from jax import export as jax_export

    forward = make_forward_fn(model, params, featurizer)
    args = _example_args(batch, seconds, text_len)
    exported = jax_export.export(forward)(*args)
    data = exported.serialize()
    with open(output_path, "wb") as f:
        f.write(data)
    logger.info("exported StableHLO (%d bytes) to %s", len(data), output_path)
    return output_path


def convert_tflite(
    model,
    params,
    featurizer,
    output: str,
    *,
    batch: int = 1,
    seconds: float = 5.46,
    text_len: int = 128,
    representative_dataset: Optional[Callable] = None,
    optimize: bool = False,
) -> str:
    """Convert the forward step to a .tflite flatbuffer.

    ``optimize=False`` (default) produces a FLOAT32 artifact verified exact
    against the JAX forward (~1e-6).  ``optimize=True`` applies the
    reference's converter settings (``Optimize.DEFAULT`` dynamic-range int8,
    exec_helpers.py:41-58; add ``representative_dataset`` for full int8) —
    expect quantization error in the logits."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    def forward(audio, audio_lengths, shifted_right_text):
        import jax

        features, feat_lengths = featurizer(audio, audio_lengths)
        return model.apply(params, features, feat_lengths, shifted_right_text)

    args = _example_args(batch, seconds, text_len)
    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False),
        input_signature=[
            tf.TensorSpec(np.asarray(a).shape, np.asarray(a).dtype) for a in args
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    if optimize:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    if representative_dataset is not None:
        converter.representative_dataset = representative_dataset
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    converter.allow_custom_ops = True
    tflite_model = converter.convert()
    with open(output, "wb") as f:
        f.write(tflite_model)
    logger.info("exported TFLite (%d bytes) to %s", len(tflite_model), output)
    return output
