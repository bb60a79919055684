"""Batch schemas (reference: src/models/moonshine/schemas.py, src/schemas.py).

The seq2seq schema carries raw audio instead of precomputed features — the
featurizer runs on-device inside the jitted step.  ``audio_lengths`` replaces
the reference's implicit "all-zero frame" padding convention with explicit
lengths (the two are equivalent; see moonshine/model.py:80 mask law).
"""
from __future__ import annotations

__all__ = ["TrainInput", "TargetLabels", "TransducerTrainInput", "TransducerTargetLabels", "OutputLogits"]


def TrainInput(audio, audio_lengths, shifted_right_text_inputs):
    return {
        "audio": audio,
        "audio_lengths": audio_lengths,
        "shifted_right_text_inputs": shifted_right_text_inputs,
    }


def TargetLabels(text_targets):
    return {"text_targets": text_targets}


def TransducerTrainInput(audio, audio_lengths, prediction, prediction_length):
    return {
        "audio": audio,
        "audio_lengths": audio_lengths,
        "prediction": prediction,
        "prediction_length": prediction_length,
    }


def TransducerTargetLabels(labels, labels_length):
    return {"labels": labels, "labels_length": labels_length}


def OutputLogits(logits, logits_length):
    return {"logits": logits, "logits_length": logits_length}
