"""Serving-side APIs (beyond the reference's batch CLIs).

The reference serves transcription only as offline batch scripts
(``test.py``; our ``transcribe.py``).  This package adds a low-latency
streaming front end over the same models and kernels.
"""
from telugu_asr_tpu.serving.streaming import StreamingRecognizer

__all__ = ["StreamingRecognizer"]
