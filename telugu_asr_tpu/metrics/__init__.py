from telugu_asr_tpu.metrics.text import (
    ErrorRate,
    cer,
    edit_distance,
    wer,
)

__all__ = ["ErrorRate", "cer", "edit_distance", "wer"]
