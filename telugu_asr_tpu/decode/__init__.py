from telugu_asr_tpu.decode.greedy import greedy_decode, recognize
from telugu_asr_tpu.decode.longform import recognize_long_form, segment_longform

__all__ = [
    "greedy_decode",
    "recognize",
    "recognize_long_form",
    "segment_longform",
]
