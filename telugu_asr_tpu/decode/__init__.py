from telugu_asr_tpu.decode.greedy import greedy_decode, recognize

__all__ = ["greedy_decode", "recognize"]
