from telugu_asr_tpu.ops.pallas.melspec import fused_log_mel, pallas_available

__all__ = ["fused_log_mel", "pallas_available"]
