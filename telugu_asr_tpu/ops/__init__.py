from telugu_asr_tpu.ops import attention, conv, initializers, mlp, norm, rope

__all__ = ["attention", "conv", "initializers", "mlp", "norm", "rope"]
