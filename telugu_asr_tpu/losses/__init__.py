from telugu_asr_tpu.losses.ce import masked_cross_entropy
from telugu_asr_tpu.losses.regularization import l2_regularization

__all__ = ["masked_cross_entropy", "l2_regularization"]
