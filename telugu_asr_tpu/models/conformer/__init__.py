from telugu_asr_tpu.models.conformer.model import Conformer, ConformerConfig

__all__ = ["Conformer", "ConformerConfig"]
