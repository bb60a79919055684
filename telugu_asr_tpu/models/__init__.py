from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig

__all__ = ["ASRModel", "MoonshineConfig"]
