from telugu_asr_tpu.optim.schedules import TransformerLearningRateSchedule, transformer_schedule
from telugu_asr_tpu.optim.optimizers import make_optimizer

__all__ = ["TransformerLearningRateSchedule", "transformer_schedule", "make_optimizer"]
