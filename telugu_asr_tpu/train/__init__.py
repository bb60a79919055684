from telugu_asr_tpu.train.state import TrainState
from telugu_asr_tpu.train.step import make_eval_step, make_train_step

__all__ = ["TrainState", "make_train_step", "make_eval_step"]
