from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
from telugu_asr_tpu.audio.io import read_wav_bytes, read_wav_file
from telugu_asr_tpu.audio.mel import dct_matrix, linear_to_mel_weight_matrix

__all__ = [
    "FeaturizerConfig",
    "SpeechFeaturizer",
    "read_wav_bytes",
    "read_wav_file",
    "dct_matrix",
    "linear_to_mel_weight_matrix",
]
