from telugu_asr_tpu.data.dataset import ASRDataset, DatasetSpec, read_tsv_entries
from telugu_asr_tpu.data.loader import PrefetchLoader
from telugu_asr_tpu.data.schemas import TargetLabels, TrainInput

__all__ = [
    "ASRDataset",
    "DatasetSpec",
    "read_tsv_entries",
    "PrefetchLoader",
    "TrainInput",
    "TargetLabels",
]
