from telugu_asr_tpu.hpo.study import (
    Study,
    SuccessiveHalvingPruner,
    TPESampler,
    RandomSampler,
    Trial,
    TrialPruned,
    create_study,
)

__all__ = [
    "Study",
    "SuccessiveHalvingPruner",
    "TPESampler",
    "RandomSampler",
    "Trial",
    "TrialPruned",
    "create_study",
]
