from telugu_asr_tpu.hpo.launcher import launch_workers, probe_devices, worker_env
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
    "launch_workers",
    "probe_devices",
    "worker_env",
]
