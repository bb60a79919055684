from telugu_asr_tpu.utils.env import setup_environment, setup_seed

__all__ = ["setup_environment", "setup_seed"]
