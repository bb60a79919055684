from telugu_asr_tpu.eval.harness import evaluate_results, run_testing

__all__ = ["evaluate_results", "run_testing"]
