"""Standalone result-file evaluation (reference: app_util.evaluate_results).

Usage: python -m telugu_asr_tpu.eval path/to/output.tsv
"""
import sys

from telugu_asr_tpu.eval.harness import evaluate_results

if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    metrics = evaluate_results(sys.argv[1])
    for key, value in metrics.items():
        print(f"{key}: {value:.6f}")
