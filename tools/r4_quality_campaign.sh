#!/bin/bash
# Round-4 quality-axis campaign (serial TPU pipeline; see data/synth20k/REPORT.md).
# Stage 1: extend the HPO-winner synth20k arm to 30 epochs (auto-resume).
# Stage 2: eval + audio-conditioning diagnosis on it.
# Stage 3: bisect arm — flagship architecture + HPO-winner optimizer (20k).
# Stage 4: eval + diagnosis on the bisect arm.
# Stage 5: the headline run — FLAGSHIP config at reference data scale (95k).
# Stage 6: eval + diagnosis on the 95k run.
set -x
cd /root/repo

timeout 3600 python train.py --config data/synth20k/config_hpowin.yaml \
    --run-dir data/synth20k/run_hpowin --epochs 30 --batch-size 64 \
    --val-wer-every 1 --base-dir . >> data/synth20k/run_hpowin.out 2>&1

timeout 1800 python test.py --config data/synth20k/config_hpowin.yaml \
    --checkpoint-dir data/synth20k/run_hpowin/checkpoints \
    --output data/synth20k/run_hpowin/eval_test_e30.tsv --batch-size 64 \
    > data/synth20k/run_hpowin_eval.log 2>&1
timeout 900 python tools/diagnose_audio_conditioning.py \
    --config data/synth20k/config_hpowin.yaml \
    --checkpoint-dir data/synth20k/run_hpowin/checkpoints \
    --tsv data/synth20k/train.tsv --batch 64 \
    >> data/synth20k/run_hpowin_eval.log 2>&1

timeout 3600 python train.py --config data/synth20k/config_flagship_hpoopt.yaml \
    --run-dir data/synth20k/run_flagship_hpoopt --epochs 15 --batch-size 64 \
    --val-wer-every 1 --base-dir . > data/synth20k/run_flagship_hpoopt.out 2>&1

timeout 1800 python test.py --config data/synth20k/config_flagship_hpoopt.yaml \
    --checkpoint-dir data/synth20k/run_flagship_hpoopt/checkpoints \
    --output data/synth20k/run_flagship_hpoopt/eval_test_e15.tsv --batch-size 64 \
    > data/synth20k/run_flagship_hpoopt_eval.log 2>&1
timeout 900 python tools/diagnose_audio_conditioning.py \
    --config data/synth20k/config_flagship_hpoopt.yaml \
    --checkpoint-dir data/synth20k/run_flagship_hpoopt/checkpoints \
    --tsv data/synth20k/train.tsv --batch 64 \
    >> data/synth20k/run_flagship_hpoopt_eval.log 2>&1

timeout 14000 python train.py --config data/synth95k/config.yaml \
    --run-dir data/synth95k/run --epochs 10 --batch-size 64 \
    --val-wer-every 1 --base-dir . > data/synth95k/run.out 2>&1

timeout 1800 python test.py --config data/synth95k/config.yaml \
    --checkpoint-dir data/synth95k/run/checkpoints \
    --output data/synth95k/run/eval_test_e10.tsv --batch-size 64 \
    > data/synth95k/run_eval.log 2>&1
timeout 900 python tools/diagnose_audio_conditioning.py \
    --config data/synth95k/config.yaml \
    --checkpoint-dir data/synth95k/run/checkpoints \
    --tsv data/synth95k/train.tsv --batch 64 \
    >> data/synth95k/run_eval.log 2>&1

echo "CAMPAIGN DONE"
