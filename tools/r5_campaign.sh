#!/bin/bash
# Round-5 campaign (serial TPU pipeline; results land in data/synth95k/ and
# README).  Run AFTER the synth95k resume (epochs 9->40) has exited — every
# stage shares the one chip and the one host core.
#
# Stage 1: best-val eval of the converged synth95k model (greedy + beam-4).
# Stage 2: exposure-bias decode A/B (length penalty / repetition penalty /
#          no-repeat-ngram) on the same checkpoint.
# Stage 3: serving-precision WER study (every fast path vs f32).
# Stage 4: bench.py with the trained lane (worst-case + trained + staged).
# Stage 5: streaming partial-quality + latency on the trained model.
# Stage 6: MFU batch-scaling curve (train mode).
# Stage 7: tail-bucket floor analysis (probe ablations at 17.73 s).
# Stage 8: 75-trial HPO campaign at synth20k scale (time-boxed).
set -x
cd /root/repo

CKPT=data/synth95k/run/checkpoints_best
CFG=data/synth95k/config.yaml

# 1
timeout 1800 python test.py --config $CFG --checkpoint-dir $CKPT \
    --output data/synth95k/run/eval_r5_greedy.tsv --batch-size 64 \
    > data/synth95k/run/eval_r5_greedy.log 2>&1
timeout 1800 python test.py --config $CFG --checkpoint-dir $CKPT --beam 4 \
    --output data/synth95k/run/eval_r5_beam4.tsv --batch-size 64 \
    > data/synth95k/run/eval_r5_beam4.log 2>&1

# 2
for mode in "lp06:--length-penalty 0.6" \
            "rp13:--repetition-penalty 1.3" \
            "nr3:--no-repeat-ngram 3" \
            "lp06_nr3:--length-penalty 0.6 --no-repeat-ngram 3"; do
  name=${mode%%:*}; flags=${mode#*:}
  timeout 1800 python test.py --config $CFG --checkpoint-dir $CKPT --beam 4 \
      $flags --output data/synth95k/run/eval_r5_beam4_$name.tsv \
      --batch-size 64 > data/synth95k/run/eval_r5_beam4_$name.log 2>&1
done

# 3
timeout 5400 python tools/precision_wer_study.py --checkpoint-dir $CKPT \
    --config $CFG --batch-size 64 --out data/synth95k/precision_study \
    > data/synth95k/precision_study.log 2>&1

# 4
timeout 3600 python bench.py > data/synth95k/bench_r5_trained.json 2> data/synth95k/bench_r5_trained.log

# 5
timeout 2400 python tools/bench_streaming.py --checkpoint $CKPT \
    --utts 8 --concat 4 > data/synth95k/streaming_quality.log 2>&1

# 6
timeout 5400 python tools/mfu_scaling.py --batches 64,128,256,512 \
    --dtypes float32,bfloat16 --out data/mfu_scaling.json \
    > data/mfu_scaling.log 2>&1

# 7
timeout 3600 python tools/probe_fused_costs.py --seconds 17.73 \
    > data/tail_floor_probes.log 2>&1

# 8 (time-boxed separately; see README HPO section)
# timeout 14400 python train_optuna.py --config config/model.yaml \
#     --n-trials 75 --epochs 24 --batch-size 64 --steps-per-epoch 100 \
#     --storage data/hpo_75/study.json --study-name telugu-75 \
#     > data/hpo_75/campaign.log 2>&1
