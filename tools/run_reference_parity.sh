#!/usr/bin/env bash
# Turnkey reference-parity runbook (VERDICT r4 #8).
#
# Pointed at a RESPIN-layout corpus, this runs the full reference pipeline:
#   prepare (TSV build + NFC normalization, only if raw audio layout)
#   -> train (reference arch, HPO-winner optimizer + --clip-norm 1.0 — the
#      recipe data/synth95k/REPORT.md proved conditions on audio; pass
#      --reference-recipe for the reference's verbatim shipped optimizer,
#      which REPORT.md shows collapses into the text-LM shortcut)
#   -> best-val eval (checkpoints_best) -> output.tsv + WER/CER
#
# Corpus layouts accepted (reference TSV format: PATH\tDURATION\tTRANSCRIPT):
#   A. CORPUS_DIR/{train,dev,test}.tsv            (ready-made)
#   B. CORPUS_DIR/audio_{train,dev,test}/*.wav +
#      CORPUS_DIR/transcripts_{train,dev,test}.tsv (id\ttext) — converted
#      via tools/prepare_dataset.py first.
#
# Usage:
#   tools/run_reference_parity.sh --corpus DIR --out RUN_DIR
#       [--epochs 40] [--batch 64] [--beam 4] [--platform cpu|tpu]
#       [--steps-per-epoch N] [--config-template config/model.yaml]
#       [--reference-recipe]
#
# Validated end-to-end against the synth95k stand-in corpus (REPORT.md);
# closes the practical distance to /root/reference/README.md:8-9 (WER 0.52 /
# CER 0.21 on RESPIN) for whenever the real audio exists.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS="" OUT="" EPOCHS=40 BATCH=64 BEAM=4 PLATFORM="" STEPS="" TEMPLATE="$REPO/config/model.yaml" REFERENCE_RECIPE=0
while [[ $# -gt 0 ]]; do
  case "$1" in
    --corpus) CORPUS="$2"; shift 2;;
    --out) OUT="$2"; shift 2;;
    --epochs) EPOCHS="$2"; shift 2;;
    --batch) BATCH="$2"; shift 2;;
    --beam) BEAM="$2"; shift 2;;
    --platform) PLATFORM="$2"; shift 2;;
    --steps-per-epoch) STEPS="$2"; shift 2;;
    --config-template) TEMPLATE="$2"; shift 2;;
    --reference-recipe) REFERENCE_RECIPE=1; shift;;
    *) echo "unknown arg: $1" >&2; exit 2;;
  esac
done
[[ -n "$CORPUS" && -n "$OUT" ]] || { echo "usage: $0 --corpus DIR --out RUN_DIR [...]" >&2; exit 2; }
mkdir -p "$OUT"

# ---- 1. prepare: ensure reference-format TSVs exist -------------------------
for split in train dev test; do
  if [[ ! -f "$CORPUS/$split.tsv" ]]; then
    audio_dir="$CORPUS/audio_$split"
    trans="$CORPUS/transcripts_$split.tsv"
    [[ -d "$audio_dir" && -f "$trans" ]] || {
      echo "missing $CORPUS/$split.tsv and no raw layout ($audio_dir + $trans)" >&2
      exit 3
    }
    echo "== preparing $split.tsv from raw layout"
    python "$REPO/tools/prepare_dataset.py" \
      --audio-dir "$audio_dir" --transcripts "$trans" \
      --output "$CORPUS/$split.tsv"
  fi
done

# ---- 2. config: template arch + corpus paths + proven optimizer -------------
python - "$TEMPLATE" "$CORPUS" "$OUT" "$REFERENCE_RECIPE" <<'EOF'
import sys

import yaml

template, corpus, out, ref_recipe = sys.argv[1:5]
cfg = yaml.safe_load(open(template))
for section, split in (("train_dataset_config", "train"),
                       ("eval_dataset_config", "dev"),
                       ("test_dataset_config", "test")):
    cfg["data_config"][section]["data_paths"] = [f"{corpus}/{split}.tsv"]
if ref_recipe != "1":
    # HPO-winner schedule (data/synth95k/config.yaml provenance) — the
    # recipe that conditions the decoder on audio at reference scale.
    lr = cfg["learning_config"]["optimizer_config"]["config"]["learning_rate"]
    lr["config"].update(max_lr=0.0049587378731768775,
                        min_lr=7.686627532027883e-05,
                        warmup_steps=10000)
yaml.safe_dump(cfg, open(f"{out}/config.yaml", "w"))
print(f"wrote {out}/config.yaml (reference_recipe={ref_recipe=='1'})")
EOF

# ---- 3. train (resumes automatically if RUN_DIR/run has checkpoints) --------
TRAIN_ARGS=(--config "$OUT/config.yaml" --run-dir "$OUT/run"
            --epochs "$EPOCHS" --batch-size "$BATCH" --val-wer-every 1)
[[ $REFERENCE_RECIPE -eq 0 ]] && TRAIN_ARGS+=(--clip-norm 1.0)
[[ -n "$PLATFORM" ]] && TRAIN_ARGS+=(--platform "$PLATFORM")
[[ -n "$STEPS" ]] && TRAIN_ARGS+=(--steps-per-epoch "$STEPS")
echo "== training: train.py ${TRAIN_ARGS[*]}"
python "$REPO/train.py" "${TRAIN_ARGS[@]}"

# ---- 4. best-val eval -> output.tsv -----------------------------------------
CKPT="$OUT/run/checkpoints_best"
[[ -d "$CKPT" && -n "$(ls "$CKPT" 2>/dev/null)" ]] || CKPT="$OUT/run/checkpoints"
EVAL_ARGS=(--config "$OUT/config.yaml" --checkpoint-dir "$CKPT"
           --output "$OUT/output.tsv" --batch-size 16)
[[ "$BEAM" -gt 1 ]] && EVAL_ARGS+=(--beam "$BEAM")
[[ -n "$PLATFORM" ]] && EVAL_ARGS+=(--platform "$PLATFORM")
echo "== evaluating: test.py ${EVAL_ARGS[*]} (checkpoint: $CKPT)"
python "$REPO/test.py" "${EVAL_ARGS[@]}" | tee "$OUT/eval_metrics.txt"

echo "== done: $OUT/output.tsv (reference parity targets: WER 0.52 / CER 0.21)"
