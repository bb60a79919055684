#!/usr/bin/env bash
# On-chip measurement campaign: run every pending TPU job in priority order,
# logging to /tmp/campaign/. Safe to re-run (XLA cache makes repeats fast);
# each step is individually time-bounded so one hung tunnel call cannot eat
# the whole budget. Run from the repo root.
set -u
mkdir -p /tmp/campaign
cd "$(dirname "$0")/.."

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag: $* (timeout ${to}s) ==="
  timeout "$to" "$@" 2>&1 | tee "/tmp/campaign/$tag.log" | tail -20
  echo "=== $tag rc=${PIPESTATUS[0]} ==="  # the measured command, not tail's
}

# 0. health gate: a trivial matmul must sync inside 120 s or the tunnel is down
if ! timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: jnp.sum(a @ a))(jnp.ones((256, 256)))
print("tpu healthy:", float(x))
EOF
then echo "TPU TUNNEL DOWN — aborting campaign"; exit 1; fi

# 1. headline bench (driver metric refresh) + full-pipeline int8 A/B
run bench 1200 python bench.py
run bench_int8 1200 python bench.py --cache-dtype int8

# 2. tail bucket (17.73 s, cap 425): bf16 4x16 baseline vs the 2x32 modes
run tail_bf16 1200 python tools/bench_decode_fused.py --seconds 17.73 --cache-dtype bfloat16
run tail_int8 1200 python tools/bench_decode_fused.py --seconds 17.73 --cache-dtype int8
run tail_mixed 1200 python tools/bench_decode_fused.py --seconds 17.73 --cache-dtype bfloat16 --cross-cache-dtype int8
run tail_int8_fastseg 1200 python tools/bench_decode_fused.py --seconds 17.73 --cache-dtype int8 --fast-segments

# 3. flagship bucket: confirm int8 cross caches didn't regress the short cap
run flag_f32 1200 python tools/bench_decode_fused.py
run flag_int8 1200 python tools/bench_decode_fused.py --cache-dtype int8
# bf16 rows=64 single cell is ~1 MB over the conservative budget law but may
# fit physical VMEM — if it compiles AND matches, the flagship halves cells
run flag_bf16_r64 1200 python tools/bench_decode_fused.py --cache-dtype bfloat16 --rows-per-cell 64
# deflated scores (EXACT): mask/exp/max/te at 128 lanes + MXU re-expand —
# the candidate lossless per-segment win; A/B at flagship and tail
run flag_deflate 1200 python tools/bench_decode_fused.py --deflate-scores
run tail_deflate 1200 python tools/bench_decode_fused.py --seconds 17.73 --cache-dtype bfloat16 --deflate-scores
run tail_int8_deflate 1200 python tools/bench_decode_fused.py --seconds 17.73 --cache-dtype int8 --deflate-scores
# combined K|V (EXACT): single-cell bf16 flagship + 2x32 bf16(+int8 cross) tail
run flag_kv_bf16 1200 python tools/bench_decode_fused.py --cache-dtype bfloat16 --deflate-scores --combine-kv
run tail_kv_mixed 1200 python tools/bench_decode_fused.py --seconds 17.73 --cache-dtype bfloat16 --cross-cache-dtype int8 --deflate-scores --combine-kv

# 4. on-chip parity of the int8 cache mode across the HPO space + tail shape
run validate_int8 2400 python tools/validate_fused_configs.py --cache-dtype int8
run validate_int8_tail 2400 python tools/validate_fused_configs.py --cache-dtype int8 --seconds 17.73 --batch 64

# 4b. fused BEAM kernel: HPO-space parity (best-beam agreement + exact
# re-scoring of kernel hypotheses) and the K/dtype bench ladder
run validate_beam4 2400 python tools/validate_fused_configs.py --beam 4 --batch 8
run validate_beam8 2400 python tools/validate_fused_configs.py --beam 8 --batch 8
run bench_beam 1800 python bench.py --mode beam
run bench_beam_xla 1800 python bench.py --mode beam --beam-impl xla
run bench_beam8 1800 python bench.py --mode beam --beam 8

# 5. kernel cost distribution probes (flagship bucket)
run probe 3600 python tools/probe_fused_costs.py

echo "campaign complete — logs in /tmp/campaign/"
