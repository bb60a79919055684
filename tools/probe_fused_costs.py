#!/usr/bin/env python3
"""Ablation-probe the fused decode kernel's per-op cost distribution.

Runs ``tools/bench_decode_fused.py`` once per probe mode (subprocesses, so
each gets a clean jit cache) with ``TELUGU_FUSED_PROBE`` set.  Each probe
ablates one class of per-segment work inside ``flash_segment``
(ops/pallas/decode_fused.py) while pinning the step count to the full cap,
so the timing DELTA vs the unablated run is that op class's share:

    noseg   skip ALL per-segment work (floor: loop + matmul-free step)
    nomm    skip the head-sum MXU matmuls (scores stay un-reduced)
    nomask  skip validity masking + the running-max tree
    noexp   replace both exp()s with subtraction
    notree  skip the SEG reduction trees (keep 1 slice)

Probe outputs are numerically WRONG by design — never set the env var in
production.  Results guide which op class to optimize next.

Usage:
    python tools/probe_fused_costs.py [--probes none,noseg,...] [--int8]
        [--cache-dtype bfloat16] [--batch 64] [--seconds 5.46]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

PROBES = ["none", "noseg", "nomm", "nomask", "noexp", "notree"]
# beam-only extra classes: the eager parent cache reorder, the K-extraction
# top-K trees, and the per-group log-softmax
BEAM_PROBES = PROBES + ["noreorder", "notopk", "nologsm"]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--probes", default=None,
                        help=f"default: {','.join(PROBES)} (greedy) / "
                             f"{','.join(BEAM_PROBES)} (--beam)")
    parser.add_argument("--beam", type=int, default=1,
                        help=">1 probes the fused BEAM kernel at width K")
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--cache-dtype", default=None)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=5.46)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--rows-per-cell", type=int, default=None)
    args = parser.parse_args()

    base_cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "bench_decode_fused.py"),
        "--batch", str(args.batch), "--seconds", str(args.seconds),
        "--trials", str(args.trials),
    ]
    if args.int8:
        base_cmd.append("--int8")
    if args.cache_dtype:
        base_cmd += ["--cache-dtype", args.cache_dtype]
    if args.rows_per_cell is not None:
        base_cmd += ["--rows-per-cell", str(args.rows_per_cell)]
    if args.beam > 1:
        base_cmd += ["--beam", str(args.beam)]

    probes = args.probes or ",".join(BEAM_PROBES if args.beam > 1 else PROBES)
    results = {}
    for probe in probes.split(","):
        env = dict(os.environ, TELUGU_FUSED_PROBE=probe)
        print(f"=== probe={probe} ===", flush=True)
        out = subprocess.run(base_cmd, env=env, capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode or not line:
            print(out.stdout[-2000:], out.stderr[-2000:], flush=True)
            continue
        rec = json.loads(line[-1])
        results[probe] = rec["value"]
        print(line[-1], flush=True)

    if "none" in results:
        full = results["none"]
        print("\n--- shares vs unablated ---")
        for probe, ms in results.items():
            if probe == "none":
                continue
            print(f"{probe:8s} {ms:8.2f} ms  saves {full - ms:7.2f} ms "
                  f"({100 * (full - ms) / full:5.1f}% of {full:.2f})")


if __name__ == "__main__":
    main()
