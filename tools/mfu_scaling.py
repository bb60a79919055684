#!/usr/bin/env python3
"""Train-step batch-scaling curve: ms/step, utt/s and MFU across batch sizes
and compute dtypes (VERDICT r4 weak #1 / next-round #4a).

The flagship is 3.26M params — per-step FLOPs are small, so MFU rises with
batch until HBM streaming of activations (not weights) binds.  This sweep
measures where that knee is and what the best-achievable train MFU on this
chip actually is, turning README's "B=64 is the only measured point" into a
curve.

Usage:
    python tools/mfu_scaling.py [--family moonshine] [--batches 64,128,256,512]
        [--dtypes float32,bfloat16] [--out data/mfu_scaling.json]

One process, benches run sequentially (each batch shape compiles once; the
persistent XLA cache makes repeats instant).  Emits one JSON line per point
plus a markdown table at the end.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--family", default="moonshine",
                        choices=("moonshine", "conformer"))
    parser.add_argument("--batches", default="64,128,256,512")
    parser.add_argument("--dtypes", default="float32,bfloat16")
    parser.add_argument("--out", default=None,
                        help="also write the points to this JSON file")
    args = parser.parse_args()

    import bench

    batches = [int(b) for b in args.batches.split(",")]
    dtypes = [d.strip() for d in args.dtypes.split(",")]
    points = []
    for dtype in dtypes:
        for batch in batches:
            if args.family == "moonshine":
                rec = bench.bench_moonshine_train(
                    batch, dtype=None if dtype == "float32" else dtype
                )
            else:
                if dtype != "float32":
                    continue  # conformer bench has no dtype knob (RNN-T loss f32)
                rec = bench.bench_conformer_train(batch)
            rec["batch"] = batch
            rec["dtype"] = dtype
            print(json.dumps(rec), flush=True)
            points.append(rec)

    print("\n| batch | dtype | ms/step | utt/s | step TFLOPs | MFU |")
    print("|---|---|---|---|---|---|")
    for rec in points:
        print("| {batch} | {dtype} | {value} | {utt} | {tf} | {mfu} |".format(
            batch=rec["batch"], dtype=rec["dtype"], value=rec["value"],
            utt=rec.get("utt_per_sec"), tf=rec.get("step_tflops"),
            mfu=rec.get("mfu_vs_bf16_peak")))
    best = max((r for r in points if r.get("mfu_vs_bf16_peak")),
               key=lambda r: r["mfu_vs_bf16_peak"], default=None)
    if best:
        print(f"\nbest MFU: {best['mfu_vs_bf16_peak']} at "
              f"B={best['batch']} {best['dtype']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(points, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
