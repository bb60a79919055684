#!/usr/bin/env python3
"""Summarize an HPO study storage JSON into a README-ready table.

Usage: python tools/summarize_hpo_study.py --storage data/hpo_sweep_r3/study.json
Prints trial counts by state, the winner's params/value, a per-trial table,
and (with --json) a machine-readable summary blob.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--storage", required=True)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    with open(args.storage, "r", encoding="utf-8") as f:
        study = json.load(f)
    trials = study.get("trials", [])
    by_state: dict = {}
    for t in trials:
        by_state.setdefault(t.get("state"), []).append(t)
    complete = sorted(by_state.get("complete", []), key=lambda t: t["value"])
    best = complete[0] if complete else None

    if args.json:
        print(json.dumps({
            "study_name": study.get("study_name"),
            "n_trials": len(trials),
            "states": {k: len(v) for k, v in by_state.items()},
            "best_value": best and best["value"],
            "best_number": best and best["number"],
            "best_params": best and best["params"],
        }, indent=2))
        return

    print(f"study: {study.get('study_name')}  trials: {len(trials)}  "
          + "  ".join(f"{k}: {len(v)}" for k, v in sorted(by_state.items())))
    print()
    print("| # | state | best val loss | epochs run | d_model | enc/dec | params |")
    print("|---|---|---|---|---|---|---|")
    for t in sorted(trials, key=lambda t: t["number"]):
        p_ = t.get("params", {})
        inter = t.get("intermediate", {})
        val = t.get("value")
        attrs = t.get("user_attrs", {})
        val_s = f"{val:.3f}" if isinstance(val, (int, float)) else "—"
        print(
            f"| {t['number']} | {t['state']} | {val_s} | {len(inter)} | "
            f"{p_.get('d_model', '—')} | "
            f"{p_.get('encoder_blocks', '—')}/{p_.get('decoder_blocks', '—')} | "
            f"{attrs.get('num_params', '—')} |"
        )
    if best:
        print()
        print(f"winner: trial {best['number']}  val_loss {best['value']:.4f}")
        for k, v in best["params"].items():
            print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
