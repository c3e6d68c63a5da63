#!/usr/bin/env python
"""Replay a workload trace through the native roofline cost model.

The TPU analog of `run_spatten_hardware.py` + the behavioral simulator
(SURVEY.md §3.2/§3.4): feed a per-(iteration, layer, head) workload CSV —
ours (engine/trace.py) or the reference's published ones — and get the
modeled cost: HBM bytes, FLOPs, seconds, tokens/s, and the DRAM-access
reduction vs a dense fp16 run of the same workload (the paper's ~10x
headline, re-derived from the trace itself).

Usage:
  python tools/replay_trace.py <trace.csv> [--hbm-gbps 819]
      [--peak-tflops 98] [--weight-bytes-per-step N] [--json out.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from spatten_tpu.engine.trace import read_csv                    # noqa: E402
from spatten_tpu.perf import HwParams, dense_bytes, estimate_cost  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace")
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument("--peak-tflops", type=float, default=98.0)
    ap.add_argument("--step-overhead-us", type=float, default=30.0)
    ap.add_argument("--weight-bytes-per-step", type=float, default=0.0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    rows = read_csv(args.trace)
    hw = HwParams(hbm_gbps=args.hbm_gbps, peak_tflops=args.peak_tflops,
                  step_overhead_us=args.step_overhead_us,
                  weight_bytes_per_step=args.weight_bytes_per_step)
    res = estimate_cost(rows, hw)
    dense = dense_bytes(rows)
    out = {
        "trace": args.trace,
        "rows": len(rows),
        "iterations": res.iterations,
        "total_bytes": res.total_bytes,
        "total_flops": res.total_flops,
        "modeled_seconds": res.total_seconds,
        "modeled_tokens_per_s": res.tokens_per_s,
        "dense_fp16_bytes": dense,
        "dram_access_reduction": (dense / res.total_bytes
                                  if res.total_bytes else 0.0),
        "hw": dataclasses.asdict(hw),
    }
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
