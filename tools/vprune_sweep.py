#!/usr/bin/env python
"""Find the regime where local V pruning pays (VERDICT r4 item 7).

Sweeps v_keep_ratio x v_block at serving capacities and times the decode
step with V pruning on vs off (everything else fixed).  The reference's
workload CSVs show value_fetch_num ~ 0.2x key_fetch_num on GPT-2; on a
bandwidth-rich chip the fetch saving must beat the in-kernel mass/top-k
cost to net positive.

    python tools/vprune_sweep.py [cap] [batch]

Prints a markdown table of ms/step and the net effect per point.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench
from spatten_tpu.models import transformer
from spatten_tpu.models.weight_quant import quantize_params


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    steps = int(os.environ.get("SPATTEN_BENCH_STEPS", 64))

    params = transformer.init_params(bench.shard_model_cfg(),
                                     jax.random.PRNGKey(0))
    params = jax.device_put(jax.device_get(quantize_params(params)))

    def run(v_on, v_keep_ratio=0.25, v_block=None):
        cfg = bench.build_cfg(True, cap, batch)
        pr = dataclasses.replace(
            cfg.pruning, enable_v_pruning=v_on,
            v_keep_ratio=v_keep_ratio,
            v_block_size=v_block or cfg.pruning.v_block_size)
        cfg = dataclasses.replace(cfg, pruning=pr)
        tps, st = bench.time_decode(cfg, params, steps)
        del st
        return 1e3 * batch / tps      # ms/step

    base = run(False)
    print(f"cap {cap} x b {batch}: V-prune OFF = {base:.3f} ms/step\n")
    print("| v_keep_ratio | v_block | ms/step | net vs off (ms) |")
    print("|---|---|---|---|")
    for ratio in (0.15, 0.25, 0.35, 0.5):
        for vb in (cap // 256, cap // 128, cap // 64):
            if cap % vb:
                continue
            ms = run(True, ratio, vb)
            print(f"| {ratio} | {vb} | {ms:.3f} | {base - ms:+.3f} |",
                  flush=True)


if __name__ == "__main__":
    main()
