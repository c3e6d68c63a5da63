#!/usr/bin/env python
"""Decompose the prefill gap vs dense (VERDICT r4 item 2).

Measures chunked prefill throughput at a fixed prompt length for config
variants between the full SpAtten engine and the dense baseline, so the
cost of each prefill-side SpAtten stage (V-prune masking, head masking,
importance epilogue) is visible in isolation.

    python tools/prefill_diag.py [prompt_len] [cap] [batch]
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
    plen = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    params = transformer.init_params(bench.shard_model_cfg(),
                                     jax.random.PRNGKey(0))
    params = jax.device_put(jax.device_get(quantize_params(params)))

    def run(label, spatten, **pr_over):
        cfg = bench.build_cfg(spatten, cap, batch)
        if pr_over:
            cfg = dataclasses.replace(
                cfg, pruning=dataclasses.replace(cfg.pruning, **pr_over))
        tps, ttft = bench.measure_prefill(cfg, params, plen)
        print(f"| {label} | {tps:.0f} | {ttft:.0f} |", flush=True)
        return tps

    print(f"prompt {plen}, cap {cap}, batch {batch}\n")
    print("| variant | tok/s | TTFT ms |")
    print("|---|---|---|")
    run("dense", False)
    run("spatten full", True)
    run("spatten, V-prune off", True, enable_v_pruning=False)
    run("spatten, V+head off", True, enable_v_pruning=False,
        enable_head_pruning=False)


if __name__ == "__main__":
    main()
