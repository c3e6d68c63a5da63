"""Decode-throughput benchmark: SpAtten pipeline vs dense-bf16 baseline.

Run on real TPU hardware.  Prints ONE JSON line:
    {"metric": "decode_tokens_per_s_per_chip", "value": N,
     "unit": "tok/s/chip", "vs_baseline": R, ...}

`value` is tokens/sec/chip of the full SpAtten engine (two-plane quantized
KV, progressive requant, cascade token pruning, local V pruning, fused
Pallas decode kernel).  `vs_baseline` is the speedup over the dense path
(bf16-equivalent: no pruning, no quantization benefit, jnp attention) at the
same model shape, batch, and context — the reference's own north-star
comparison (BASELINE.md: >= 2x dense at the same pruning ratios).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def build_cfg(spatten: bool, num_layers: int, cache: int, batch: int):
    from spatten_tpu.config import (
        EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
    )
    model = dataclasses.replace(
        ModelConfig.llama2_7b(), num_layers=num_layers)
    if spatten:
        pruning = PruningConfig(
            start_size=4,
            important_size=int(cache * 0.40),
            recent_size=int(cache * 0.35),
            enable_v_pruning=True, v_keep_ratio=0.35, v_block_size=16,
        )
        quant = QuantConfig(enabled=True, enable_requant=True,
                            requant_threshold=0.05)
        use_pallas = True
    else:
        pruning = PruningConfig(enable_token_pruning=False,
                                enable_v_pruning=False)
        quant = QuantConfig(enabled=False, enable_requant=False)
        use_pallas = False
    return SpAttenConfig(
        model=model, pruning=pruning, quant=quant,
        engine=EngineConfig(max_batch_size=batch, cache_capacity=cache,
                            prefill_chunk=128, use_pallas=use_pallas),
    ).validate()


def time_decode(cfg, params, steps: int, warmup: int = 3) -> float:
    """Returns decode tokens/sec (batch * steps / wall)."""
    from spatten_tpu.engine import generate as gen
    from spatten_tpu.engine.state import init_state

    b = cfg.engine.max_batch_size
    state = init_state(cfg, batch=b)
    # warm, near-full cache: the steady-state serving regime
    warm_len = int(cfg.engine.cache_capacity * 0.9)
    state = state._replace(lengths=jnp.full((b,), warm_len, jnp.int32))
    token = jnp.zeros((b,), jnp.int32)

    for _ in range(warmup):
        token, state, _ = gen.decode_step(params, cfg, state, token)
    # force completion with a host transfer: on the remote-TPU (axon)
    # platform block_until_ready returns before execution finishes, so we
    # fetch the final token (which data-depends on every step)
    jax.device_get(token)

    t0 = time.perf_counter()
    for _ in range(steps):
        token, state, _ = gen.decode_step(params, cfg, state, token)
    jax.device_get(token)
    dt = time.perf_counter() - t0
    return b * steps / dt


def main():
    from spatten_tpu.models import transformer

    # serving regime: batch large enough that attention (not weight
    # streaming) dominates — the regime the reference accelerates
    num_layers, cache, batch, steps = 6, 2048, 32, 20

    cfg_sp = build_cfg(True, num_layers, cache, batch)
    cfg_dn = build_cfg(False, num_layers, cache, batch)

    params = transformer.init_params(cfg_sp.model, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)

    tps_sp = time_decode(cfg_sp, params, steps)
    tps_dn = time_decode(cfg_dn, params, steps)

    # scale per-layer throughput to the full 32-layer flagship for an
    # honest tokens/s/chip figure (attention+mlp dominate; embed/lm_head
    # amortize): time scales ~linearly in layers.  (The full 7B + its KV
    # cache at this batch exceeds one v5e-lite chip's HBM; per-layer cost
    # is depth-independent, so a 6-layer slice measures it exactly.)
    full_layers = 32
    scale = num_layers / full_layers
    print(json.dumps({
        "metric": "decode_tokens_per_s_per_chip",
        "value": round(tps_sp * scale, 2),
        "unit": "tok/s/chip",
        "vs_baseline": round(tps_sp / tps_dn, 3),
        "detail": {
            "model": "llama2-7b-shape", "bench_layers": num_layers,
            "cache_capacity": cache, "batch": batch,
            "spatten_tps_bench_depth": round(tps_sp, 2),
            "dense_tps_bench_depth": round(tps_dn, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
