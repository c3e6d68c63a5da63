"""Feature-ablation timing of the fused decode step at bench shapes.

Each SpAtten stage is toggled off one at a time on top of the full
config; the delta against the full pipeline prices that stage.  Uses the
bench's own step timer, so numbers are directly comparable to bench.py.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/spatten_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from bench import build_cfg, time_decode, calibrate_requant
    from spatten_tpu.models import transformer

    cache = int(os.environ.get("SPATTEN_BENCH_CACHE", 4096))
    batch = int(os.environ.get("SPATTEN_BENCH_BATCH", 16))
    steps = int(os.environ.get("SPATTEN_BENCH_STEPS", 16))

    cfg_sp = build_cfg(True, cache, batch)
    cfg_dn = build_cfg(False, cache, batch)
    params = transformer.init_params(cfg_sp.model, jax.random.PRNGKey(0))
    params = jax.device_put(jax.device_get(params))

    thr = calibrate_requant(cfg_sp, params)
    cfg_sp = dataclasses.replace(
        cfg_sp, quant=dataclasses.replace(cfg_sp.quant,
                                          requant_threshold=thr))

    def t(name, cfg):
        b = cfg.engine.max_batch_size
        tps, _state = time_decode(cfg, params, steps)
        del _state
        ms = b * 1e3 / tps
        print(f"{name:<44s} {ms:8.2f} ms/step", flush=True)
        return ms

    variants = {
        "dense (honest baseline)": cfg_dn,
        "spatten FULL": cfg_sp,
        "  - token pruning (DENSE lengths)": dataclasses.replace(
            cfg_sp, pruning=dataclasses.replace(
                cfg_sp.pruning, enable_token_pruning=False)),
        "  - requant (msb only)": dataclasses.replace(
            cfg_sp, quant=dataclasses.replace(
                cfg_sp.quant, enable_requant=False)),
        "  - v-prune (full V fetch)": dataclasses.replace(
            cfg_sp, pruning=dataclasses.replace(
                cfg_sp.pruning, enable_v_pruning=False)),
        "  - quant (int8 K fetch)": dataclasses.replace(
            cfg_sp, quant=dataclasses.replace(
                cfg_sp.quant, enabled=False, enable_requant=False)),
    }
    results = {}
    for name, cfg in variants.items():
        results[name] = t(name, cfg.validate())

    full = results["spatten FULL"]
    print("\nstage cost (full - ablated):")
    for name, ms in results.items():
        if name.startswith("  -"):
            print(f"{name[4:]:<40s} {full - ms:+8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
