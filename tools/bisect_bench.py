"""Bisect the spatten engine's step cost at a bench point."""
import dataclasses
import os
import sys

sys.path.insert(0, ".")
import jax

import bench

cache = int(os.environ.get("CACHE", 4096))
batch = int(os.environ.get("BATCH", 16))
steps = int(os.environ.get("STEPS", 32))


def run(name, cfg, params):
    tps, _ = bench.time_decode(cfg, params, steps)
    bench.log(f"{name}: {tps:.1f} tok/s")


def main():
    from spatten_tpu.models import transformer
    from spatten_tpu.models.weight_quant import quantize_params

    params = transformer.init_params(bench.shard_model_cfg(),
                                     jax.random.PRNGKey(0))
    params = jax.device_put(jax.device_get(quantize_params(params)))

    cfg_dn = bench.build_cfg(False, cache, batch)
    run("dense", cfg_dn, params)

    cfg_sp = bench.build_cfg(True, cache, batch)
    thr = bench.calibrate_requant(cfg_sp, params)
    bench.log(f"threshold {thr:.3e}")
    cfg_sp = dataclasses.replace(
        cfg_sp, quant=dataclasses.replace(cfg_sp.quant,
                                          requant_threshold=thr))

    run("spatten full", cfg_sp, params)

    cfg = dataclasses.replace(
        cfg_sp, pruning=dataclasses.replace(
            cfg_sp.pruning, enable_head_pruning=False, head_keep=0,
            head_update_interval=0))
    run("spatten no-headprune", cfg, params)

    cfg2 = dataclasses.replace(
        cfg_sp, quant=dataclasses.replace(cfg_sp.quant,
                                          enable_requant=False))
    run("spatten no-requant", cfg2, params)

    cfg3 = dataclasses.replace(
        cfg, quant=dataclasses.replace(cfg.quant, enable_requant=False))
    run("spatten no-hp no-rq", cfg3, params)

    cfg4 = dataclasses.replace(
        cfg3, pruning=dataclasses.replace(cfg3.pruning,
                                          enable_v_pruning=False))
    run("spatten no-hp no-rq no-vp", cfg4, params)


if __name__ == "__main__":
    main()
