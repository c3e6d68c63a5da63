"""Component-level timing breakdown of one decode step at bench shapes.

The VERDICT asked for a per-component breakdown of the decode step (the
builder was "tuning blind").  jax.profiler traces are unreliable through
the axon remote-TPU tunnel, so this measures by ablation: each component
is jitted alone at exactly the bench shapes and timed over many
iterations (device_get forces completion — block_until_ready returns
early on axon).

Usage:  python tools/profile_decode.py            # full table
        SPATTEN_PROF_ITERS=32 python tools/profile_decode.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/spatten_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(os.environ.get("SPATTEN_PROF_ITERS", 16))


def timeit(name, fn, *args, donate=None):
    """Median-of-iters wall time of jitted fn(*args), ms."""
    jfn = jax.jit(fn, donate_argnums=donate) if donate else jax.jit(fn)

    def force(out):
        # fetch the smallest output leaf (avoids huge int8 transfers and
        # axon's trouble with sliced transfers of big arrays)
        leaf = min(jax.tree.leaves(out), key=lambda a: a.size)
        jax.device_get(leaf)

    t0 = time.perf_counter()
    out = jfn(*args)
    force(out)
    compile_s = time.perf_counter() - t0
    if donate:
        # convention: fn(params, state, token) -> (state, token), donated
        # state must be rebound every call
        params, state, token = args
        state, token = out
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, token = jfn(params, state, token)
        force(token)
    else:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jfn(*args)
        force(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:<46s} {dt:9.3f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    import dataclasses

    from bench import build_cfg, warm_state, BENCH_LAYERS
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.models import transformer

    cache = int(os.environ.get("SPATTEN_BENCH_CACHE", 4096))
    batch = int(os.environ.get("SPATTEN_BENCH_BATCH", 16))
    cfg_sp = build_cfg(True, cache, batch)
    cfg_dn = build_cfg(False, cache, batch)
    m = cfg_sp.model
    b, hkv, dh, cap = batch, m.num_kv_heads, m.head_dim, cache
    print(f"shapes: B={b} Hkv={hkv} D={dh} cap={cap} "
          f"layers={BENCH_LAYERS} iters={ITERS}", flush=True)

    params = transformer.init_params(m, jax.random.PRNGKey(0))
    params = jax.device_put(jax.device_get(params))
    tok = jnp.zeros((b,), jnp.int32)

    def step(cfg):
        def f(params, state, token):
            logits, state, _ = transformer.forward(
                params, cfg, state, token[:, None])
            return state, jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return f

    def mk_state(cfg):
        return warm_state(cfg, init_state(cfg, batch=b))

    def run(name, cfg):
        return timeit(name, step(cfg), params, mk_state(cfg), tok,
                      donate=(1,))

    # ---- full steps (the bench numbers) + feature ablations ------------
    t_sp = run("FULL spatten step (8L)", cfg_sp)
    t_dn = run("FULL dense step (8L)", cfg_dn)
    run("spatten, no V-prune", dataclasses.replace(
        cfg_sp, pruning=dataclasses.replace(
            cfg_sp.pruning, enable_v_pruning=False)))
    run("spatten, no requant", dataclasses.replace(
        cfg_sp, quant=dataclasses.replace(
            cfg_sp.quant, enable_requant=False, requant_threshold=0.0)))
    run("spatten, requant fires always", dataclasses.replace(
        cfg_sp, quant=dataclasses.replace(
            cfg_sp.quant, requant_threshold=1.1)))
    run("spatten, no importance tracking", dataclasses.replace(
        cfg_sp, pruning=dataclasses.replace(
            cfg_sp.pruning, enable_token_pruning=False,
            enable_v_pruning=False)))
    cap_small = 512
    run("spatten @ cap 512 (overhead floor)",
        build_cfg(True, cap_small, batch))
    run("dense @ cap 512 (overhead floor)",
        build_cfg(False, cap_small, batch))

    # ---- lm_head alone -------------------------------------------------
    def lm_only(params, x):
        return jnp.argmax(x @ params["embed"].T, -1)

    xlm = jnp.zeros((b, m.hidden_size), jnp.bfloat16)
    timeit(f"lm_head alone (tied embed, vocab {m.vocab_size})", lm_only,
           params, xlm)

    # ---- non-attention floor: weights-only model ----------------------
    def weights_only(params, x):
        lp = params["layers"]
        def body(x, lpl):
            h = x @ lpl["wq"] + (x @ lpl["wk"]).sum() * 0
            h = h + (x @ lpl["wv"]).sum() * 0
            o = h @ lpl["wo"]
            x = x + o
            g = jax.nn.silu(x @ lpl["w_gate"]) * (x @ lpl["w_up"])
            x = x + g @ lpl["w_down"]
            return x, ()
        x, _ = jax.lax.scan(body, x, lp)
        logits = x @ params["embed"].T
        return jnp.argmax(logits, -1)

    x0 = jnp.zeros((b, m.hidden_size), jnp.bfloat16)
    timeit("weights-only floor (QKVO+MLP+lm_head)", weights_only,
           params, x0)

    print(f"\nsummary: spatten {t_sp:.2f} ms vs dense {t_dn:.2f} ms "
          f"-> {t_dn / t_sp:.3f}x", flush=True)


if __name__ == "__main__":
    main()
