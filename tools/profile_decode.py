#!/usr/bin/env python
"""Capture a jax.profiler trace + timed phase breakdown of one decode step.

Usage:  python tools/profile_decode.py [spatten|dense] [cache] [batch]

Produces:
* a phase-bisection table on stderr (each phase timed by running a jitted
  window with later phases disabled — subtraction gives the marginal cost);
* optionally a profiler trace under /tmp/spatten_trace (inspect with
  tensorboard or xprof) when SPATTEN_PROFILE_TRACE=1.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/spatten_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_window(cfg, params, steps=64, repeats=3, **forward_overrides):
    import bench
    from spatten_tpu.engine import generate as gen
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.models import transformer
    from spatten_tpu.ops import rope as rope_ops

    b = cfg.engine.max_batch_size
    state = bench.warm_cache_content(cfg, bench.warm_state(
        cfg, init_state(cfg, batch=b)))
    token = jnp.zeros((b,), jnp.int32)
    tables = rope_ops.rope_table(cfg.engine.cache_capacity,
                                 cfg.model.head_dim, cfg.model.rope_theta)

    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(1,))
    def window(params, carry, n):
        state, token = carry

        def body(carry, _):
            state, token = carry
            logits, state, _ = transformer.forward(
                params, cfg, state, token[:, None], rope_tables=tables)
            token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (state, token), ()
        carry, _ = jax.lax.scan(body, (state, token), None, length=n)
        return carry

    carry = window(params, (state, token), steps)
    jax.device_get(carry[1])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = window(params, carry, steps)
        jax.device_get(carry[1])
        best = min(best, time.perf_counter() - t0)
    del carry
    return best / steps * 1e3          # ms/step


def timed_kernel_only(cfg, steps=64, repeats=3, skip_append=False,
                      no_importance=False):
    """Time ONLY the fused decode kernel: a [steps x layers] scan of
    fused_decode_attention over warm stacked planes — no projections, no
    MLP, no lm_head.  Isolates kernel cost from the model around it."""
    import bench
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.ops.fused_decode import fused_decode_attention

    m, e, p, q = cfg.model, cfg.engine, cfg.pruning, cfg.quant
    b = e.max_batch_size
    state = bench.warm_cache_content(cfg, bench.warm_state(
        cfg, init_state(cfg, batch=b)))
    hq, hkv, dh = m.num_heads, m.num_kv_heads, m.head_dim
    cap = e.cache_capacity
    v_keep = 0
    if p.enable_v_pruning:
        from spatten_tpu.pruning.token_pruning import layer_budgets_static
        if p.enable_token_pruning:
            budgets = layer_budgets_static(p, m.num_layers)
            kb_l = [p.start_size + bl + p.recent_size for bl in budgets]
        else:
            kb_l = [cap] * m.num_layers
        v_keep = tuple(max(p.v_block_size, int(p.v_keep_ratio * kb))
                       for kb in kb_l)

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
    def window(carry, n):
        def step(carry, _):
            k_all, v_all, imp_all, layer_lengths = carry

            def layer_fn(inner, layer_idx):
                k_all, v_all, imp_all = inner
                lengths_l = layer_lengths[layer_idx]
                qh = jnp.ones((b, hq, 1, dh), jnp.float32)
                kh = jnp.ones((b, hkv, 1, dh), jnp.float32)
                out, stats, k_all, v_all = fused_decode_attention(
                    qh, k_all, v_all, kh, kh, lengths_l + 1,
                    sm_scale=0.088,
                    quant_enabled=q.enabled,
                    requant_threshold=(q.requant_threshold if
                                       (q.enabled and q.enable_requant)
                                       else 0.0),
                    v_keep=v_keep, v_block_size=p.v_block_size,
                    pv_int8=q.pv_int8,
                    importance_in=None if no_importance else imp_all,
                    track_importance=not no_importance,
                    layer=layer_idx,
                    quantize_queries=q.quantize_queries,
                    _skip_append=skip_append,
                )
                imp_next = (imp_all if no_importance
                            else stats.importance_delta)
                return (k_all, v_all, imp_next), out.sum()

            (k_all, v_all, imp_all), outs = jax.lax.scan(
                layer_fn, (k_all, v_all, imp_all),
                jnp.arange(m.num_layers))
            return (k_all, v_all, imp_all, layer_lengths), outs.sum()

        carry, sums = jax.lax.scan(step, carry, None, length=n)
        return carry, sums.sum()

    carry = (state.cache.k, state.cache.v, state.importance,
             state.layer_lengths)
    carry, s = window(carry, steps)
    jax.device_get(s)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry, s = window(carry, steps)
        jax.device_get(s)
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3


def main():
    import dataclasses

    import bench

    mode = sys.argv[1] if len(sys.argv) > 1 else "spatten"
    cache = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    steps = int(os.environ.get("SPATTEN_BENCH_STEPS", 64))

    from spatten_tpu.models import transformer
    from spatten_tpu.models.weight_quant import quantize_params
    params = transformer.init_params(bench.shard_model_cfg(),
                                     jax.random.PRNGKey(0))
    params = jax.device_put(jax.device_get(quantize_params(params)))

    cfg = bench.build_cfg(mode == "spatten", cache, batch)
    if mode == "spatten":
        thr = bench.calibrate_requant(cfg, params)
        cfg = dataclasses.replace(
            cfg, quant=dataclasses.replace(cfg.quant,
                                           requant_threshold=thr))

    # --- ablation ladder: each row disables one more stage -------------
    rows = []

    def point(name, c):
        ms = timed_window(c, params, steps)
        rows.append((name, ms))
        log(f"{name:40s} {ms:8.3f} ms/step")

    if mode in ("kernel", "kernel-dense"):
        cfg = bench.build_cfg(mode == "kernel", cache, batch)
        if mode == "kernel":
            thr = bench.calibrate_requant(cfg, params)
            cfg = dataclasses.replace(
                cfg, quant=dataclasses.replace(cfg.quant,
                                               requant_threshold=thr))
        ms = timed_kernel_only(cfg, steps)
        print(f"kernel-only ({mode}): {ms:.3f} ms/step")
        return

    if mode == "kernel-ladder":
        cfg = bench.build_cfg(True, cache, batch)
        thr = bench.calibrate_requant(cfg, params)
        cfg = dataclasses.replace(
            cfg, quant=dataclasses.replace(cfg.quant,
                                           requant_threshold=thr))
        for name, kw, c in [
            ("baseline", {}, cfg),
            ("skip_append", dict(skip_append=True), cfg),
            ("no_importance", dict(no_importance=True), cfg),
            ("no requant", {}, dataclasses.replace(
                cfg, quant=dataclasses.replace(
                    cfg.quant, requant_threshold=0.0,
                    enable_requant=False))),
            ("no vprune", {}, dataclasses.replace(
                cfg, pruning=dataclasses.replace(
                    cfg.pruning, enable_v_pruning=False))),
            ("bare (all off)", dict(skip_append=True, no_importance=True),
             dataclasses.replace(
                 cfg,
                 quant=dataclasses.replace(
                     cfg.quant, requant_threshold=0.0,
                     enable_requant=False),
                 pruning=dataclasses.replace(
                     cfg.pruning, enable_v_pruning=False))),
        ]:
            ms = timed_kernel_only(c, steps, **kw)
            print(f"  kernel {name:24s} {ms:8.3f} ms/step", flush=True)
        return

    point(f"{mode} full", cfg)
    if mode == "spatten":
        p, q = cfg.pruning, cfg.quant
        c = dataclasses.replace(cfg, quant=dataclasses.replace(
            q, requant_threshold=0.0, enable_requant=False))
        point("- requant (threshold=0)", c)
        c2 = dataclasses.replace(c, pruning=dataclasses.replace(
            p, enable_v_pruning=False))
        point("- requant - vprune", c2)
        c3 = dataclasses.replace(c2, pruning=dataclasses.replace(
            c2.pruning, enable_head_pruning=False, head_keep=0,
            head_update_interval=0))
        point("- requant - vprune - headprune", c3)
        c4 = dataclasses.replace(c3, pruning=dataclasses.replace(
            c3.pruning, enable_token_pruning=False))
        # token pruning off => steady lengths = 0.9 cap (dense lengths)
        point("- all pruning (quant only, full len)", c4)

    if os.environ.get("SPATTEN_PROFILE_TRACE"):
        log("capturing profiler trace to /tmp/spatten_trace ...")
        from spatten_tpu.engine.state import init_state
        b = cfg.engine.max_batch_size
        state = bench.warm_cache_content(cfg, bench.warm_state(
            cfg, init_state(cfg, batch=b)))
        token = jnp.zeros((b,), jnp.int32)
        from spatten_tpu.ops import rope as rope_ops
        tables = rope_ops.rope_table(cfg.engine.cache_capacity,
                                     cfg.model.head_dim,
                                     cfg.model.rope_theta)

        @functools.partial(jax.jit, static_argnums=(2,))
        def window(params, carry, n):
            state, token = carry

            def body(carry, _):
                state, token = carry
                logits, state, _ = transformer.forward(
                    params, cfg, state, token[:, None], rope_tables=tables)
                token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (state, token), ()
            return jax.lax.scan(body, (state, token), None, length=n)[0]

        from spatten_tpu.models import transformer
        carry = window(params, (state, token), 8)
        jax.device_get(carry[1])
        with jax.profiler.trace("/tmp/spatten_trace"):
            carry = window(params, carry, 8)
            jax.device_get(carry[1])

    print("phase ladder (ms/step):")
    prev = None
    for name, ms in rows:
        delta = "" if prev is None else f"   (marginal {prev - ms:+.3f})"
        print(f"  {name:42s} {ms:8.3f}{delta}")
        prev = ms


if __name__ == "__main__":
    main()
