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
    from bench import build_cfg, BENCH_LAYERS
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.models import transformer
    from spatten_tpu.ops import quantize as qz
    from spatten_tpu.ops.decode_attention import decode_attention
    from spatten_tpu.ops import rope as rope_ops

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

    key = jax.random.PRNGKey(1)
    # PER-LAYER caches: ablation scans must not reuse one layer's arrays
    # (XLA hoists loop-invariant work — e.g. the dense dequant — out of the
    # scan, faking an 8x traffic reduction)
    L = BENCH_LAYERS
    kq = qz.quantize(jax.random.normal(key, (L, b, hkv, cap, dh),
                                       jnp.float32))
    vq = qz.quantize(jax.random.normal(key, (L, b, hkv, cap, dh),
                                       jnp.float32))
    q = jax.random.normal(key, (b, hkv, 1, dh))
    cos, sin = rope_ops.rope_table(cap, dh, m.rope_theta)
    lengths_sp = jnp.full((b,), cfg_sp.pruning.cache_size, jnp.int32)
    lengths_dn = jnp.full((b,), int(cap * 0.9), jnp.int32)
    imp = jnp.zeros((b, hkv, cap), jnp.float32)
    sm = 1.0 / dh ** 0.5
    v_keep = max(cfg_sp.pruning.v_block_size,
                 int(cfg_sp.pruning.v_keep_ratio * cap))

    # ---- full steps (the bench numbers) --------------------------------
    def mk_state(cfg, lengths):
        st = init_state(cfg, batch=b)
        # own copy: the state is donated, must not share the ablation arrays
        from spatten_tpu.engine.state import with_lengths
        return with_lengths(st, lengths + 0)

    def step(cfg):
        def f(params, state, token):
            logits, state, _ = transformer.forward(
                params, cfg, state, token[:, None])
            return state, jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return f

    tok = jnp.zeros((b,), jnp.int32)
    t_sp = timeit("FULL spatten step (8L)", step(cfg_sp), params,
                  mk_state(cfg_sp, lengths_sp), tok, donate=(1,))
    t_dn = timeit("FULL dense step (8L, jnp attn)", step(cfg_dn), params,
                  mk_state(cfg_dn, lengths_dn), tok, donate=(1,))

    # ---- attention in isolation (x8 to mimic depth) --------------------
    def sp_variant(requant, vk):
        def f(q, kq, vq, lengths, imp):
            def body(imp, layer_kv):
                lkq, lvq = layer_kv
                out, st = decode_attention(
                    q.reshape(b, hkv, 1, dh), lkq, lvq, cos, sin, lengths,
                    sm_scale=sm, requant_threshold=requant,
                    quant_enabled=True, v_keep=vk,
                    v_block_size=cfg_sp.pruning.v_block_size,
                    use_rope=False, quantize_queries=True,
                    importance_in=imp, probs_dtype=jnp.bfloat16)
                return st.importance_delta, out
            imp, outs = jax.lax.scan(body, imp, (kq, vq))
            return imp, outs
        return f

    def attn_dense_pallas(q, kq, vq, lengths):
        def body(c, layer_kv):
            lkq, lvq = layer_kv
            out, _ = decode_attention(
                q.reshape(b, hkv, 1, dh), lkq, lvq, cos, sin, lengths,
                sm_scale=sm, requant_threshold=0.0, quant_enabled=False,
                v_keep=0, use_rope=False)
            return c, out
        _, outs = jax.lax.scan(body, 0, (kq, vq))
        return outs

    def attn_dense_jnp(q, kq, vq, lengths):
        from spatten_tpu.ops.attention_ref import spatten_attention_reference
        pos = lengths[:, None] - 1
        def body(c, layer_kv):
            lkq, lvq = layer_kv
            out, _ = spatten_attention_reference(
                q.reshape(b, hkv, 1, dh), lkq, lvq, cos, sin, lengths, pos,
                sm_scale=sm, quant_enabled=False, v_keep=0, use_rope=False)
            return c, out
        _, outs = jax.lax.scan(body, 0, (kq, vq))
        return outs

    timeit("attention x8: spatten kernel (quant+vprune)",
           sp_variant(0.05, v_keep), q, kq, vq, lengths_sp, imp)
    timeit("attention x8: pallas dense (length-gated)", attn_dense_pallas,
           q, kq, vq, lengths_dn)
    timeit("attention x8: jnp dense reference", attn_dense_jnp,
           q, kq, vq, lengths_dn)
    timeit("attention x8: spatten, no V-prune",
           sp_variant(0.05, 0), q, kq, vq, lengths_sp, imp)
    timeit("attention x8: spatten, no requant",
           sp_variant(0.0, v_keep), q, kq, vq, lengths_sp, imp)

    # ---- cache append (the scatter into [L,B,Hkv,C,D] planes) ----------
    from spatten_tpu.engine import kv_cache as kvc
    cache0 = jax.tree.map(lambda a: a, kvc.LayerKVCache(k=kq, v=vq))
    knew = jax.random.normal(key, (b, hkv, 1, dh), jnp.float32)

    def append_only(cache, knew, lengths):
        def body(c, layer_cache):
            lc = kvc.append_tokens(layer_cache, knew, knew, lengths)
            return c, lc
        _, nc = jax.lax.scan(body, 0, cache)
        return nc

    timeit("append_tokens x8 (cache scatter)", append_only,
           cache0, knew, lengths_sp)

    # ---- lm_head alone -------------------------------------------------
    def lm_only(params, x):
        return jnp.argmax(x @ params["embed"].T, -1)

    xlm = jnp.zeros((b, m.hidden_size), jnp.bfloat16)
    timeit("lm_head alone (tied embed, vocab 32000)", lm_only, params, xlm)

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
