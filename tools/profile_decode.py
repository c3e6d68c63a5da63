"""Bisect the decode-step cost on real TPU.

Times, per configuration, a scanned window of decode steps (exactly like
bench.py) and reports ms/step for:

  * full spatten engine / full dense engine (the bench points)
  * non-attention skeleton (projections + MLP + lm_head only)
  * kernel-only (a scan of fused_decode_attention calls with bench shapes)
  * dense length sweep (cache length 512..3686) -> slope vs intercept

Run: python tools/profile_decode.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/spatten_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

log = bench.log


def time_window(fn, carry, steps):
    """fn(carry) -> carry; carry is donated, so rebind between calls."""
    t0 = time.perf_counter()
    carry = fn(carry)
    jax.device_get(jax.tree.leaves(carry)[-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry = fn(carry)
    jax.device_get(jax.tree.leaves(carry)[-1])
    dt = time.perf_counter() - t0
    return dt / steps * 1e3, compile_s


def measure_full(cfg, params, steps):
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.models import transformer

    b = cfg.engine.max_batch_size
    state = init_state(cfg, batch=b)
    state = bench.warm_state(cfg, state)
    token = jnp.zeros((b,), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(1,))
    def window(params, carry, n):
        def body(carry, _):
            state, token = carry
            logits, state, _ = transformer.forward(
                params, cfg, state, token[:, None])
            token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (state, token), ()
        carry, _ = jax.lax.scan(body, carry, None, length=n)
        return carry

    return time_window(lambda c: window(params, c, steps), (state, token),
                       steps=steps)


def measure_skeleton(cfg, params, steps):
    """Forward pass with the attention core replaced by zeros: measures
    projections + MLP + norms + lm_head (weight streaming cost)."""
    from spatten_tpu.models import transformer
    from spatten_tpu.models.weight_quant import matmul as _mm

    m = cfg.model
    b = cfg.engine.max_batch_size
    token = jnp.zeros((b,), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(1,))
    def window(params, token, n):
        def body(token, _):
            x = jnp.take(params["embed"]["qw"], token, axis=0
                         ).astype(jnp.bfloat16)[:, None]

            def layer_fn(x, lp):
                h = transformer._norm(x, lp["attn_norm_w"], None,
                                      m.layernorm_kind, m.norm_eps)
                qh = _mm(h, lp["wq"])
                kh = _mm(h, lp["wk"])
                vh = _mm(h, lp["wv"])
                o = (qh * 0 + kh.sum() * 0 + vh.sum() * 0)
                x = x + _mm(o, lp["wo"])
                h2 = transformer._norm(x, lp["mlp_norm_w"], None,
                                       m.layernorm_kind, m.norm_eps)
                x = x + transformer._mlp(h2, lp, m.activation)
                return x, ()
            x, _ = jax.lax.scan(layer_fn, x, params["layers"])
            logits = transformer.lm_head(params, cfg, x)
            token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return token, ()
        token, _ = jax.lax.scan(body, token, None, length=n)
        return token

    return time_window(lambda t: window(params, t, steps), token,
                       steps=steps)


def measure_kernel_only(cfg, steps, *, spatten: bool):
    """A scan of L fused kernel calls per step (bench shapes), nothing
    else: isolates the attention kernel cost."""
    from spatten_tpu.engine.kv_cache import init_stacked_cache
    from spatten_tpu.ops.fused_decode import fused_decode_attention
    from spatten_tpu.pruning import token_pruning

    m, p, q, e = cfg.model, cfg.pruning, cfg.quant, cfg.engine
    b, cap = e.max_batch_size, e.cache_capacity
    hq, hkv, dh = m.num_heads, m.num_kv_heads, m.head_dim
    L = m.num_layers
    key = jax.random.PRNGKey(0)

    stacked = init_stacked_cache(L, b, hkv, cap, dh)
    caches = (stacked.k, stacked.v)
    if spatten and p.enable_token_pruning:
        budgets = token_pruning.layer_budgets(p, L)
        per_layer = p.start_size + budgets + p.recent_size
    else:
        per_layer = jnp.full((L,), int(cap * 0.9), jnp.int32)
    lengths = jnp.broadcast_to(per_layer[:, None], (L, b)).astype(jnp.int32)
    imp = jnp.zeros((L, b, hkv, cap), jnp.float32)
    qv = jax.random.normal(key, (L, b, hq, 1, dh), jnp.float32)
    knew = jax.random.normal(key, (L, b, hkv, 1, dh), jnp.float32)

    v_keep = 0
    if spatten and p.enable_v_pruning:
        key_budget = p.cache_size if p.enable_token_pruning else cap
        v_keep = max(p.v_block_size, int(p.v_keep_ratio * key_budget))

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def window(carry, lengths, qv, n):
        def body(carry, _):
            caches, imp = carry

            def layer_fn(_, scanned):
                (kq, vq), len_l, imp_l, q_l, kn = scanned
                out, stats, k2, v2 = fused_decode_attention(
                    q_l, kq, vq, kn, kn, len_l + 1,
                    sm_scale=0.088,
                    requant_threshold=(q.requant_threshold if spatten
                                       and q.enable_requant else 0.0),
                    quant_enabled=spatten and q.enabled,
                    v_keep=v_keep, v_block_size=p.v_block_size,
                    importance_in=imp_l if spatten else None,
                    quantize_queries=q.quantize_queries,
                    track_importance=spatten,
                )
                return 0.0, ((k2, v2), stats.importance_delta
                             if spatten else imp_l, out.sum())
            _, (caches, imp, outs) = jax.lax.scan(
                layer_fn, 0.0, (caches, lengths, imp, qv, knew))
            return (caches, imp), outs.sum()
        carry, outs = jax.lax.scan(body, carry, None, length=n)
        return carry[0], carry[1], outs.sum()

    def run(carry):
        caches, imp = carry[0], carry[1]
        c2, i2, o = window((caches, imp), lengths, qv, steps)
        return (c2, i2, o)

    return time_window(run, (caches, imp, jnp.zeros(())), steps=steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--cache", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    cfg_sp = bench.build_cfg(True, args.cache, args.batch)
    cfg_dn = bench.build_cfg(False, args.cache, args.batch)

    from spatten_tpu.models import transformer
    from spatten_tpu.models.weight_quant import quantize_params
    params = transformer.init_params(cfg_sp.model, jax.random.PRNGKey(0))
    params = jax.device_put(jax.device_get(quantize_params(params)))

    results = {}

    ms, cs = measure_full(cfg_dn, params, args.steps)
    results["full_dense"] = ms
    log(f"full dense: {ms:.2f} ms/step (compile {cs:.1f}s)")

    ms, cs = measure_full(cfg_sp, params, args.steps)
    results["full_spatten"] = ms
    log(f"full spatten: {ms:.2f} ms/step (compile {cs:.1f}s)")

    ms, cs = measure_skeleton(cfg_dn, params, args.steps)
    results["skeleton"] = ms
    log(f"skeleton (no attention): {ms:.2f} ms/step (compile {cs:.1f}s)")

    ms, cs = measure_kernel_only(cfg_dn, args.steps, spatten=False)
    results["kernel_dense"] = ms
    log(f"kernel-only dense: {ms:.2f} ms/step (compile {cs:.1f}s)")

    ms, cs = measure_kernel_only(cfg_sp, args.steps, spatten=True)
    results["kernel_spatten"] = ms
    log(f"kernel-only spatten: {ms:.2f} ms/step (compile {cs:.1f}s)")

    if args.sweep:
        import dataclasses
        for warm in (512, 1024, 2048, 3686):
            cfg = dataclasses.replace(cfg_dn)
            orig = bench.warm_state

            def warm_state(cfg_, state, _w=warm):
                import jax.numpy as jnp
                b = state.lengths.shape[0]
                L = cfg_.model.num_layers
                return state._replace(
                    lengths=jnp.full((b,), _w, jnp.int32),
                    layer_lengths=jnp.full((L, b), _w, jnp.int32))
            bench.warm_state = warm_state
            try:
                ms, _ = measure_full(cfg, params, args.steps)
                log(f"dense len={warm}: {ms:.2f} ms/step")
                results[f"dense_len_{warm}"] = ms
            finally:
                bench.warm_state = orig

    print(results)


if __name__ == "__main__":
    main()
