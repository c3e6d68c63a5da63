"""Cached-rotated-K cache mode vs the read-time-rotation reference mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine.state import init_state
from spatten_tpu.models import transformer
from spatten_tpu.ops import quantize as qz, rope as rope_ops


def cfgs():
    base = SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4),
        quant=QuantConfig(requant_threshold=0.1),
        engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()
    cached = dataclasses.replace(
        base, engine=dataclasses.replace(base.engine, rope_mode="cached"))
    return base, cached


def test_rotate_rows_by_delta_identity_and_shift():
    cos, sin = rope_ops.rope_table(64, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    q = qz.quantize(x)
    # delta 0: only requantization noise
    out = qz.rotate_rows_by_delta(q, jnp.zeros((2, 32), jnp.int32), cos,
                                  sin)
    np.testing.assert_allclose(np.asarray(qz.dequantize_full(out)),
                               np.asarray(qz.dequantize_full(q)),
                               atol=0.05)
    # rotating by -p undoes a rotation at p
    p = 7
    x_rot = rope_ops.apply_rope(x, cos, sin, jnp.full((32,), p))
    q_rot = qz.quantize(x_rot)
    back = qz.rotate_rows_by_delta(
        q_rot, jnp.full((2, 32), -p, jnp.int32), cos, sin)
    np.testing.assert_allclose(np.asarray(qz.dequantize_full(back)),
                               np.asarray(x), atol=0.08)


def test_modes_agree_before_any_prune():
    """With the 4-bit plane disabled, the two modes differ only in where
    the int8 quantization happens (rotate-then-quantize vs
    quantize-then-rotate) — logits must agree to int8 noise."""
    base, cached = cfgs()
    noq = QuantConfig(enabled=False, enable_requant=False)
    base = dataclasses.replace(base, quant=noq)
    cached = dataclasses.replace(cached, quant=noq)
    params = transformer.init_params(base.model, jax.random.PRNGKey(0))
    tokens = jnp.array([[3, 7, 11, 2, 9, 4]], jnp.int32)

    sa = init_state(base, batch=1)
    la, sa, _ = jax.jit(transformer.forward, static_argnums=1)(
        params, base, sa, tokens)
    sb = init_state(cached, batch=1)
    lb, sb, _ = jax.jit(transformer.forward, static_argnums=1)(
        params, cached, sb, tokens)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=0.1)


def test_prune_rerotation_is_exact():
    """After a prune in cached mode, each surviving K row must equal the
    original key rotated at its NEW slot (up to requantization noise) —
    the R(p') = R(Δ)R(p) identity applied through the quantized cache."""
    base, cached = cfgs()
    cap = cached.engine.cache_capacity
    m = cached.model
    L, b, hkv, dh = m.num_layers, 1, m.num_kv_heads, m.head_dim

    cos, sin = rope_ops.rope_table(cap, dh, m.rope_theta)
    k_raw = jax.random.normal(jax.random.PRNGKey(3), (b, hkv, cap, dh))
    k_rot = rope_ops.apply_rope_at_cache_positions(k_raw, cos, sin)

    from spatten_tpu.engine import kv_cache as kvc
    layer = kvc.LayerKVCache(k=qz.quantize(k_rot), v=qz.quantize(k_raw))
    cache = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), layer)
    importance = jax.random.uniform(jax.random.PRNGKey(4),
                                    (L, b, hkv, cap)) + 1.0
    from spatten_tpu.engine.state import with_lengths
    state = with_lengths(
        init_state(cached, batch=b)._replace(
            cache=cache, importance=importance),
        jnp.full((b,), cap, jnp.int32))

    new_state, pruned = gen.maybe_prune(cached, state, num_coming=1)
    assert bool(pruned[0])

    from spatten_tpu.pruning import token_pruning
    p = cached.pruning
    lb_ = jnp.broadcast_to(state.lengths[None, :, None],
                           importance.shape[:-1])
    keep_idx = token_pruning.select_keep_indices(
        importance, lb_, p.start_size, p.important_size, p.recent_size, 0)

    keep_total = p.cache_size
    got = np.asarray(qz.dequantize_full(new_state.cache.k))
    for layer_i in (0, L - 1):
        idx = np.asarray(keep_idx)[layer_i, 0, 0]      # [keep_total]
        # expected: original raw keys at old slots, rotated at new slots
        k_sel = np.asarray(k_raw)[0, 0][idx]           # [keep, dh]
        expect = np.asarray(rope_ops.apply_rope(
            jnp.asarray(k_sel), cos, sin,
            jnp.arange(keep_total)))
        np.testing.assert_allclose(got[layer_i, 0, 0, :keep_total],
                                   expect, atol=0.15)
