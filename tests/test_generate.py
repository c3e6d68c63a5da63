"""Engine tests: prefill + decode + capacity-triggered cascade pruning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine.state import init_state, with_lengths
from spatten_tpu.models import transformer


def tiny_cfg(**overrides) -> SpAttenConfig:
    pruning = overrides.pop("pruning", PruningConfig(
        start_size=2, important_size=8, recent_size=8,
        v_keep_ratio=0.5, v_block_size=4,
    ))
    engine = overrides.pop("engine", EngineConfig(
        max_batch_size=2, cache_capacity=32, prefill_chunk=8,
    ))
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=pruning,
        quant=overrides.pop("quant", QuantConfig()),
        engine=engine,
    ).validate()


def test_generate_shapes_and_bounded_length():
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 20), 0, 255)
    res = gen.generate(params, cfg, prompt, max_new_tokens=30)
    assert res.tokens.shape == (2, 30)
    # pruning keeps every sequence within physical capacity
    assert int(res.state.lengths.max()) <= cfg.engine.cache_capacity
    # and the engine actually pruned (20 + 30 > 32 capacity)
    assert int(res.state.lengths.max()) < 50


def test_generate_without_pruning_matches_with_headroom():
    """If the cache never fills, enabling token pruning must not change
    anything (the trigger can't fire)."""
    base = tiny_cfg()
    cfg_on = dataclasses.replace(
        base, engine=dataclasses.replace(base.engine, cache_capacity=128),
        pruning=dataclasses.replace(base.pruning, important_size=32,
                                    recent_size=32))
    cfg_off = dataclasses.replace(
        cfg_on,
        pruning=dataclasses.replace(cfg_on.pruning,
                                    enable_token_pruning=False))
    cfg_on.validate(), cfg_off.validate()

    params = transformer.init_params(cfg_on.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, 255)
    r_on = gen.generate(params, cfg_on, prompt, max_new_tokens=10)
    r_off = gen.generate(params, cfg_off, prompt, max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(r_on.tokens),
                                  np.asarray(r_off.tokens))


def test_prune_preserves_start_and_recent_tokens():
    """After a forced prune, the kept cache must contain the sink tokens
    (slots 0..start) and the most recent `recent` tokens, in order."""
    # "read" rope mode: the prune must not touch surviving K values
    # (cached mode re-rotates survivors — exactness covered by
    # test_rope_cached_mode.py)
    from spatten_tpu.config import EngineConfig
    cfg = tiny_cfg(engine=EngineConfig(
        max_batch_size=2, cache_capacity=32, prefill_chunk=8,
        rope_mode="read"))
    p = cfg.pruning
    b, hkv, cap, dh = 1, cfg.model.num_kv_heads, cfg.engine.cache_capacity, \
        cfg.model.head_dim
    state = init_state(cfg, batch=b)

    # fill the cache with recognizable K rows: row value = slot index
    L = cfg.model.num_layers
    length = cap  # full
    marker = jnp.arange(cap, dtype=jnp.float32)[None, None, :, None]
    k = jnp.broadcast_to(marker, (b, hkv, cap, dh))
    from spatten_tpu.engine import kv_cache as kvc
    from spatten_tpu.ops import quantize as qz
    layer = kvc.LayerKVCache(k=qz.quantize(k), v=qz.quantize(k))
    cache = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), layer)
    importance = jax.random.uniform(
        jax.random.PRNGKey(3), (L, b, hkv, cap)) + 1.0
    state = with_lengths(
        state._replace(cache=cache, importance=importance),
        jnp.full((b,), length, jnp.int32))

    new_state, pruned = gen.maybe_prune(cfg, state, num_coming=1)
    assert bool(pruned[0])
    assert int(new_state.lengths[0]) == p.cache_size

    kept_k = np.asarray(qz.dequantize_full(new_state.cache.k))[0, 0, 0]
    slot_vals = kept_k.mean(axis=-1).round().astype(int)
    # sink tokens first
    np.testing.assert_array_equal(slot_vals[: p.start_size],
                                  np.arange(p.start_size))
    # recent window last (slots cap-recent .. cap)
    np.testing.assert_array_equal(
        slot_vals[p.cache_size - p.recent_size: p.cache_size],
        np.arange(cap - p.recent_size, cap),
    )
    # middle region ascending (chronological) and within bounds
    mid = slot_vals[p.start_size: p.start_size + p.important_size]
    assert (np.diff(mid) >= 0).all()
    assert mid.min() >= p.start_size
    assert mid.max() < cap - p.recent_size


def test_importance_drives_selection():
    """Tokens given huge importance must survive the prune."""
    from spatten_tpu.config import EngineConfig
    cfg = tiny_cfg(engine=EngineConfig(      # marker values: no re-rotation
        max_batch_size=2, cache_capacity=32, prefill_chunk=8,
        rope_mode="read"))
    p, cap = cfg.pruning, cfg.engine.cache_capacity
    b, hkv = 1, cfg.model.num_kv_heads
    L = cfg.model.num_layers
    state = init_state(cfg, batch=b)

    importance = jnp.zeros((L, b, hkv, cap))
    vip = [5, 9, 13]  # middle-region slots made maximally important
    importance = importance.at[..., jnp.array(vip)].set(100.0)
    marker = jnp.arange(cap, dtype=jnp.float32)[None, None, :, None]
    k = jnp.broadcast_to(marker, (b, hkv, cap, cfg.model.head_dim))
    from spatten_tpu.engine import kv_cache as kvc
    from spatten_tpu.ops import quantize as qz
    layer = kvc.LayerKVCache(k=qz.quantize(k), v=qz.quantize(k))
    cache = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), layer)
    state = with_lengths(
        state._replace(cache=cache, importance=importance),
        jnp.full((b,), cap, jnp.int32))

    new_state, _ = gen.maybe_prune(cfg, state, num_coming=1)
    kept_k = np.asarray(qz.dequantize_full(new_state.cache.k))[0, 0, 0]
    slot_vals = set(kept_k.mean(axis=-1).round().astype(int)
                    [: cfg.pruning.cache_size].tolist())
    for s in vip:
        assert s in slot_vals, f"vip slot {s} was pruned"


def test_eos_freezes_sequence():
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 5), 0, 255)
    res = gen.generate(params, cfg, prompt, max_new_tokens=8)
    # re-run with the first generated token declared EOS: everything after
    # the first emission of it must be EOS too
    eos = int(res.tokens[0, 0])
    res2 = gen.generate(params, cfg, prompt, max_new_tokens=8,
                        eos_token_id=eos)
    toks = np.asarray(res2.tokens[0])
    first = np.argmax(toks == eos)
    assert (toks[first:] == eos).all()


def test_chunked_prefill_importance_matches_stepping():
    """Chunked prefill (s>1, streaming-blocks path) must accumulate the
    same importance as feeding the same tokens one at a time (s=1) —
    the cascade signal can't silently drop on the prefill path."""
    # quant off: the requant decision is per-chunk on the prefill path but
    # per-step when stepping — a real (documented) granularity difference
    # that would make probs differ; importance parity is what's under test.
    # prefill_v_mask=True: stepping (s=1) V-masks every token, so exact
    # parity needs the prompt chunks to mask too (the serving default
    # False prices prompts dense, per bert.cpp — see the flag's test)
    cfg = tiny_cfg(
        engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                            prefill_chunk=8, prefill_v_mask=True),
        quant=QuantConfig(enabled=False, enable_requant=False))
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(7), (1, 16), 0, 255)

    state_c = init_state(cfg, batch=1)
    _, state_c, _ = gen.prefill_chunk(params, cfg, state_c, toks[:, :8])
    _, state_c, _ = gen.prefill_chunk(params, cfg, state_c, toks[:, 8:])

    state_s = init_state(cfg, batch=1)
    for i in range(16):
        _, state_s, _ = gen.prefill_chunk(
            params, cfg, state_s, toks[:, i:i + 1])

    imp_c = np.asarray(state_c.importance)
    imp_s = np.asarray(state_s.importance)
    assert np.abs(imp_c).max() > 0, "prefill importance is all-zero"
    np.testing.assert_allclose(imp_c, imp_s, rtol=2e-4, atol=2e-5)


def test_prefill_v_mask_flag_leaves_cascade_state_invariant():
    """prefill_v_mask=False (default, dense-prompt pricing per the
    reference's bert.cpp encoder regime) must leave the cascade state a
    layer derives from its own inputs — cache planes, importance,
    lengths — equal (to float reassociation) vs prefill_v_mask=True: V masking feeds only
    the P*V OUTPUT, never the cascade signal (importance is pre-mask,
    attention_ref.py:214).  A 1-layer model isolates that contract
    (with more layers the masked output legitimately shifts later
    layers' activations, exactly as in the reference, where prompts are
    processed dense and only decode steps gate V fetches)."""
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, 255)

    def run(v_mask):
        cfg = tiny_cfg(engine=EngineConfig(
            max_batch_size=1, cache_capacity=32, prefill_chunk=8,
            prefill_v_mask=v_mask))
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, num_layers=1)
        ).validate()
        params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
        state = init_state(cfg, batch=1)
        logits, state, _ = gen.prefill(params, cfg, state, toks)
        return logits, state

    lg_off, st_off = run(False)
    lg_on, st_on = run(True)
    # identical up to float reassociation: dropping the mass bookkeeping
    # changes XLA's reduction fusions, not the math
    np.testing.assert_allclose(np.asarray(st_off.importance),
                               np.asarray(st_on.importance),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st_off.layer_lengths),
                                  np.asarray(st_on.layer_lengths))
    for cache in (st_off.cache.k, st_on.cache.k):
        assert cache.full is not None
    np.testing.assert_array_equal(np.asarray(st_off.cache.k.full),
                                  np.asarray(st_on.cache.k.full))
    np.testing.assert_array_equal(np.asarray(st_off.cache.v.full),
                                  np.asarray(st_on.cache.v.full))
    # masking IS live on the True path: some intra-prompt prob mass is
    # dropped, so final-token logits must differ measurably
    assert not np.allclose(np.asarray(lg_off), np.asarray(lg_on),
                           atol=1e-6)
