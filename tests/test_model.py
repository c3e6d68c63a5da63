"""End-to-end model tests on the tiny config (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import (
    EngineConfig,
    ModelConfig,
    PruningConfig,
    QuantConfig,
    SpAttenConfig,
)
from spatten_tpu.engine.state import init_state
from spatten_tpu.models import init_params, forward, num_params


# one compiled forward shared across tests (cfg is static → cache hits)
jit_forward = jax.jit(forward, static_argnums=(1,))


def tiny_cfg(**over) -> SpAttenConfig:
    base = dict(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(
            start_size=2, important_size=8, recent_size=16,
            enable_v_pruning=False, v_block_size=8,
        ),
        quant=QuantConfig(enabled=False, enable_requant=False),
        engine=EngineConfig(max_batch_size=2, cache_capacity=64,
                            prefill_chunk=16),
    )
    base.update(over)
    return SpAttenConfig(**base).validate()


def test_forward_shapes_and_finiteness():
    cfg = tiny_cfg()
    params = init_params(cfg.model, jax.random.PRNGKey(0))
    assert num_params(params) > 0
    state = init_state(cfg, batch=2)
    tokens = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    logits, state, aux = jit_forward(params, cfg, state, tokens)
    assert logits.shape == (2, 4, cfg.model.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(state.lengths[0]) == 4
    # importance accumulated over valid region only
    assert np.asarray(state.importance)[..., 4:].max() == 0


def test_chunked_prefill_matches_single_token_decode():
    """Causal consistency: feeding 5 tokens at once must give the same
    last-token logits as feeding them one at a time."""
    cfg = tiny_cfg()
    params = init_params(cfg.model, jax.random.PRNGKey(1))
    prompt = jnp.array([[3, 14, 15, 9, 2]], jnp.int32)

    state_a = init_state(cfg, batch=1)
    logits_a, state_a, _ = jit_forward(params, cfg, state_a, prompt)

    state_b = init_state(cfg, batch=1)
    for i in range(5):
        logits_b, state_b, _ = jit_forward(params, cfg, state_b, prompt[:, i:i+1])

    np.testing.assert_allclose(
        np.asarray(logits_a[:, -1]), np.asarray(logits_b[:, 0]),
        atol=6e-2, rtol=6e-2,   # bf16 matmuls at different shapes
    )
    # caches agree up to bf16/int8 rounding (different matmul shapes)
    from spatten_tpu.ops import quantize as qz
    ka = np.asarray(qz.dequantize_full(state_a.cache.k))[..., :5, :]
    kb = np.asarray(qz.dequantize_full(state_b.cache.k))[..., :5, :]
    np.testing.assert_allclose(ka, kb, atol=0.1)
    assert int(state_a.lengths[0]) == int(state_b.lengths[0]) == 5


def test_quantized_path_close_to_dense():
    cfg_q = tiny_cfg(quant=QuantConfig(enabled=True, enable_requant=True,
                                       requant_threshold=0.3))
    cfg_d = tiny_cfg()
    params = init_params(cfg_d.model, jax.random.PRNGKey(2))
    tokens = jnp.array([[7, 8, 9, 10, 11, 12]], jnp.int32)

    sq = init_state(cfg_q, batch=1)
    lq, sq, aux = jit_forward(params, cfg_q, sq, tokens)
    sd = init_state(cfg_d, batch=1)
    ld, sd, _ = jit_forward(params, cfg_d, sd, tokens)

    # int8/int4+requant attention shifts logits only slightly
    pq = jax.nn.softmax(lq[:, -1])
    pd = jax.nn.softmax(ld[:, -1])
    tv = 0.5 * np.abs(np.asarray(pq) - np.asarray(pd)).sum(-1).max()
    assert tv < 0.2, f"quantization moved next-token dist too much: {tv}"


def test_head_pruning_changes_output_only_for_pruned_heads():
    cfg = tiny_cfg(
        pruning=PruningConfig(
            start_size=2, important_size=8, recent_size=16,
            enable_v_pruning=False, v_block_size=8,
            enable_head_pruning=True, head_keep=0,
        )
    )
    params = init_params(cfg.model, jax.random.PRNGKey(3))
    tokens = jnp.array([[1, 2, 3]], jnp.int32)

    state = init_state(cfg, batch=1)
    l_all, *_ = jit_forward(params, cfg, state, tokens)

    state2 = init_state(cfg, batch=1)
    hm = state2.head_mask.at[:, 0].set(False)     # prune head 0 in all layers
    state2 = state2._replace(head_mask=hm)
    l_pruned, *_ = jit_forward(params, cfg, state2, tokens)

    assert not np.allclose(np.asarray(l_all), np.asarray(l_pruned))
    assert np.isfinite(np.asarray(l_pruned)).all()


def test_gpt2_family_forward():
    m = ModelConfig.gpt2_small()
    m = dataclasses.replace(m, num_layers=2, hidden_size=32, num_heads=4,
                            num_kv_heads=4, head_dim=8, intermediate_size=64,
                            vocab_size=128, max_position_embeddings=128)
    cfg = tiny_cfg(model=m)
    params = init_params(cfg.model, jax.random.PRNGKey(4))
    state = init_state(cfg, batch=1)
    logits, state, _ = jit_forward(params, cfg, state, jnp.array([[5, 6, 7]]))
    assert logits.shape == (1, 3, 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_forward_jits_and_is_deterministic():
    cfg = tiny_cfg()
    params = init_params(cfg.model, jax.random.PRNGKey(5))
    f = jax.jit(forward, static_argnums=(1,))
    state = init_state(cfg, batch=2)
    toks = jnp.array([[1, 2], [3, 4]], jnp.int32)
    l1, s1, _ = f(params, cfg, state, toks)
    l2, s2, _ = f(params, cfg, state, toks)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
