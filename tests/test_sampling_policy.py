"""Sampling and runtime head-pruning policy tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, SpAttenConfig,
)
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine.policy import (
    head_importance_from_state, update_head_mask,
)
from spatten_tpu.engine.sampling import SamplingParams, sample_token
from spatten_tpu.engine.state import init_state
from spatten_tpu.models import transformer


def test_greedy_is_argmax():
    logits = jnp.array([[1.0, 3.0, 2.0], [0.5, 0.1, 0.9]])
    got = sample_token(logits, jax.random.PRNGKey(0), SamplingParams())
    np.testing.assert_array_equal(np.asarray(got), [1, 2])


def test_topk_restricts_support():
    logits = jnp.array([[10.0, 9.0, -5.0, -6.0]])
    p = SamplingParams(temperature=1.0, top_k=2)
    for s in range(20):
        t = sample_token(logits, jax.random.PRNGKey(s), p)
        assert int(t[0]) in (0, 1)


def test_topp_restricts_support():
    # ~[0.87, 0.12, ...]: top_p=0.8 keeps only token 0
    logits = jnp.array([[5.0, 3.0, -2.0, -2.0]])
    p = SamplingParams(temperature=1.0, top_p=0.8)
    for s in range(20):
        t = sample_token(logits, jax.random.PRNGKey(s), p)
        assert int(t[0]) == 0


def test_temperature_sampling_varies():
    logits = jnp.zeros((1, 16))
    p = SamplingParams(temperature=1.0)
    draws = {int(sample_token(logits, jax.random.PRNGKey(s), p)[0])
             for s in range(30)}
    assert len(draws) > 3


def test_update_head_mask_keeps_topk_groups():
    cfg = SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_block_size=4, enable_head_pruning=True,
                              head_keep=1),
        engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()
    state = init_state(cfg, batch=1)
    # layer 0: group 1 more important; layer 1: group 0
    imp = jnp.zeros((2, 1, 2, 32))
    imp = imp.at[0, :, 1, :10].set(5.0)
    imp = imp.at[1, :, 0, :10].set(5.0)
    from spatten_tpu.engine.state import with_lengths
    state = with_lengths(state._replace(importance=imp),
                         jnp.array([20], jnp.int32))
    hi = head_importance_from_state(state)
    assert hi.shape == (2, 2)
    new_state = update_head_mask(cfg, state)
    hm = np.asarray(new_state.head_mask)          # [L, Hq=4], group=2
    np.testing.assert_array_equal(hm[0], [False, False, True, True])
    np.testing.assert_array_equal(hm[1], [True, True, False, False])


def test_generate_with_head_pruning_and_sampling():
    cfg = SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4,
                              enable_head_pruning=True, head_keep=1),
        engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 255)
    res = gen.generate(params, cfg, prompt, max_new_tokens=6,
                       sampling=SamplingParams(temperature=0.8, top_k=40),
                       rng=jax.random.PRNGKey(7))
    assert res.tokens.shape == (1, 6)
    hm = np.asarray(res.state.head_mask)
    # exactly 1 of 2 kv groups (2 of 4 q heads) alive per layer
    assert (hm.sum(axis=1) == 2).all()


def test_on_the_fly_head_mask_updates_during_decode():
    """head_update_interval > 0 re-derives the mask inside the decode scan
    (on-the-fly head pruning); the final mask must reflect decode-time
    importance, keep exactly head_keep groups, and the engine must stay
    numerically healthy with heads dying mid-decode."""
    cfg = SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4,
                              enable_head_pruning=True, head_keep=1,
                              head_update_interval=3),
        engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 255)
    res = gen.generate(params, cfg, prompt, max_new_tokens=10)
    hm = np.asarray(res.state.head_mask)
    assert (hm.sum(axis=1) == 2).all()        # 1 of 2 kv groups per layer

    # the decode-scan update must match a host-side re-derivation from the
    # final importance state
    from spatten_tpu.engine.policy import update_head_mask
    rederived = np.asarray(
        jax.jit(update_head_mask, static_argnums=0)(cfg, res.state)
        .head_mask)
    np.testing.assert_array_equal(hm, rederived)
