"""Edge cases: unequal per-sequence lengths, GQA decode through the
engine, and pruning triggers firing for only part of the batch."""

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


def cfg_small():
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4),
        quant=QuantConfig(requant_threshold=0.15),
        engine=EngineConfig(max_batch_size=3, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()


def test_partial_batch_prune_trigger():
    """Only sequences over capacity get pruned; others are untouched."""
    cfg = cfg_small()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    state = init_state(cfg, batch=3)

    # seed unequal lengths by running real prefills of different sizes
    toks = jax.random.randint(jax.random.PRNGKey(1), (3, 30), 0, 255)
    _, state, _ = transformer.forward(params, cfg, state, toks[:, :8])
    # advance sequences 0 and 1 further via masked... simplest: set
    # lengths directly after a real forward (caches are warm to length 8)
    from spatten_tpu.engine.state import with_lengths
    state = with_lengths(state, jnp.array([31, 20, 8], jnp.int32))

    new_state, pruned = gen.maybe_prune(cfg, state, num_coming=2)
    pr = np.asarray(pruned)
    assert pr.tolist() == [True, False, False]
    lengths = np.asarray(new_state.lengths)
    assert lengths[0] == cfg.pruning.cache_size
    assert lengths[1] == 20 and lengths[2] == 8
    # untouched sequences keep their cache bytes exactly
    np.testing.assert_array_equal(
        np.asarray(new_state.cache.k.full)[:, 1:],
        np.asarray(state.cache.k.full)[:, 1:])


def test_gqa_generation_through_engine():
    m = dataclasses.replace(ModelConfig.tiny(), num_heads=8, num_kv_heads=2,
                            hidden_size=64)
    cfg = dataclasses.replace(cfg_small(), model=m).validate()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(2))
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 255)
    res = gen.generate(params, cfg, prompt, max_new_tokens=25)
    assert res.tokens.shape == (2, 25)
    assert int(np.asarray(res.state.lengths).max()) <= 32
    assert np.isfinite(
        np.asarray(jax.device_get(res.state.importance))).all()


def test_single_token_prompt():
    cfg = cfg_small()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(4))
    prompt = jnp.array([[7], [11], [13]], jnp.int32)
    res = gen.generate(params, cfg, prompt, max_new_tokens=4)
    assert res.tokens.shape == (3, 4)
