"""Pipeline-parallel decode on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
import spatten_tpu.engine.generate as gen
from spatten_tpu.models import transformer
from spatten_tpu.parallel.pipeline import PipelineEngine


def cfg_pp():
    return SpAttenConfig(
        model=ModelConfig.tiny(),            # 2 layers -> 2 stages
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4),
        quant=QuantConfig(requant_threshold=0.1),
        engine=EngineConfig(max_batch_size=2, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:2])
    return Mesh(devs, ("pipe",))


def test_pipeline_matches_single_device(mesh):
    cfg = cfg_pp()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 255)

    ref = gen.generate(params, cfg, prompt, max_new_tokens=6)

    eng = PipelineEngine(cfg, mesh)
    sharded = eng.shard_params(params)
    toks = eng.generate(sharded, prompt, max_new_tokens=6)

    got, want = np.asarray(jax.device_get(toks)), np.asarray(ref.tokens)
    np.testing.assert_array_equal(got[:, :3], want[:, :3])
    assert (got == want).mean() >= 0.85, f"{got}\n{want}"


def test_pipeline_requant_and_lengths(mesh):
    cfg = cfg_pp()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(2))
    eng = PipelineEngine(cfg, mesh)
    sharded = eng.shard_params(params)
    state = eng.init_sharded_state(2)
    tokens = jnp.zeros((2, 8), jnp.int32)
    logits, state = eng.step_fn(8)(sharded, state, tokens)
    assert logits.shape == (2, cfg.model.vocab_size)
    logits, state = eng.step_fn(1)(sharded, state,
                                   jnp.zeros((2, 1), jnp.int32))
    assert int(jax.device_get(state.lengths)[0]) == 9
    assert np.isfinite(np.asarray(jax.device_get(logits))).all()


def test_pipeline_prunes_within_capacity(mesh):
    cfg = cfg_pp()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(3))
    eng = PipelineEngine(cfg, mesh)
    sharded = eng.shard_params(params)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, 255)
    toks = eng.generate(sharded, prompt, max_new_tokens=25)
    assert toks.shape == (2, 25)
