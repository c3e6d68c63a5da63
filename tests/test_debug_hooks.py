"""Sanitizer hooks (utils/debug.py): checkify float checks over a real
decode step, NaN trapping, and the SPMD replicated-consistency assert."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
from spatten_tpu.engine.state import init_state
from spatten_tpu.models import transformer
from spatten_tpu.utils import debug as dbg


def tiny_cfg():
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8,
                              recent_size=16, v_block_size=8),
        quant=QuantConfig(enabled=True, enable_requant=True,
                          requant_threshold=0.2),
        engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                            prefill_chunk=6),
    ).validate()


def test_checkify_clean_step_passes():
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    state = init_state(cfg, batch=1)
    tokens = jnp.arange(6, dtype=jnp.int32)[None] % 256

    def step(params, state, tokens):
        logits, state, _ = transformer.forward(params, cfg, state, tokens)
        return logits, state

    logits, state2 = dbg.checkify_step(jax.jit(step), params, state,
                                       tokens)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(state2.lengths[0]) == 6


def test_checkify_traps_nan_weights():
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    # poison one projection: the NaN must be reported by checkify, not
    # silently propagate into the logits
    params = jax.tree.map(lambda x: x, params)
    leaves, treedef = jax.tree.flatten(params)
    leaves[0] = leaves[0].at[...].set(jnp.nan)
    params = jax.tree.unflatten(treedef, leaves)
    state = init_state(cfg, batch=1)
    tokens = jnp.arange(4, dtype=jnp.int32)[None] % 256

    def step(params, state, tokens):
        logits, state, _ = transformer.forward(params, cfg, state, tokens)
        return logits

    with pytest.raises(Exception, match="nan"):
        dbg.checkify_step(jax.jit(step), params, state, tokens)


def test_debug_env_flag_wires_generate(monkeypatch):
    from spatten_tpu.engine.generate import generate
    monkeypatch.setenv("SPATTEN_DEBUG", "1")
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jnp.arange(6, dtype=jnp.int32)[None] % 256
    res = generate(params, cfg, prompt, max_new_tokens=4)
    assert res.tokens.shape == (1, 4)


def test_replicated_mismatch_detects_divergence():
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    n = jax.device_count()
    mesh = Mesh(np.asarray(jax.devices()).reshape(n), ("all",))
    rep = jax.device_put(jnp.arange(8.0),
                         NamedSharding(mesh, P()))
    assert dbg.replicated_mismatch(rep) == 0.0
    # a genuinely sharded array is not a valid input
    shd = jax.device_put(jnp.arange(float(8 * n)),
                         NamedSharding(mesh, P("all")))
    with pytest.raises(ValueError, match="sharded"):
        dbg.replicated_mismatch(shd)
