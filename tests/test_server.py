"""Continuous-batching server tests: slot reuse, parity with generate."""

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine.server import SpAttenServer
from spatten_tpu.models import transformer


def cfg_batch(b):
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4),
        quant=QuantConfig(requant_threshold=0.1),
        engine=EngineConfig(max_batch_size=b, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()


def test_server_matches_generate():
    cfg = cfg_batch(2)
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompts = [np.array([3, 14, 15, 9, 2], np.int32),
               np.array([27, 18, 28, 18], np.int32),
               np.array([31, 4, 1, 5, 9, 2], np.int32)]

    # individual references (batch 1, no interference)
    refs = []
    for p in prompts:
        c1 = cfg_batch(1)
        r = gen.generate(params, c1, jnp.asarray(p[None]), max_new_tokens=6)
        refs.append(np.asarray(r.tokens)[0])

    # server: 3 requests through 2 slots (forces reuse)
    srv = SpAttenServer(params, cfg)
    ids = [srv.submit(p, max_new_tokens=6) for p in prompts]
    done = srv.run_to_completion()
    assert len(done) == 3
    by_id = {r.request_id: r for r in done}
    for rid, ref in zip(ids, refs):
        got = np.array(by_id[rid].generated)
        np.testing.assert_array_equal(got, ref)


def test_server_slot_recycling_and_queueing():
    cfg = cfg_batch(2)
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(1))
    srv = SpAttenServer(params, cfg)
    for i in range(5):
        srv.submit(np.arange(3 + i) % 255, max_new_tokens=3 + i)
    done = srv.run_to_completion()
    assert len(done) == 5
    for r in done:
        assert len(r.generated) == r.max_new_tokens
    # all slots free at the end
    assert sorted(srv.free_slots) == [0, 1]
    assert not srv.active and not srv.pending


def test_server_eos_release():
    cfg = cfg_batch(1)
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(2))
    # discover the 2nd generated token, then declare it EOS
    probe = SpAttenServer(params, cfg)
    probe.submit(np.array([1, 2, 3], np.int32), max_new_tokens=5)
    full = probe.run_to_completion()[0].generated
    eos = full[1]
    srv = SpAttenServer(params, cfg, eos_token_id=eos)
    srv.submit(np.array([1, 2, 3], np.int32), max_new_tokens=5)
    done = srv.run_to_completion()[0]
    assert done.generated == full[:2]
