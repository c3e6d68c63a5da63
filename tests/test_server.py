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


def test_decode_progresses_during_long_admission():
    """Overlapped continuous batching: while a long prompt prefills
    chunk-by-chunk, already-running requests keep decoding every tick."""
    cfg = cfg_batch(2)   # prefill_chunk=8
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(2))
    srv = SpAttenServer(params, cfg)

    # request A: short prompt, starts decoding immediately
    srv.submit(np.arange(4) % 255, max_new_tokens=10)
    srv.step()                      # A admitted (1 chunk) + first decode
    a = next(iter(srv.active.values()))
    tokens_before = len(a.generated)

    # request B: long prompt = 3 chunks of prefill
    srv.submit(np.arange(20) % 255, max_new_tokens=2)
    progressed = []
    while srv.admitting or len(progressed) < 3:
        srv.step()
        progressed.append(len(a.generated))
        if len(progressed) > 20:
            break
    # A decoded on every tick of B's admission (no stall)
    assert progressed[0] == tokens_before + 1
    assert progressed[1] == tokens_before + 2
    assert progressed[2] == tokens_before + 3
    done = srv.run_to_completion()
    assert {len(r.generated) for r in done} == {10, 2}


def test_admission_parity_with_blocking_prefill():
    """Chunk-interleaved admission produces the same tokens as the plain
    generate path (the scatter happens only when prefill completes)."""
    cfg = cfg_batch(2)
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(3))
    long_prompt = (np.arange(19) * 7) % 255

    ref = gen.generate(params, cfg_batch(1),
                       jnp.asarray(long_prompt[None]), max_new_tokens=5)
    ref_tokens = np.asarray(ref.tokens)[0]

    srv = SpAttenServer(params, cfg)
    # keep slot 0 busy so the admission truly interleaves with decode
    srv.submit(np.arange(3) % 255, max_new_tokens=12)
    srv.step()
    rid = srv.submit(long_prompt, max_new_tokens=5)
    done = srv.run_to_completion()
    by_id = {r.request_id: r for r in done}
    np.testing.assert_array_equal(np.array(by_id[rid].generated),
                                  ref_tokens)
