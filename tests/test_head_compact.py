"""Physical head compaction (permanent head pruning) vs the masked path.

The reference's pruned heads simply never issue requests (missing CSV
rows); `compact_head_params` additionally removes them from the decode
projections.  Dead heads' outputs are exact zeros either way, so the
compacted forward must reproduce the masked forward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
from spatten_tpu.engine import generate as gen
from spatten_tpu.engine.state import init_state
from spatten_tpu.models import transformer
from spatten_tpu.models.weight_quant import quantize_params



import pytest


@pytest.fixture(autouse=True, scope="module")
def _fresh_compiler_state():
    """The round-5 sandbox host's XLA:CPU backend segfaults inside
    compile when this module's programs build on ~100 prior in-process
    compilations (faulthandler: backend_compile_and_load; the same
    tests pass in any smaller process).  Clearing jax's caches resets
    the compiler state the crash accumulates."""
    import jax
    jax.clear_caches()
    yield


def _cfg(compact: bool) -> SpAttenConfig:
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(
            start_size=2, important_size=8, recent_size=8,
            v_keep_ratio=0.5, v_block_size=4,
            enable_head_pruning=True, head_keep=1,
            head_update_interval=0,     # permanent: mask fixed postprefill
        ),
        quant=QuantConfig(enabled=True, enable_requant=True,
                          requant_threshold=0.1),
        engine=EngineConfig(max_batch_size=2, cache_capacity=32,
                            prefill_chunk=8,
                            compact_pruned_heads=compact),
    ).validate()


def _mask(cfg):
    """A per-layer mask keeping one kv GROUP (different group per layer)."""
    m = cfg.model
    L, hq, hkv = m.num_layers, m.num_heads, m.num_kv_heads
    group = hq // hkv
    mask = np.zeros((L, hq), bool)
    for l in range(L):
        g = l % hkv
        mask[l, g * group:(g + 1) * group] = True
    return jnp.asarray(mask)


def test_compact_forward_matches_masked():
    cfg = _cfg(compact=False)
    params = quantize_params(
        transformer.init_params(cfg.model, jax.random.PRNGKey(0)))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 255)

    state = init_state(cfg, batch=2)
    _, state, _ = gen.prefill_chunk(params, cfg, state, toks[:, :8])
    state = state._replace(head_mask=_mask(cfg))

    token = toks[:, 8]
    logits_m, state_m, _ = transformer.forward(params, cfg, state,
                                               token[:, None])

    hc = transformer.compact_head_params(params, cfg, state.head_mask)
    # compact wq has head_keep * group heads' worth of columns
    kq = cfg.pruning.head_keep * (cfg.model.num_heads
                                  // cfg.model.num_kv_heads)
    assert hc["layers"]["wq"]["qw"].shape[-1] == kq * cfg.model.head_dim
    logits_c, state_c, _ = transformer.forward(params, cfg, state,
                                               token[:, None],
                                               head_compact=hc)
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_m),
                               atol=1e-5, rtol=1e-5)
    # alive heads' cache rows match; importance matches everywhere
    # (dead heads accumulate nothing on either path)
    np.testing.assert_allclose(np.asarray(state_c.importance),
                               np.asarray(state_m.importance),
                               atol=1e-5, rtol=1e-4)
    m = cfg.model
    kf_m = np.asarray(state_m.cache.k.full).reshape(
        m.num_layers, 2, -1, m.num_kv_heads, m.head_dim)
    kf_c = np.asarray(state_c.cache.k.full).reshape(
        m.num_layers, 2, -1, m.num_kv_heads, m.head_dim)
    for l in range(m.num_layers):
        g = l % m.num_kv_heads
        np.testing.assert_array_equal(kf_c[l, :, :, g], kf_m[l, :, :, g])


def test_generate_with_compaction_matches_masked():
    """End-to-end: generate() with compact_pruned_heads on equals the
    masked run token-for-token (the post-prefill mask is derived from
    importance identically in both runs)."""
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 255)
    outs = {}
    for compact in (False, True):
        cfg = _cfg(compact)
        params = quantize_params(
            transformer.init_params(cfg.model, jax.random.PRNGKey(0)))
        res = gen.generate(params, cfg, prompt, max_new_tokens=10)
        outs[compact] = np.asarray(res.tokens)
    np.testing.assert_array_equal(outs[True], outs[False])
