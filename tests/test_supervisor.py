"""Composed failure recovery (SURVEY §5): health check fails mid-decode,
the supervisor restores the latest snapshot and resumes — the emitted
token stream must equal the uninterrupted run's exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
from spatten_tpu.engine.supervisor import generate_supervised
from spatten_tpu.models import transformer


def tiny_cfg():
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=24,
                              recent_size=16, v_block_size=8),
        quant=QuantConfig(enabled=True, enable_requant=True,
                          requant_threshold=0.2),
        engine=EngineConfig(max_batch_size=2, cache_capacity=64,
                            prefill_chunk=16, decode_window=8),
    ).validate()


def test_supervised_recovery_matches_uninterrupted(tmp_path):
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 20), 0, 256)

    # uninterrupted: health always passes
    want = generate_supervised(
        params, cfg, prompt, 24, str(tmp_path / "a"),
        window=8, health=lambda: True)

    # interrupted: the probe FAILS before windows 2 and 3 (simulating a
    # dead host detected by the heartbeat) — the supervisor must restore
    # the latest snapshot and replay
    calls = {"n": 0}

    def flaky_health():
        calls["n"] += 1
        return calls["n"] not in (2, 3)

    got = generate_supervised(
        params, cfg, prompt, 24, str(tmp_path / "b"),
        window=8, health=flaky_health)

    assert calls["n"] >= 5            # probes ran, failures injected
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_supervised_restart_budget_exhausted(tmp_path):
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jnp.ones((2, 8), jnp.int32)
    import pytest
    with pytest.raises(RuntimeError, match="restarts exhausted"):
        generate_supervised(params, cfg, prompt, 8, str(tmp_path / "c"),
                            window=8, health=lambda: False,
                            max_restarts=2)


def test_supervised_cross_process_resume(tmp_path):
    """resume=True restores params + the latest snapshot from ckpt_dir
    (the restart-after-host-death path) and continues to the SAME token
    stream as an uninterrupted run — including a longer budget."""
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 20), 0, 256)
    want = generate_supervised(params, cfg, prompt, 24,
                               str(tmp_path / "u"), window=8,
                               health=lambda: True)
    # "process 1": decode 16 tokens, then die
    d = str(tmp_path / "r")
    part = generate_supervised(params, cfg, prompt, 16, d, window=8,
                               health=lambda: True)
    np.testing.assert_array_equal(np.asarray(part),
                                  np.asarray(want)[:, :16])
    # "process 2": resume from disk (prompt/params args unused on the
    # restore path beyond shape bookkeeping) and extend to 24
    got = generate_supervised(params, cfg, prompt, 24, d, window=8,
                              health=lambda: True, resume=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
