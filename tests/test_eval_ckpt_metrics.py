"""Perplexity harness, checkpoint/resume, metrics, and CLI smoke tests."""

import dataclasses
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine import checkpoint as ckpt
from spatten_tpu.engine.metrics import collect_run_metrics
from spatten_tpu.engine.state import init_state
from spatten_tpu.eval import evaluate_perplexity
from spatten_tpu.models import transformer


def tiny_cfg(**kw):
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=kw.pop("pruning", PruningConfig(
            start_size=2, important_size=8, recent_size=8,
            v_keep_ratio=0.5, v_block_size=4)),
        quant=kw.pop("quant", QuantConfig(requant_threshold=0.1)),
        engine=kw.pop("engine", EngineConfig(
            max_batch_size=1, cache_capacity=32, prefill_chunk=8)),
    ).validate()


def test_perplexity_runs_and_pruning_changes_it_little():
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    toks = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (80,), 0, 255))
    res = evaluate_perplexity(params, cfg, toks)
    assert res.num_tokens == 79
    assert np.isfinite(res.perplexity)
    # a random model's ppl is ~vocab_size; sanity-bound it
    assert 1.0 < res.perplexity < 10 * cfg.model.vocab_size

    cfg_d = dataclasses.replace(
        cfg,
        pruning=dataclasses.replace(cfg.pruning,
                                    enable_token_pruning=False,
                                    enable_v_pruning=False),
        quant=QuantConfig(enabled=False, enable_requant=False),
        engine=dataclasses.replace(cfg.engine, cache_capacity=128),
    ).validate()
    res_d = evaluate_perplexity(params, cfg_d, toks)
    # pruned-vs-dense ppl should be the same order of magnitude
    assert abs(np.log(res.perplexity) - np.log(res_d.perplexity)) < 2.0


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 255)
    res = gen.generate(params, cfg, prompt, max_new_tokens=4)

    path = str(tmp_path / "ckpt")
    ckpt.save(path, params, res.state)
    params2, state2 = ckpt.restore(path)

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params2)
    np.testing.assert_array_equal(np.asarray(res.state.lengths),
                                  np.asarray(state2.lengths))
    np.testing.assert_array_equal(np.asarray(res.state.cache.k.full),
                                  np.asarray(state2.cache.k.full))

    # resume decoding from the snapshot: identical next tokens
    t1, s1, _ = gen.decode_step(params, cfg, res.state,
                                res.tokens[:, -1])
    t2, s2, _ = gen.decode_step(params2, cfg, state2, res.tokens[:, -1])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_metrics_summary(tmp_path):
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 255)
    res = gen.generate(params, cfg, prompt, max_new_tokens=5)
    m = collect_run_metrics(cfg, res, batch=2, prompt_tokens=10,
                            wall_seconds=1.5)
    s = m.summary()
    assert s["generated_tokens"] == 10
    assert s["final_cache_length"] <= cfg.engine.cache_capacity
    assert 0.0 <= s["requant_rate"]
    p = tmp_path / "summary.json"
    m.write(str(p))
    assert json.loads(p.read_text())["batch"] == 2


def test_cli_help():
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "/root/repo/run_spatten_tpu.py", "--help"],
        capture_output=True, text=True, timeout=60, env=env)
    assert out.returncode == 0
    assert "--important_size" in out.stdout
