"""Workload-trace emission/reading + native cost-model replay."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
from spatten_tpu.engine import trace as tr
from spatten_tpu.models import transformer
from spatten_tpu.perf import (
    HwParams, dense_bytes, estimate_cost,
)
from spatten_tpu.perf import cost_model as cm

REF_CSV = ("/root/reference/spatten_hardware/hardware/workloads/"
           "summary-gpt2-small-wikitext2-per8.csv")


def tiny_cfg():
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4),
        quant=QuantConfig(requant_threshold=0.2),
        engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()


def test_collect_trace_and_roundtrip(tmp_path):
    cfg = tiny_cfg()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, 255)
    rows = tr.collect_trace(params, cfg, prompt, max_new_tokens=6)

    # one row per (step, layer, kv_head)
    assert len(rows) == 6 * cfg.model.num_layers * cfg.model.num_kv_heads
    # cascade property: key_fetch_num never exceeds capacity and drops
    # after a prune
    kf = np.array([r.key_fetch_num for r in rows])
    assert kf.max() <= cfg.engine.cache_capacity
    # quant plane bits recorded
    assert rows[0].quant_key_bit == 4
    assert rows[0].quant_value_bit == 8

    p = tmp_path / "trace.csv"
    tr.write_csv(rows, str(p))
    back = tr.read_csv(str(p))
    assert len(back) == len(rows)
    assert back[3] == rows[3]


def test_cost_model_native_matches_numpy():
    rows = [
        tr.TraceRow(i, l, h, 64.0, 993, 900 - 10 * l, 6, 16, 0.05,
                    (l + h) % 3 == 0, 4, 204, 6, True, False, True, 204)
        for i in range(4) for l in range(3) for h in range(2)
    ]
    native = estimate_cost(rows)
    numpy_res = cm._estimate_numpy(cm._columns(rows), cm.TPU_V5E)
    if cm._load_lib() is None:
        pytest.skip("native lib unavailable")
    assert native.iterations == numpy_res.iterations == 4
    np.testing.assert_allclose(native.total_bytes, numpy_res.total_bytes,
                               rtol=1e-12)
    np.testing.assert_allclose(native.total_seconds,
                               numpy_res.total_seconds, rtol=1e-12)


@pytest.mark.skipif(not os.path.exists(REF_CSV),
                    reason="reference workloads not mounted")
def test_replay_reference_workload():
    """Replay the reference's own GPT-2-small trace: the pruned run must
    move far fewer bytes than the dense fp16 run of the same workload —
    re-deriving the paper's DRAM-access-reduction headline direction."""
    rows = tr.read_csv(REF_CSV)
    assert len(rows) > 4000
    res = estimate_cost(rows)
    dense = dense_bytes(rows)
    assert res.total_bytes < dense * 0.5, (
        f"pruned bytes {res.total_bytes:.3g} vs dense {dense:.3g}")
    assert res.iterations > 0 and res.tokens_per_s > 0


def test_weight_bytes_dominate_small_batch():
    rows = [tr.TraceRow(i, 0, 0, 128.0, 512, 512, 4, 16, 0.05, False, 4,
                        128, 8, True, False, True, 128)
            for i in range(8)]
    light = estimate_cost(rows, HwParams(weight_bytes_per_step=0.0))
    heavy = estimate_cost(rows, HwParams(weight_bytes_per_step=4e9))
    assert heavy.total_seconds > light.total_seconds * 10
