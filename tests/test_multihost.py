"""Multi-host tests: 2-process CPU cluster via jax.distributed.

Each subprocess gets 4 virtual CPU devices; the pair forms an 8-device
global mesh (data=4, model=2) running the sharded decode step — the same
path a 2-host TPU pod takes (SURVEY.md §4: multi-host tests with CPU
fakes)."""

import os
import socket
import subprocess
import sys

import pytest

from spatten_tpu.parallel.multihost import health_check

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

import jax.numpy as jnp
import numpy as np
from spatten_tpu.config import (
    EngineConfig, MeshConfig, ModelConfig, PruningConfig, SpAttenConfig,
)
from spatten_tpu.models import transformer
from spatten_tpu.parallel import ShardedEngine, make_mesh

cfg = SpAttenConfig(
    model=ModelConfig.tiny(),
    pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                          v_keep_ratio=0.5, v_block_size=4),
    engine=EngineConfig(max_batch_size=4, cache_capacity=32,
                        prefill_chunk=8,
                        mesh=MeshConfig(data=4, model=2)),
).validate()
mesh = make_mesh(cfg.engine.mesh)
eng = ShardedEngine(cfg, mesh)
params = eng.shard_params(
    transformer.init_params(cfg.model, jax.random.PRNGKey(0)))
state = eng.init_sharded_state(4)
prompt_np = np.zeros((4, 8), np.int32)
from jax.sharding import NamedSharding, PartitionSpec as P
prompt = jax.make_array_from_callback(
    prompt_np.shape, NamedSharding(mesh, P("data", None)),
    lambda idx: prompt_np[idx])
logits, state = eng.prefill_step()(params, state, prompt)
token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
token, state = eng.decode_step()(params, state, token)
# every process sees the same (replicated-over-model) tokens for its rows
local = jax.device_get(
    [s.data for s in token.addressable_shards])
print("WORKER_OK", pid, [np.asarray(x).tolist() for x in local])
"""


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH="/root/repo",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "WORKER_OK" in out


def test_health_check_single_host():
    assert health_check()
