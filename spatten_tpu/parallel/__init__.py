"""Distribution layer: device mesh, shardings, and shard_map'd step fns.

The reference is single-chip (SURVEY.md §2.9 — its only "network" is an AXI
crossbar into 16 HBM channels); everything here is designed fresh for TPU:

* mesh axes ("data", "model"): DP over batch, TP over attention heads +
  MLP columns, with explicit `lax.psum` collectives riding ICI;
* the pruned KV cache is sharded over "model" on the kv-head axis — per-head
  top-k pruning is embarrassingly TP-parallel (each shard prunes its own
  heads with its own importance accumulator, no cross-chip traffic);
* batch (and each sequence's cache) shards over "data".
"""

from spatten_tpu.parallel.mesh import make_mesh
from spatten_tpu.parallel.sharded import (
    ShardedEngine,
    local_config,
    param_pspecs,
    state_pspecs,
)
from spatten_tpu.parallel.pipeline import PipelineEngine

__all__ = [
    "make_mesh",
    "ShardedEngine",
    "PipelineEngine",
    "local_config",
    "param_pspecs",
    "state_pspecs",
]
