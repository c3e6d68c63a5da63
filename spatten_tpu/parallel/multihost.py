"""Multi-host runtime: initialization, health checks, restartable serving.

The reference is strictly single-process (SURVEY.md §2.9/§5 — no collective
backend, no failure handling; sims abort on assert).  For pod-scale TPU
serving this module provides the jax.distributed glue:

* `initialize(...)` — one call per host before any jax op; after it,
  `jax.devices()` spans the pod and the ShardedEngine's mesh covers all
  hosts (DCN between hosts, ICI within).
* `health_check(mesh)` — an all-reduce heartbeat across every device; a
  dead/hung host surfaces as a timeout here rather than a silent stall in
  the decode loop.
* preemption tolerance = `engine.checkpoint` snapshots of params + the
  live pruned DecodeState: on restart, re-`initialize`, restore, and
  resume decoding mid-stream (tests/test_eval_ckpt_metrics.py exercises
  the resume path single-host).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (no-op if already initialized).

    On TPU pods arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters or tests.
    """
    if jax.process_count() > 1 or jax._src.distributed.global_state.client:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def health_check(timeout_s: float = 60.0) -> bool:
    """All-device heartbeat: returns True if every device participated
    within `timeout_s` seconds.

    Runs a psum of ones over all devices via pmap-free jit on a 1-element
    per-device array.  The collective runs in a worker thread joined with
    the timeout: a missing/hung host either raises inside the runtime or
    never completes — both report False so the caller can trigger
    recovery (restart from checkpoint, engine/checkpoint.py).
    """
    import threading

    n = jax.device_count()
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(n), ("all",))
    x = jax.make_array_from_callback(
        (n,), NamedSharding(mesh, P("all")),
        lambda idx: np.ones((1,), np.float32))

    result: list = []

    def run():
        try:
            summed = jax.jit(
                jax.shard_map(lambda v: jax.lax.psum(v, "all"), mesh=mesh,
                              in_specs=P("all"), out_specs=P("all"),
                              check_vma=False)
            )(x)
            result.append(
                float(np.asarray(jax.device_get(summed))[0]) == float(n))
        except Exception:                     # collective/runtime failure
            result.append(False)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(result and result[0])
