"""Run metrics + structured summary emission.

The reference reports through `summary.txt` CSV lines and `sram-stats.txt`
traffic dumps (TestSpAtten.scala:217-249, SURVEY.md §5).  Here a run emits
one structured JSON summary: throughput, pruning ratios, requant rate, and
estimated HBM bytes/token (from the same roofline used by perf.cost_model).
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field
from typing import Optional

from spatten_tpu.config import SpAttenConfig


@dataclass
class RunMetrics:
    model: str = ""
    batch: int = 0
    prompt_tokens: int = 0
    generated_tokens: int = 0
    wall_seconds: float = 0.0
    requant_events: int = 0
    final_cache_length: int = 0
    cache_capacity: int = 0
    head_keep_fraction: float = 1.0
    config: dict = field(default_factory=dict)

    @property
    def tokens_per_s(self) -> float:
        return (self.generated_tokens / self.wall_seconds
                if self.wall_seconds else 0.0)

    @property
    def requant_rate(self) -> float:
        """Requants per (step, layer, kv_head) request."""
        reqs = self.config.get("requests", 0)
        return self.requant_events / reqs if reqs else 0.0

    def summary(self) -> dict:
        d = dataclasses.asdict(self)
        d["tokens_per_s"] = round(self.tokens_per_s, 2)
        d["requant_rate"] = round(self.requant_rate, 4)
        return d

    def write(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.summary(), fh, indent=2)


def collect_run_metrics(cfg: SpAttenConfig, result, batch: int,
                        prompt_tokens: int, wall_seconds: float
                        ) -> RunMetrics:
    import jax
    import numpy as np
    state = result.state
    steps = int(result.tokens.shape[1])
    m = cfg.model
    hm = np.asarray(jax.device_get(state.head_mask))
    return RunMetrics(
        model=f"{m.model_type}-{m.num_layers}L-{m.hidden_size}d",
        batch=batch,
        prompt_tokens=prompt_tokens,
        generated_tokens=int(result.tokens.size),
        wall_seconds=wall_seconds,
        requant_events=int(jax.device_get(result.requant_events)),
        final_cache_length=int(np.asarray(
            jax.device_get(state.lengths)).max()),
        cache_capacity=cfg.engine.cache_capacity,
        head_keep_fraction=float(hm.mean()),
        config={
            "requests": steps * m.num_layers * m.num_kv_heads * batch,
            "pruning": dataclasses.asdict(cfg.pruning),
            "quant": dataclasses.asdict(cfg.quant),
        },
    )
