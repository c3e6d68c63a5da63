"""Teacher-forced perplexity under the SpAtten engine.

Streams a token sequence through the engine in chunks (the rolling
start/important/recent cache evicts as it would in serving — matching the
reference's streaming eval design, utils.py:29-34 `--num_eval_tokens` +
`--enable_start_recent_kv_cache`), accumulating next-token NLL.

Perplexity measured this way quantifies the accuracy cost of cascade token
pruning + quantization at the configured ratios — the reference's
north-star ppl-delta metric (BASELINE.md)."""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import SpAttenConfig
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine.state import init_state
from spatten_tpu.models import transformer


@dataclass
class PerplexityResult:
    perplexity: float
    nll: float
    num_tokens: int
    requant_events: int


@functools.partial(jax.jit, static_argnums=(1,))
def _eval_chunk(params, cfg: SpAttenConfig, state, inp, tgt):
    """One teacher-forced chunk: prune-if-needed, forward, summed NLL.

    Jitted once per (cfg, chunk-shape) — the whole step (including the
    prune branch) runs as a single compiled program."""
    state, _ = gen.maybe_prune(cfg, state, inp.shape[1])
    logits, state, _ = transformer.forward(params, cfg, state, inp)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -picked.sum(), state


def evaluate_perplexity(
    params,
    cfg: SpAttenConfig,
    tokens: np.ndarray,           # int [T] or [1, T]
    max_tokens: Optional[int] = None,
) -> PerplexityResult:
    """NLL of tokens[1:] given the streaming pruned cache."""
    cfg.validate()
    tokens = np.asarray(tokens).reshape(-1)
    if max_tokens is not None:
        tokens = tokens[: max_tokens + 1]
    t = len(tokens)
    assert t >= 2, "need at least 2 tokens"

    chunk = cfg.engine.prefill_chunk
    state = init_state(cfg, batch=1)
    total_nll, total_cnt = 0.0, 0

    pos = 0
    while pos < t - 1:
        n = min(chunk, t - 1 - pos)
        inp = jnp.asarray(tokens[pos:pos + n][None], jnp.int32)
        tgt = jnp.asarray(tokens[pos + 1:pos + 1 + n][None], jnp.int32)
        nll_chunk, state = _eval_chunk(params, cfg, state, inp, tgt)
        total_nll += float(nll_chunk)
        total_cnt += n
        pos += n

    nll = total_nll / total_cnt
    return PerplexityResult(
        perplexity=float(np.exp(nll)), nll=nll, num_tokens=total_cnt,
        requant_events=int(jax.device_get(state.requant_events)),
    )
