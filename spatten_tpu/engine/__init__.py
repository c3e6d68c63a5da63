"""Decode engine: quantized pruned KV cache, decode state, generation,
continuous-batching server, sampling, pruning policy, workload traces,
checkpointing, and metrics."""

from spatten_tpu.engine.kv_cache import (
    LayerKVCache,
    init_layer_cache,
    append_tokens,
)
from spatten_tpu.engine.state import DecodeState, init_state, write_slot
from spatten_tpu.engine.generate import (
    GenerateResult,
    decode_step,
    maybe_prune,
    prefill_chunk,
)
# NOTE: the `generate` *function* is deliberately not re-exported here —
# it would shadow the `spatten_tpu.engine.generate` submodule attribute.
# Use `spatten_tpu.engine.generate.generate(...)`.
import spatten_tpu.engine.generate  # noqa: F401  (keep submodule attr)
from spatten_tpu.engine.sampling import SamplingParams, sample_token
from spatten_tpu.engine.server import Request, SpAttenServer

__all__ = [
    "LayerKVCache",
    "init_layer_cache",
    "append_tokens",
    "DecodeState",
    "init_state",
    "write_slot",
    "GenerateResult",
    "decode_step",
    "maybe_prune",
    "prefill_chunk",
    "SamplingParams",
    "sample_token",
    "Request",
    "SpAttenServer",
]
