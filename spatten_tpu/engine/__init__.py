"""Decode engine: quantized pruned KV cache, decode state, generation loop,
pruning-policy generation, and workload-trace emission/replay.
"""

from spatten_tpu.engine.kv_cache import (
    LayerKVCache,
    init_layer_cache,
    append_tokens,
)
