"""spatten-tpu: a TPU-native sparse-attention inference engine.

A from-scratch JAX/XLA/Pallas realization of the four SpAtten capabilities
(reference: mit-han-lab/spatten, see SURVEY.md):

1. Cascade KV token pruning   (reference: spatten_llm/kv_cache_token_pruning.py)
2. Local V pruning            (reference: SpAttenController.scala:588-613 TopK stage)
3. Head pruning               (reference: workload CSVs, missing head rows)
4. KV progressive quantization (reference: RequantDecision.scala,
                                SpAttenController.scala:383-462)

The compute path is JAX + Pallas TPU kernels; the engine orchestrates a
continuous decode loop with a compacted, quantized, token-pruned KV cache
sharded over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from spatten_tpu.config import (
    ModelConfig,
    PruningConfig,
    QuantConfig,
    EngineConfig,
    SpAttenConfig,
)

__all__ = [
    "ModelConfig",
    "PruningConfig",
    "QuantConfig",
    "EngineConfig",
    "SpAttenConfig",
    "__version__",
]
