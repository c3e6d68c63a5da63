"""Pruning subsystem: cascade token pruning, local V pruning, head pruning,
and the importance-score accumulation that drives all three.
"""

from spatten_tpu.pruning.token_pruning import (
    select_keep_indices,
    prune_arrays,
    pruned_length,
)
from spatten_tpu.pruning.importance import (
    importance_from_probs,
    importance_from_scores,
    reduce_to_kv_heads,
)
from spatten_tpu.pruning.head_pruning import (
    head_importance,
    select_heads,
)

__all__ = [
    "select_keep_indices",
    "prune_arrays",
    "pruned_length",
    "importance_from_probs",
    "importance_from_scores",
    "reduce_to_kv_heads",
    "head_importance",
    "select_heads",
]
