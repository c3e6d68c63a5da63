"""Importance-score accumulation — the signal driving all three prunings.

Two signal kinds (config `PruningConfig.importance_kind`):

* "prob": accumulated softmax probabilities summed over queries — the
  HPCA'21 paper formulation; this is what the attention kernels emit in
  their epilogue.
* "presoftmax": sum over queries of the raw scaled QK^T logits — exact
  parity with the reference demo, which records `attn_weights` pre-mask,
  pre-softmax (spatten_llm/pos_shift/modify_llama.py:115-119) and reduces it
  `item.sum(0).sum(1)` → [heads, kv_len]
  (spatten_llm/kv_cache_token_pruning.py:51).

GQA note (SURVEY.md §7 hard parts): the reference models are MHA; under GQA
the KV cache is shared across a group of query heads, so importance must be
reduced over the group before it can drive pruning of shared K/V rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def importance_from_probs(probs: jax.Array) -> jax.Array:
    """probs: [batch, heads, q_len, kv_len] -> [batch, heads, kv_len]."""
    return probs.astype(jnp.float32).sum(axis=-2)


def importance_from_scores(scores: jax.Array) -> jax.Array:
    """Reference-parity reduction of raw scaled logits.

    scores: [batch, heads, q_len, kv_len].  The reference sums over batch
    *and* queries to [heads, kv_len]; we keep the batch dim (each sequence
    prunes independently in a serving engine) and sum only queries.
    """
    return scores.astype(jnp.float32).sum(axis=-2)


def reduce_to_kv_heads(per_q_head: jax.Array, num_kv_heads: int) -> jax.Array:
    """Sum a [batch, num_q_heads, ...] signal over each GQA group.

    Query heads [g*group : (g+1)*group) share KV head g (HF repeat_kv
    ordering), so a sum over axis 1 within each group yields the shared
    KV head's importance.
    """
    b, h = per_q_head.shape[:2]
    assert h % num_kv_heads == 0
    group = h // num_kv_heads
    shaped = per_q_head.reshape((b, num_kv_heads, group) + per_q_head.shape[2:])
    return shaped.sum(axis=2)
