"""Head pruning — remove entire attention heads on the fly.

The reference has no dedicated RTL for this; pruned heads simply never issue
requests (SURVEY.md §0: workload CSVs drop head rows — GPT-2-medium keeps
10-13/16 heads in late layers).  Here a head is pruned by a per-layer boolean
mask:

* semantics: the attention output is the concat of head outputs followed by
  a linear o_proj, which is linear in each head's slice — so zeroing a
  pruned head's output is *exactly* equivalent to removing its contribution;
* performance: the Pallas decode kernel skips the pruned head's K/V DMA and
  matmuls entirely via a per-head `@pl.when` guard, so masked heads cost
  (almost) nothing, mirroring "never issues requests".

Head importance follows the paper: cumulative sum over tokens and steps of
the head's attention-probability mass (equivalently, the sum of its token
importance scores).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def head_importance(token_importance: jax.Array,
                    valid_length: jax.Array | None = None) -> jax.Array:
    """Reduce token importance [..., heads, cache] -> [..., heads].

    If `valid_length` is given, positions >= valid_length are ignored.
    """
    if valid_length is not None:
        cap = token_importance.shape[-1]
        mask = jnp.arange(cap) < valid_length
        token_importance = jnp.where(mask, token_importance, 0.0)
    return token_importance.sum(axis=-1)


def select_heads(importance: jax.Array, keep: int) -> jax.Array:
    """Boolean keep-mask of the top-`keep` heads along the last axis.

    importance: [..., num_heads] -> bool [..., num_heads].
    """
    num_heads = importance.shape[-1]
    if keep <= 0 or keep >= num_heads:
        return jnp.ones(importance.shape, dtype=bool)
    _, idx = jax.lax.top_k(importance.astype(jnp.float32), keep)
    mask = jnp.zeros(importance.shape, dtype=bool)
    return _scatter_true(mask, idx)


def apply_head_mask(attn_out: jax.Array, head_mask: jax.Array) -> jax.Array:
    """Zero pruned heads' outputs.  attn_out: [batch, heads, ...];
    head_mask: [heads] or [batch, heads]."""
    while head_mask.ndim < attn_out.ndim:
        head_mask = head_mask[..., None]
    return jnp.where(head_mask, attn_out, 0.0)


def _scatter_true(mask: jax.Array, idx: jax.Array) -> jax.Array:
    oh = jax.nn.one_hot(idx, mask.shape[-1], dtype=jnp.int32).sum(axis=-2)
    return oh > 0
