"""Pos-shift rotary embeddings.

The reference's StreamingLLM-style trick (spatten_llm/pos_shift/
modify_llama.py:90-104): queries are rotated at their *cache* position and
keys are re-rotated at their cache positions (`arange(kv_seq_len)`) every
step, so that evicting tokens never leaves positional holes.  The cache
therefore stores *unrotated* keys (the reference appends `key_states` to the
cache *before* rotation, modify_llama.py:95-100).

On TPU we keep the same contract: K is cached unrotated (and quantized);
rotation happens at attention time, fused into the kernel, using a
precomputed cos/sin table indexed by cache position.

Layout note: we use the HF "rotate_half" convention — the head_dim is split
into two halves [x1, x2] and rotated as (x1*cos - x2*sin, x2*cos + x1*sin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 1))
def rope_table(max_positions: int, head_dim: int, theta: float = 10000.0):
    """Precompute (cos, sin) tables of shape [max_positions, head_dim].

    The tables follow the HF convention: inv_freq over the first half of
    head_dim, duplicated across both halves.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_positions, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                       # [P, head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # [P, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               positions: jax.Array) -> jax.Array:
    """Rotate `x` at `positions`.

    x:         [..., seq, head_dim]  (any leading dims)
    positions: [seq] or broadcastable to x's seq dim
    cos/sin:   [max_positions, head_dim]
    """
    c = jnp.take(cos, positions, axis=0)                 # [seq, head_dim]
    s = jnp.take(sin, positions, axis=0)
    c = c.astype(x.dtype)
    s = s.astype(x.dtype)
    return x * c + rotate_half(x) * s


def apply_rope_at_cache_positions(k: jax.Array, cos: jax.Array,
                                  sin: jax.Array) -> jax.Array:
    """Rotate cached keys at positions 0..len-1 (pos-shift key path).

    k: [..., cache_len, head_dim]; the position of each key is its slot
    index in the cache — the defining property of pos-shift RoPE.
    """
    cache_len = k.shape[-2]
    positions = jnp.arange(cache_len)
    return apply_rope(k, cos, sin, positions)
