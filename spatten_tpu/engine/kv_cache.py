"""Quantized, compacted KV cache (token-major layout).

TPU analog of the reference's on-chip Buffer/BufferManager + score_buf index
list (Buffer.scala, BufferManager.scala, SpAttenController.scala:20-33):
instead of an allocator over SRAM lines holding a pruned-index list, the
cache IS the compacted layout — dense token-major ``[B, capacity, Hkv*D]``
planes where pruning physically gathers survivors to the front.  Gathers,
appends, and reads are all static-shape ops XLA can schedule; there are no
scatter holes, so every attention pass streams a contiguous prefix
``[0, length)`` of HBM, and the decode kernel's per-block fetches are single
contiguous DMAs covering all heads (see ops/fused_decode.py).

Two quantization planes per tensor (see ops/quantize.py): int8 full + packed
4-bit MSB.  In the default "cached" rope mode keys are stored rotated at
their slot position (the prune path re-rotates survivors by their slot
delta); in "read" mode they are cached unrotated and rotated at read time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spatten_tpu.ops import quantize as qz


class LayerKVCache(NamedTuple):
    """One layer's cache; planes are token-major [B, C(/2), Hkv*D]."""

    k: qz.QuantizedKV
    v: qz.QuantizedKV

    @property
    def capacity(self) -> int:
        return self.k.tokens


def init_layer_cache(batch: int, kv_heads: int, capacity: int,
                     head_dim: int, with_msb: bool = True,
                     with_lsb2: bool = False,
                     scale_dtype=jnp.float32) -> LayerKVCache:
    """K carries the progressive-quantization planes (4-bit msb and,
    under a 6-bit profile, the 2-bit lsb2); V carries only the full int8
    plane — the P·V pass reads full precision (value_bits=8 policy), so
    a V nibble plane would be pure storage + append-RMW overhead."""
    def zeros(msb: bool, lsb2: bool) -> qz.QuantizedKV:
        return qz.QuantizedKV(
            full=jnp.zeros((batch, capacity, kv_heads * head_dim),
                           jnp.int8),
            msb=jnp.zeros((batch, capacity // 2, kv_heads * head_dim),
                          jnp.uint8) if msb else None,
            scale=jnp.ones((batch, kv_heads, capacity),
                           jnp.dtype(scale_dtype)),
            lsb2=jnp.zeros((batch, capacity // 4, kv_heads * head_dim),
                           jnp.uint8) if lsb2 else None,
        )

    return LayerKVCache(k=zeros(with_msb, with_lsb2),
                        v=zeros(False, False))


def init_stacked_cache(num_layers: int, batch: int, kv_heads: int,
                       capacity: int, head_dim: int, with_msb: bool = True,
                       with_lsb2: bool = False,
                       scale_dtype=jnp.float32) -> LayerKVCache:
    """Layer-stacked cache (leading [L, B]) for lax.scan over layers."""
    one = init_layer_cache(batch, kv_heads, capacity, head_dim, with_msb,
                           with_lsb2, scale_dtype)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (num_layers,) + a.shape), one
    )


def _append_rows(q: qz.QuantizedKV, x_new: jax.Array, start: jax.Array
                 ) -> qz.QuantizedKV:
    """Write S unquantized rows at slots [start, start+S).

    q planes: [C(/2), H*D], scale [H, C]; x_new: [H, S, D]; start: scalar.
    Chunk appends re-pack the nibble plane wholesale (prefill-rate event);
    single-token decode appends use the nibble read-modify-write instead
    (qz.update_token via append_tokens).
    """
    h, s, d = x_new.shape
    x32 = x_new.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)                       # [H, S]
    scale_new = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8_new = jnp.clip(jnp.round(x32 / scale_new[..., None]), -127, 127
                      ).astype(jnp.int8)                        # [H, S, D]
    fused = q8_new.transpose(1, 0, 2).reshape(s, h * d)         # [S, H*D]
    start = start.astype(jnp.int32)
    full = jax.lax.dynamic_update_slice(q.full, fused,
                                        (start, jnp.int32(0)))
    scale = jax.lax.dynamic_update_slice(
        q.scale, scale_new.astype(q.scale.dtype), (jnp.int32(0), start))
    return qz.QuantizedKV(
        full=full,
        msb=qz.pack_msb(full) if q.msb is not None else None,
        scale=scale,
        lsb2=qz.pack_lsb2(full) if q.lsb2 is not None else None)


def append_tokens(cache: LayerKVCache, k_new: jax.Array, v_new: jax.Array,
                  lengths: jax.Array) -> LayerKVCache:
    """Append S new tokens per sequence at its own length offset.

    k_new/v_new: [B, Hkv, S, D] unquantized; lengths: [B] current lengths
    (the new tokens occupy [lengths[b], lengths[b]+S)).
    """
    s = k_new.shape[-2]
    if s == 1:
        upd = jax.vmap(qz.update_token)        # per-row slot index
        k = upd(cache.k, k_new[..., 0, :], lengths)
        v = upd(cache.v, v_new[..., 0, :], lengths)
    else:
        app = jax.vmap(_append_rows)
        k = app(cache.k, k_new, lengths)
        v = app(cache.v, v_new, lengths)
    return LayerKVCache(k=k, v=v)


def prune_layer(cache: LayerKVCache, keep_indices: jax.Array
                ) -> LayerKVCache:
    """Compact the cache to `keep_indices` ([B, Hkv, T_keep], sorted).

    Gathered tokens move to the front; slots beyond T_keep keep stale data
    that the per-sequence `length` masks out of all reads.
    """
    cap = cache.capacity
    keep = keep_indices.shape[-1]
    # pad indices back to capacity so shapes stay static; padded slots
    # gather slot 0 (content irrelevant — masked by length)
    pad = jnp.zeros(keep_indices.shape[:-1] + (cap - keep,), jnp.int32)
    idx = jnp.concatenate([keep_indices, pad], axis=-1)
    return LayerKVCache(
        k=qz.gather_tokens(cache.k, idx),
        v=qz.gather_tokens(cache.v, idx),
    )
