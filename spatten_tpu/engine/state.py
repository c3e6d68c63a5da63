"""Decode-state pytree threaded through the jitted step functions.

The reference's per-request metadata (quant profile, fetch counts, topk
enable/num, requant threshold — SpAtten.scala:94-111) becomes per-layer
arrays living in this state plus static knobs in SpAttenConfig: "policy is
data, not config" survives as the importance / head-mask / length arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spatten_tpu.config import SpAttenConfig
from spatten_tpu.engine.kv_cache import LayerKVCache, init_stacked_cache


class DecodeState(NamedTuple):
    cache: LayerKVCache        # planes stacked [L, B, Hkv, ...]
    importance: jax.Array      # f32 [L, B, Hkv, C] cascade accumulator
    lengths: jax.Array         # int32 [B] nominal tokens per sequence
                               #   (tokens fed; drives the prune trigger,
                               #   positions and EOS bookkeeping)
    layer_lengths: jax.Array   # int32 [L, B] live tokens in each layer's
                               #   cache — with a cascade schedule deeper
                               #   layers keep fewer (key_fetch_num decay)
    head_mask: jax.Array       # bool [L, Hq] — False = pruned head
    requant_events: jax.Array  # int32 [] cumulative low-confidence recomputes
    quant_bits: jax.Array      # int32 [L] pass-1 bits per layer (4/6/8) —
                               #   the reference's per-request QuantProfile
                               #   as data (SpAtten.scala:71-74)

    @property
    def capacity(self) -> int:
        return self.importance.shape[-1]


def write_slot(state: DecodeState, sub: DecodeState, slot: int | jax.Array
               ) -> DecodeState:
    """Scatter a batch-1 sub-state into batch slot `slot` of `state`.

    Used by continuous batching: a newly admitted request is prefilled in
    its own batch-1 state, then written into a free slot of the serving
    arena (cache planes, importance, length).  The head mask is global
    (per layer), not per slot, and is left untouched.
    """
    slot = jnp.asarray(slot, jnp.int32)

    def scatter(big, small):
        # leaves are [L, B, ...]; write small's B=1 row at `slot`
        starts = [jnp.int32(0), slot] + [jnp.int32(0)] * (big.ndim - 2)
        return jax.lax.dynamic_update_slice(big, small.astype(big.dtype),
                                            starts)

    cache = jax.tree.map(scatter, state.cache, sub.cache)
    importance = scatter(state.importance, sub.importance)
    lengths = jax.lax.dynamic_update_slice(
        state.lengths, sub.lengths.astype(jnp.int32), (slot,))
    layer_lengths = jax.lax.dynamic_update_slice(
        state.layer_lengths, sub.layer_lengths.astype(jnp.int32),
        (jnp.int32(0), slot))
    return state._replace(cache=cache, importance=importance,
                          lengths=lengths, layer_lengths=layer_lengths)


def with_lengths(state: DecodeState, lengths) -> DecodeState:
    """Set nominal lengths and broadcast them to every layer (the uniform
    pre-cascade situation; tests and warm-state builders use this)."""
    lengths = jnp.asarray(lengths, jnp.int32)
    L = state.layer_lengths.shape[0]
    return state._replace(
        lengths=lengths,
        layer_lengths=jnp.broadcast_to(lengths[None], (L,) + lengths.shape))


def init_state(cfg: SpAttenConfig, batch: int | None = None) -> DecodeState:
    m, e = cfg.model, cfg.engine
    b = batch if batch is not None else e.max_batch_size
    cap = e.cache_capacity
    return DecodeState(
        cache=init_stacked_cache(m.num_layers, b, m.num_kv_heads, cap,
                                 m.head_dim,
                                 with_msb=cfg.quant.enabled,
                                 with_lsb2=cfg.quant.needs_lsb2,
                                 scale_dtype=cfg.quant.scale_dtype),
        importance=jnp.zeros((m.num_layers, b, m.num_kv_heads, cap),
                             jnp.dtype(cfg.pruning.importance_dtype)),
        lengths=jnp.zeros((b,), jnp.int32),
        layer_lengths=jnp.zeros((m.num_layers, b), jnp.int32),
        head_mask=jnp.ones((m.num_layers, m.num_heads), bool),
        requant_events=jnp.zeros((), jnp.int32),
        quant_bits=jnp.asarray(
            cfg.quant.resolved_layer_bits(m.num_layers), jnp.int32),
    )
