"""Cascade KV token pruning — the start/important/recent rolling cache.

Semantics anchor: `SpAttenKVCache.apply_token_pruning`
(reference spatten_llm/kv_cache_token_pruning.py:42-96):

* triggered when ``length + num_coming > start + important + recent``;
* keeps the first ``start`` sink tokens;
* keeps the per-head top-``important`` tokens (by accumulated importance)
  from the middle region ``[start, length - recent + num_coming)``, with
  indices sorted ascending so cache order stays chronological;
* keeps the trailing window ``[length - recent + num_coming, length)``.

Unlike the reference (which rebuilds python lists of torch tensors), this is
a jittable index computation with **static output shapes**: ``num_coming``
is a static argument, so the kept count ``start + important + (recent -
num_coming)`` is known at trace time and XLA sees fixed-size gathers.
Once pruned, a token is gone from the cache — pruned-stays-pruned across all
later steps and layers (the "cascade" property) falls out of the data layout,
exactly as in the HW plane where the score_buf index list only ever shrinks
(SpAttenController.scala:20-33, workload CSVs' monotone key_fetch_num).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from spatten_tpu.config import PruningConfig

_NEG_INF = float("-inf")


def pruned_length(cfg: PruningConfig, num_coming: int) -> int:
    """Number of tokens kept after a prune (static)."""
    recent_keep = cfg.recent_size - num_coming
    if recent_keep < 0:
        raise ValueError(
            f"num_coming={num_coming} exceeds recent_size={cfg.recent_size}"
        )
    return cfg.start_size + cfg.important_size + recent_keep


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def select_keep_indices(
    importance: jax.Array,
    length: jax.Array,
    start_size: int,
    important_size: int,
    recent_size: int,
    num_coming: int,
) -> jax.Array:
    """Compute kept token indices, sorted ascending.

    importance: [..., C] accumulated importance; entries at positions >=
        `length` are ignored.
    length: int32 — current number of valid tokens; a scalar, or an array
        broadcastable to importance.shape[:-1] (per-sequence lengths for
        continuous batching).  Must satisfy length + num_coming > cache_size
        for the result to be meaningful; callers gate on that condition.
    returns: int32 [..., keep_total] with
        keep_total = start_size + important_size + (recent_size - num_coming).
    """
    capacity = importance.shape[-1]
    lead = importance.shape[:-1]
    recent_keep = recent_size - num_coming
    keep_total = start_size + important_size + recent_keep
    assert keep_total <= capacity

    pos = jnp.arange(capacity, dtype=jnp.int32)
    length = jnp.broadcast_to(jnp.asarray(length, jnp.int32), lead)
    recent_begin = length - recent_keep                        # [...]

    if important_size > 0:
        # Mask importance outside the middle region [start, recent_begin).
        in_middle = (pos >= start_size) & (pos < recent_begin[..., None])
        masked = jnp.where(in_middle, importance.astype(jnp.float32), _NEG_INF)
        _, important_idx = jax.lax.top_k(masked, important_size)
        important_idx = jnp.sort(important_idx, axis=-1)       # chronological
    else:
        important_idx = jnp.zeros(lead + (0,), jnp.int32)

    start_idx = jnp.broadcast_to(
        jnp.arange(start_size, dtype=jnp.int32), lead + (start_size,)
    )
    recent_idx = recent_begin[..., None] + jnp.arange(recent_keep, dtype=jnp.int32)
    return jnp.concatenate(
        [start_idx, important_idx.astype(jnp.int32), recent_idx], axis=-1
    )


def layer_budgets_static(cfg: PruningConfig, num_layers: int
                         ) -> tuple[int, ...]:
    """Per-layer important-region budgets as plain ints (compile-time
    config math — usable for static kernel-shape decisions)."""
    floor = max(cfg.v_block_size, 1)
    ratios = getattr(cfg, "cascade_layer_ratios", None)
    if ratios:
        r = list(ratios) + [ratios[-1]] * max(0, num_layers - len(ratios))
        return tuple(max(floor, int(round(cfg.important_size * r[l])))
                     for l in range(num_layers))
    decay = getattr(cfg, "cascade_layer_decay", 1.0)
    return tuple(max(floor, int(round(cfg.important_size * decay ** l)))
                 for l in range(num_layers))


def layer_keep_max_static(cfg: PruningConfig, num_layers: int
                          ) -> tuple[int, ...]:
    """Static upper bound on each layer's post-prune live length:
    start + budget_l + recent (num_coming=0 keeps the full recent window,
    matching maybe_prune's selection call)."""
    return tuple(cfg.start_size + b + cfg.recent_size
                 for b in layer_budgets_static(cfg, num_layers))


def layer_capacities(cfg) -> tuple[int, ...]:
    """Per-layer physical cache-window rungs (static ints).

    The cascade schedule makes deep layers keep far fewer tokens than
    capacity (key_fetch_num decay, summary-gpt2-small-wikitext2-per8.csv),
    but a single capacity lets every layer refill all the way to it before
    pruning — deep layers then spend most steps at live windows far above
    their budget, and the decode kernel's grid/VPU passes stay sized to
    full capacity.  Rung-capping each layer at the smallest multiple of
    2048 (one nibble pack-unit, so the packed-plane layout is a shared
    prefix) above ``keep_max + headroom``:

    * bounds the layer's live window near its budget (steady-state bytes
      == measured bytes);
    * lets the kernel compile per-rung variants with smaller [R, cap]
      planes and more batch rows per grid instance (the decode step is
      instance-serialization-bound at short live windows, RESULTS.md r2/r4).

    ``cfg`` is a SpAttenConfig.  Returns ``num_layers`` ints, each a
    divisor-friendly multiple of 2048 <= cache_capacity (or capacity
    itself when pruning/rungs are off or capacity is small).
    """
    e, p, m = cfg.engine, cfg.pruning, cfg.model
    cap = e.cache_capacity
    flat = (cap,) * m.num_layers
    if not (p.enable_token_pruning and getattr(e, "layer_cap_rungs", True)):
        return flat
    if cap % 2048 or cap < 4096:
        return flat           # too small for a shared pack-unit prefix
    headroom = max(getattr(e, "layer_cap_headroom", 768),
                   e.prefill_chunk, e.decode_window)
    out = []
    for keep_max in layer_keep_max_static(p, m.num_layers):
        need = keep_max + headroom
        out.append(min(cap, -(-need // 2048) * 2048))
    return tuple(out)


def layer_capacity_groups(cfg) -> tuple[tuple[int, int, int], ...]:
    """Contiguous layer groups of equal capacity rung:
    ((start, end, rung), ...) with end exclusive."""
    caps = layer_capacities(cfg)
    groups: list[list[int]] = []
    for l, c in enumerate(caps):
        if groups and groups[-1][2] == c:
            groups[-1][1] = l + 1
        else:
            groups.append([l, l + 1, c])
    return tuple(tuple(g) for g in groups)


def layer_budgets(cfg: PruningConfig, num_layers: int) -> jnp.ndarray:
    """Per-layer important-region budgets (the cascade schedule).

    budget[l] = round(important_size * cascade_layer_decay**l), floored at
    one v-block.  With decay < 1 the emitted `key_fetch_num` decays across
    layers within one iteration — the defining signature of the reference
    traces (workloads/summary-gpt2-small-wikitext2-per8.csv: 993->921->716).
    """
    return jnp.asarray(layer_budgets_static(cfg, num_layers), jnp.int32)


def select_keep_indices_budgeted(
    importance: jax.Array,     # [L, B, Hkv, C]
    lengths: jax.Array,        # [L, B] or broadcastable to [L, B, Hkv]
    start_size: int,
    important_budget: jax.Array,   # int32 [L], each <= important_size_max
    important_size_max: int,
    recent_size: int,
    num_coming: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-layer budgeted keep selection (cascade schedule as data).

    Like `select_keep_indices` but the important-region count varies per
    layer at runtime: static shapes carry `important_size_max` slots, and
    layers with a smaller budget mark the excess invalid; a final sort
    compacts [start || kept-important || recent] contiguously and
    chronologically, with invalid slots pushed past the kept region.

    Returns (keep_idx [L, B, Hkv, keep_max], keep_count [L, B]) where
    keep_max = start + important_size_max + (recent - num_coming) and only
    the first keep_count[l, b] indices of each row are live.
    """
    L, Bb, hkv, capacity = importance.shape
    recent_keep = recent_size - num_coming
    if recent_keep < 0:
        raise ValueError(
            f"num_coming={num_coming} exceeds recent_size={recent_size}")
    keep_max = start_size + important_size_max + recent_keep
    assert keep_max <= capacity

    pos = jnp.arange(capacity, dtype=jnp.int32)
    lengths = jnp.broadcast_to(
        jnp.asarray(lengths, jnp.int32).reshape(L, Bb, 1), (L, Bb, hkv))
    recent_begin = lengths - recent_keep                  # [L, B, Hkv]
    budget = jnp.asarray(important_budget, jnp.int32
                         ).reshape(L, 1, 1, 1)

    in_middle = (pos >= start_size) & (pos < recent_begin[..., None])
    masked = jnp.where(in_middle, importance.astype(jnp.float32), _NEG_INF)
    val, idx = jax.lax.top_k(masked, important_size_max)
    rank = jnp.arange(important_size_max, dtype=jnp.int32)
    valid_imp = (rank < budget) & (val > _NEG_INF)        # [L,B,Hkv,M]

    big = capacity + rank                                 # distinct tails
    imp_key = jnp.where(valid_imp, idx, big)

    start_idx = jnp.broadcast_to(
        jnp.arange(start_size, dtype=jnp.int32),
        (L, Bb, hkv, start_size))
    recent_idx = recent_begin[..., None] + jnp.arange(recent_keep,
                                                      dtype=jnp.int32)
    keys = jnp.concatenate(
        [start_idx, imp_key, recent_idx], axis=-1)        # [L,B,Hkv,keep_max]
    # invalid important keys are >= capacity > any recent index, so one
    # ascending sort yields [start || kept-important || recent || invalid]
    keys = jnp.sort(keys, axis=-1)
    keep_idx = jnp.where(keys < capacity, keys, 0).astype(jnp.int32)

    n_imp = jnp.minimum(
        budget[..., 0],
        jnp.maximum(recent_begin[:, :, :1] - start_size, 0))  # [L, B, 1]
    keep_count = (start_size + n_imp[..., 0] + recent_keep)   # [L, B]
    return keep_idx, keep_count


def prune_arrays(
    keep_indices: jax.Array, *arrays: jax.Array
) -> Tuple[jax.Array, ...]:
    """Gather token rows of each array by `keep_indices`.

    keep_indices: [..., T_keep]; each array is [..., C, D] or [..., C] with
    matching leading dims.  Returns arrays with the token axis compacted to
    T_keep.  (The compaction replaces the reference's boolean-mask gather,
    kv_cache_token_pruning.py:65-69, with a shape-static take_along_axis.)
    """
    out = []
    for a in arrays:
        if a.ndim == keep_indices.ndim:            # [..., C]
            out.append(jnp.take_along_axis(a, keep_indices, axis=-1))
        elif a.ndim == keep_indices.ndim + 1:      # [..., C, D]
            out.append(
                jnp.take_along_axis(a, keep_indices[..., None], axis=-2)
            )
        else:
            raise ValueError(
                f"array rank {a.ndim} incompatible with indices rank "
                f"{keep_indices.ndim}"
            )
    return tuple(out)
