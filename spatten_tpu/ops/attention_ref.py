"""Reference (pure-jnp) SpAtten attention over a quantized, pruned KV cache.

This is the numerics anchor: a dense-shaped, masked implementation of the
full pipeline one attention request travels in the reference hardware
(SURVEY.md §3.3):

    MSB-plane QK^T  ->  softmax  ->  requant decision  ->  (full-plane
    recompute for low-confidence heads)  ->  local-V top-k  ->  P·V

plus the importance-score epilogue that drives cascade token pruning and
head pruning.  The fused Pallas kernels in `ops/decode_attention.py` must
match this function bit-for-bit-ish (same plane selection, same block
granularity) — tests compare against it.

All shapes are static; sparsity is expressed as masks.  The *performance*
realization (actually skipping DMA/compute) lives in the Pallas kernels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops import rope as rope_ops

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class AttentionStats(NamedTuple):
    """Pruning/quantization signals emitted by the attention epilogue."""

    max_prob: jax.Array           # [B, Hkv] max softmax prob (pass-1 plane)
    need_requant: jax.Array       # [B, Hkv] bool
    importance_delta: jax.Array   # [B, Hkv, C] to add to the accumulator
    probs: jax.Array              # [B, Hq, q_len, C] (post plane-select)


def _repeat_kv(x: jax.Array, group: int) -> jax.Array:
    """[B, Hkv, ...] -> [B, Hkv*group, ...] (HF repeat_kv ordering)."""
    b, hkv = x.shape[:2]
    x = jnp.broadcast_to(x[:, :, None], (b, hkv, group) + x.shape[2:])
    return x.reshape((b, hkv * group) + x.shape[3:])


def _group_reduce(x: jax.Array, num_kv_heads: int, op) -> jax.Array:
    """[B, Hq, ...] -> [B, Hkv, ...] reducing over each GQA group."""
    b, hq = x.shape[:2]
    group = hq // num_kv_heads
    return op(x.reshape((b, num_kv_heads, group) + x.shape[2:]), 2)


def kth_block_mass(block_mass: jax.Array, v_keep, block_size: int
                   ) -> jax.Array:
    """The keep threshold (k-th largest block mass) per row.

    block_mass: [..., num_blocks]; v_keep: python int (static top-k) or a
    traced int32 scalar (per-layer value budget — the reference's
    `value_fetch_num` varies per layer/request, CSV col 12; the TPU form
    sorts and indexes the k-th element so k may be data).
    Returns kth [..., 1]; compare `block_mass >= kth` to keep.
    """
    num_blocks = block_mass.shape[-1]
    if isinstance(v_keep, int):
        keep_blocks = max(1, -(-v_keep // block_size))
        if keep_blocks >= num_blocks:
            return jnp.full(block_mass.shape[:-1] + (1,), -jnp.inf)
        return jax.lax.top_k(block_mass, keep_blocks)[0][..., -1:]
    kb = jnp.maximum(1, -(-jnp.asarray(v_keep, jnp.int32) // block_size))
    srt = jnp.sort(block_mass, axis=-1)[..., ::-1]
    ki = jnp.clip(kb - 1, 0, num_blocks - 1)
    # the budget is one scalar for the whole call — a dynamic slice at a
    # traced start is ~free, where a broadcast take_along_axis lowers to
    # XLA's slow general gather
    return jax.lax.dynamic_slice_in_dim(srt, ki, 1, axis=-1)


def v_block_keep_mask(probs: jax.Array, v_keep, block_size: int
                      ) -> jax.Array:
    """Local V pruning mask at block granularity.

    probs: [..., C].  Blocks of `block_size` tokens score by their summed
    probability mass; the top ceil(v_keep/block_size) blocks are kept.
    Block granularity mirrors the hardware's buffer-line fetch unit (8 KV
    vectors per line, SpAtten.scala:36-38) and maps to efficient DMA on TPU.
    `v_keep` may be a traced per-layer scalar (see kth_block_mass).
    Returns a bool mask [..., C].
    """
    cap = probs.shape[-1]
    assert cap % block_size == 0
    num_blocks = cap // block_size
    blocked = probs.reshape(probs.shape[:-1] + (num_blocks, block_size))
    block_mass = blocked.sum(axis=-1)
    kth = kth_block_mass(block_mass, v_keep, block_size)
    keep = block_mass >= kth                              # [..., num_blocks]
    return jnp.repeat(keep, block_size, axis=-1)


def spatten_attention_reference(
    q: jax.Array,                  # [B, Hq, q_len, D] (already rotated)
    k_quant: qz.QuantizedKV,       # planes [B, C(/2), Hkv*D], scale [B,Hkv,C]
    v_quant: qz.QuantizedKV,
    cos: jax.Array,                # rope tables [P, D]
    sin: jax.Array,
    length: jax.Array,             # scalar/[B] — valid tokens incl. queries
    q_positions: jax.Array,        # [q_len] or [B, q_len] cache positions
    *,
    sm_scale: float,
    requant_threshold: float = 0.0,   # 0 disables progressive quant
    quant_enabled: bool = True,
    v_keep: int = 0,                  # 0 disables local V pruning
    v_block_size: int = 16,
    head_mask: Optional[jax.Array] = None,   # [Hq] or [B, Hq] bool
    importance_kind: str = "prob",
    use_rope: bool = True,   # False for abs-pos models (GPT-2 family)
    pass1_bits: Optional[jax.Array] = None,  # traced scalar 4/6/8: this
                                   # layer's QuantProfile (policy-as-data,
                                   # SpAtten.scala:71-74); None = static
                                   # 4-bit msb profile
) -> tuple[jax.Array, AttentionStats]:
    """Returns (output [B, Hq, q_len, D], stats)."""
    b, hq, q_len, d = q.shape
    hkv = k_quant.heads
    cap = k_quant.tokens
    group = hq // hkv

    if length.ndim == 0:
        length = jnp.broadcast_to(length, (b,))

    # --- key dequantization (both planes) + pos-shift RoPE at cache slots ---
    def rotated_keys(deq_fn):
        k = deq_fn(k_quant, jnp.float32)          # [B, Hkv, C, D]
        if not use_rope:
            return k
        return rope_ops.apply_rope_at_cache_positions(k, cos, sin)

    pos_k = jnp.arange(cap, dtype=jnp.int32)
    valid = pos_k[None, :] < length[:, None]                   # [B, C]
    if q_positions.ndim == 1:
        q_positions = jnp.broadcast_to(q_positions[None], (b, q_len))
    causal = pos_k[None, None, :] <= q_positions[:, :, None]   # [B, q_len, C]
    mask = valid[:, None, None, :] & causal[:, None, :, :]     # [B,1,q_len,C]

    qf = q.astype(jnp.float32)

    def scores_for(k_rot):
        k_rep = _repeat_kv(k_rot, group)                       # [B, Hq, C, D]
        s = jnp.einsum("bhqd,bhcd->bhqc", qf, k_rep,
                       preferred_element_type=jnp.float32) * sm_scale
        return s

    def softmax_masked(s):
        s = jnp.where(mask, s, MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        e = jnp.where(mask, e, 0.0)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        return e / jnp.maximum(denom, 1e-30)

    if quant_enabled and pass1_bits is not None:
        # per-layer quant profile: select the pass-1 plane set at runtime
        # (bits 4 -> msb, 6 -> msb+lsb2, 8 -> full, MatrixFetcher.scala:48-51)
        deq6 = (qz.dequantize_6bit if k_quant.lsb2 is not None
                else qz.dequantize_msb)   # no lsb2 plane: 6 degrades to 4
        branches = [
            lambda: rotated_keys(qz.dequantize_msb),
            lambda: rotated_keys(deq6),
            lambda: rotated_keys(qz.dequantize_full),
        ]
        idx = jnp.clip((jnp.asarray(pass1_bits, jnp.int32) - 4) // 2, 0, 2)
        scores_msb = scores_for(jax.lax.switch(idx, branches))
    elif quant_enabled:
        scores_msb = scores_for(rotated_keys(qz.dequantize_msb))
    else:
        scores_msb = scores_for(rotated_keys(qz.dequantize_full))
    probs_msb = softmax_masked(scores_msb)

    # --- requant decision: per (B, Hkv) max prob over its group/queries ---
    # (mirrors RequantDecision.scala:69-76 — a *small* max score means a
    # flat, low-confidence distribution => refetch the LSBs.)
    max_prob = _group_reduce(
        probs_msb.max(axis=(-1, -2)), hkv, lambda x, a: x.max(axis=a)
    )                                                            # [B, Hkv]
    do_requant = quant_enabled and requant_threshold > 0.0
    if do_requant:
        need_requant = max_prob < requant_threshold
        if pass1_bits is not None:
            # an 8-bit pass-1 already read the full plane: nothing to refine
            need_requant = need_requant & (
                jnp.asarray(pass1_bits, jnp.int32) < 8)
        scores_full = scores_for(rotated_keys(qz.dequantize_full))
        probs_full = softmax_masked(scores_full)
        sel = _repeat_kv(need_requant[..., None, None], group)  # [B,Hq,1,1]
        probs = jnp.where(sel, probs_full, probs_msb)
        scores = jnp.where(sel, scores_full, scores_msb)
    else:
        need_requant = jnp.zeros((b, hkv), dtype=bool)
        probs, scores = probs_msb, scores_msb

    # --- head pruning: a masked head computes nothing; a fully masked
    # group never issues requests (its stats are zero, matching the kernel's
    # whole-program early exit and the reference's missing CSV rows) ---
    if head_mask is not None:
        hm = head_mask if head_mask.ndim == 2 else head_mask[None, :]
        hm = jnp.broadcast_to(hm, (b, hq))
        probs = jnp.where(hm[:, :, None, None], probs, 0.0)
        scores = jnp.where(hm[:, :, None, None], scores, 0.0)
        group_alive = _group_reduce(hm, hkv, lambda x, a: x.any(axis=a))
        max_prob = jnp.where(group_alive, max_prob, 0.0)
        need_requant = need_requant & group_alive

    # --- importance epilogue (pre V-pruning, pre renorm) ---
    if importance_kind == "prob":
        imp = probs
    elif importance_kind == "presoftmax":
        imp = jnp.where(mask, scores, 0.0)
    else:
        raise ValueError(importance_kind)
    importance_delta = _group_reduce(
        imp.sum(axis=-2), hkv, lambda x, a: x.sum(axis=a)
    )                                                            # [B, Hkv, C]

    # --- local V pruning: keep top-v_keep tokens' probability mass ---
    if not isinstance(v_keep, int) or v_keep > 0:
        vmask = v_block_keep_mask(probs, v_keep, v_block_size)
        probs_pv = jnp.where(vmask, probs, 0.0)
    else:
        probs_pv = probs

    # --- P·V over the (full-plane) dequantized values ---
    v = qz.dequantize_full(v_quant, jnp.float32)                 # [B,Hkv,C,D]
    v_rep = _repeat_kv(v, group)
    out = jnp.einsum("bhqc,bhcd->bhqd", probs_pv, v_rep,
                     preferred_element_type=jnp.float32)

    stats = AttentionStats(
        max_prob=max_prob,
        need_requant=need_requant,
        importance_delta=importance_delta,
        probs=probs,
    )
    return out, stats
