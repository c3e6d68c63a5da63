"""Memory-bounded prefill attention: online softmax over cache blocks.

The reference path (`spatten_attention_reference`) materializes the full
[B, Hq, S, C] probability tensor — fine as a numerics anchor, quadratic
HBM pressure at serving shapes (batch 16 x 4 heads x 128 queries x 8k cache
x f32 = 268 MB per intermediate).  This implementation streams the cache in
blocks with the flash-attention recurrence (running max / denominator /
output), in O(S + C) memory, while keeping every SpAtten semantic:

* pass 1 on the 4-bit MSB plane -> per-(seq, kv-head) max softmax prob;
* requant decision + full-plane recompute for flagged groups (blockwise,
  selected per group — both passes stream, the flagged one re-reads);
* importance epilogue (column sums of final probabilities);
* local V pruning as probability masking (per-query top-k over block
  masses): during prefill the union of 128 queries' kept blocks covers
  nearly the whole cache, so there is no fetch saving to exploit — V rows
  stream once either way, and dropped (query, block) pairs are masked,
  matching `v_block_keep_mask` exactly;
* head pruning by group masking.

Everything is lax.scan over cache blocks — XLA fuses dequant+rope+matmul
per block and never materializes an [S, C] slice larger than one block.

Numerics match `spatten_attention_reference` (tests compare directly).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops import rope as rope_ops
from spatten_tpu.ops.attention_ref import (
    MASK_VALUE, AttentionStats, _group_reduce, _repeat_kv,
)


def _block(arr, i, size, axis):
    return jax.lax.dynamic_slice_in_dim(arr, i * size, size, axis)


def prefill_attention(
    q: jax.Array,                  # [B, Hq, S, D] (rotated queries)
    k_quant: qz.QuantizedKV,       # planes [B, C(/2), Hkv*D] (token-major)
    v_quant: qz.QuantizedKV,
    cos: jax.Array,                # [C, D]
    sin: jax.Array,
    lengths: jax.Array,            # [B] valid tokens incl. queries
    q_positions: jax.Array,        # [B, S] cache positions of the queries
    *,
    sm_scale: float,
    requant_threshold: float = 0.0,
    quant_enabled: bool = True,
    v_keep: int = 0,
    v_block_size: int = 16,
    head_mask: Optional[jax.Array] = None,
    importance_kind: str = "prob",
    use_rope: bool = True,
    block_size: int = 512,
    pass1_bits: Optional[jax.Array] = None,   # traced scalar 4/6/8 — this
                                   # layer's QuantProfile (policy-as-data)
) -> Tuple[jax.Array, AttentionStats]:
    """Streaming-blocks equivalent of `spatten_attention_reference`."""
    b, hq, s, d = q.shape
    hkv = k_quant.heads
    cap = k_quant.tokens
    group = hq // hkv
    block_size = max(block_size, v_block_size)
    while cap % block_size:
        block_size //= 2
    block_size = max(block_size, v_block_size)
    assert block_size % v_block_size == 0
    nblk = cap // block_size
    assert cap % v_block_size == 0
    nvb = cap // v_block_size
    do_requant = quant_enabled and requant_threshold > 0.0
    # v_keep may be a traced per-layer scalar (value budget as data)
    do_vprune = (not isinstance(v_keep, int)) or \
        (v_keep > 0 and -(-v_keep // v_block_size) < nvb)

    if lengths.ndim == 0:
        lengths = jnp.broadcast_to(lengths, (b,))
    if q_positions.ndim == 1:
        q_positions = jnp.broadcast_to(q_positions[None], (b, s))

    qf = q.astype(jnp.float32)
    hm = None
    if head_mask is not None:
        hm = head_mask if head_mask.ndim == 2 else \
            jnp.broadcast_to(head_mask[None], (b, hq))

    half_blocks = max(1, nblk // 2)
    p1_idx = None
    if quant_enabled and pass1_bits is not None:
        p1_idx = jnp.clip((jnp.asarray(pass1_bits, jnp.int32) - 4) // 2,
                          0, 2)

    def _head_major(fused):
        """Token-major block [B, blk, Hkv*D] -> [B, Hkv, blk, D]."""
        blk = fused.shape[1]
        return fused.reshape(b, blk, hkv, d).transpose(0, 2, 1, 3)

    pblk_q = qz.pack_unit(cap) // 2   # packed rows per nibble half-unit

    def _msb_values(i):
        """Signed 4-bit values of token block i, as f32 [B, blk, Hkv*D]."""
        if nblk >= 2 and block_size <= pblk_q and pblk_q % block_size == 0:
            # block-local split-token packing (qz.pack_unit): a token
            # block lies entirely in one unit's hi or lo nibbles — only
            # one packed slice is ever fetched (0.5 B/elem moved)
            start_tok = i * block_size
            r = start_tok % (2 * pblk_q)
            is_hi = r < pblk_q
            row0 = (start_tok // (2 * pblk_q)) * pblk_q + \
                jnp.where(is_hi, r, r - pblk_q)
            pk = jax.lax.dynamic_slice_in_dim(
                k_quant.msb, row0, block_size, axis=1).astype(jnp.int32)
            nib = jnp.where(is_hi, pk >> 4, pk & 0xF)
            return (nib - 8).astype(jnp.float32)   # nibbles store k4 + 8
        return _block(qz.unpack_msb(k_quant.msb), i, block_size, 1
                      ).astype(jnp.float32)           # tiny caps only

    qr4 = qz.pack_unit(cap) // 4   # packed rows per 2-bit quarter-unit

    def _lsb2_values(i):
        """Unsigned 2-bit values of token block i, f32 [B, blk, Hkv*D]."""
        if block_size <= qr4 and qr4 % block_size == 0:
            # block-local unit layout (qz.pack_lsb2): the block lies in
            # one quarter of one unit — one row slice, one field shift
            start_tok = i * block_size
            r = start_tok % (4 * qr4)
            qi = r // qr4
            row0 = (start_tok // (4 * qr4)) * qr4 + (r % qr4)
            pk2 = jax.lax.dynamic_slice_in_dim(
                k_quant.lsb2, row0, block_size, axis=1).astype(jnp.int32)
            shift = 6 - 2 * qi
            return ((pk2 >> shift) & 0x3).astype(jnp.float32)
        return _block(qz.unpack_lsb2(k_quant.lsb2), i, block_size, 1
                      ).astype(jnp.float32)

    def k_block(i, plane):
        """Dequantized (+rotated) K block [B, Hkv, blk, D]."""
        if quant_enabled and plane == "msb" and p1_idx is not None:
            # per-layer profile: runtime plane-set selection
            deq6 = ((lambda: _msb_values(i) * 16.0 + _lsb2_values(i) * 4.0
                     + qz.MIDPOINT6) if k_quant.lsb2 is not None
                    else lambda: _msb_values(i) * 16.0 + qz.MSB_MIDPOINT)
            kb = jax.lax.switch(p1_idx, [
                lambda: _msb_values(i) * 16.0 + qz.MSB_MIDPOINT,
                deq6,
                lambda: _block(k_quant.full, i, block_size, 1
                               ).astype(jnp.float32),
            ])
        elif quant_enabled and plane == "msb":
            kb = _msb_values(i) * 16.0 + qz.MSB_MIDPOINT
        else:
            kb = _block(k_quant.full, i, block_size, 1).astype(jnp.float32)
        kb = _head_major(kb)                          # [B, Hkv, blk, D]
        sc = _block(k_quant.scale, i, block_size, 2)  # [B, Hkv, blk]
        kb = kb * sc[..., None]
        if use_rope:
            pos = i * block_size + jnp.arange(block_size)
            kb = rope_ops.apply_rope(kb, cos, sin, pos)
        return kb

    col = jnp.arange(block_size)

    def scores_block(i, plane):
        kb = k_block(i, plane)                        # [B, Hkv, blk, D]
        kb = _repeat_kv(kb, group)                    # [B, Hq, blk, D]
        sc = jnp.einsum("bhqd,bhcd->bhqc", qf, kb,
                        preferred_element_type=jnp.float32) * sm_scale
        pos_k = i * block_size + col                  # [blk]
        valid = pos_k[None, :] < lengths[:, None]     # [B, blk]
        causal = pos_k[None, None, :] <= q_positions[:, :, None]
        mask = (valid[:, None, None, :]
                & causal[:, None, :, :])              # [B, 1, S, blk]
        return jnp.where(mask, sc, MASK_VALUE), mask

    # blocks past the live prefix are fully masked — every pass skips
    # them via a traced loop bound (a 2k prompt in a 16k cache otherwise
    # spends 7/8 of its block matmuls on dead columns, in BOTH engines)
    n_live = jnp.minimum(
        jnp.asarray(nblk, jnp.int32),
        -(-jnp.max(lengths).astype(jnp.int32) // block_size))

    # pass I: row maxes, denominators, and (when V-pruning) the
    # per-(query, v-block) mass — all row-space quantities, so they ride
    # the flash rescaling recurrence; the block's own max prob is then
    # exp(m - m)/den == 1/den, so the requant signal is FREE.  This
    # halves the score recomputations vs a separate reduce pass.
    def stats_pass(plane):
        def body(i, carry):
            m, den, mass_un = carry
            sc, mask = scores_block(i, plane)
            blk_max = jnp.max(sc, axis=-1)
            m_new = jnp.maximum(m, blk_max)
            r = jnp.exp(m - m_new)
            e = jnp.where(mask, jnp.exp(sc - m_new[..., None]), 0.0)
            den = den * r + e.sum(-1)
            if do_vprune:
                if hm is not None:
                    e = jnp.where(hm[:, :, None, None], e, 0.0)
                bm = e.reshape(b, hq, s, block_size // v_block_size,
                               v_block_size).sum(-1)
                # earlier blocks' sums rescale; block i's columns were
                # zero until now, so the update is a plain write
                mass_un = jax.lax.dynamic_update_slice_in_dim(
                    mass_un * r[..., None], bm,
                    i * (block_size // v_block_size), axis=-1)
            return (m_new, den, mass_un)
        mass_cols = nvb if do_vprune else 1
        init = (jnp.full((b, hq, s), MASK_VALUE, jnp.float32),
                jnp.zeros((b, hq, s), jnp.float32),
                jnp.zeros((b, hq, s, mass_cols), jnp.float32))
        m, den, mass_un = jax.lax.fori_loop(0, n_live, body, init)
        den = jnp.maximum(den, 1e-30)
        # max_c p == exp(m - m)/den == 1/den (rows with no live column
        # keep m == MASK_VALUE -> report 0, matching a zero prob row)
        maxp_rows = jnp.where(m > MASK_VALUE / 2, 1.0 / den, 0.0)
        maxp = jnp.max(maxp_rows, axis=-1)             # [B, Hq]
        mass = mass_un / den[..., None] if do_vprune else None
        return m, den, maxp, mass

    def probs_block(i, plane, m, den):
        sc, mask = scores_block(i, plane)
        p = jnp.where(mask, jnp.exp(sc - m[..., None]), 0.0) \
            / den[..., None]
        return p, sc, mask

    # pass II over blocks computing: max_prob, importance cols, V-block
    # mass, and (after the keep decision) the PV accumulation.  To keep one
    # code path, accumulate mass + imp + maxp first, then a third pass for
    # PV with the keep mask (V pruning needs the global mass ranking).
    def pv_pass(plane, m, den, keep_blk):
        """P·V + importance epilogue in one streamed pass.
        keep_blk: [B, Hq, S, nvb] keep mask (or None)."""
        def body(i, carry):
            acc, imp = carry
            p, sc, mask = probs_block(i, plane, m, den)
            if hm is not None:
                p = jnp.where(hm[:, :, None, None], p, 0.0)
                sc = jnp.where(hm[:, :, None, None], sc, 0.0)
            if importance_kind == "prob":
                contrib = p.sum(axis=-2)              # [B, Hq, blk]
            else:
                contrib = jnp.where(mask, sc, 0.0).sum(axis=-2)
            imp = jax.lax.dynamic_update_slice_in_dim(
                imp, contrib, i * block_size, axis=-1)
            if keep_blk is not None:
                kb = jax.lax.dynamic_slice_in_dim(
                    keep_blk, i * (block_size // v_block_size),
                    block_size // v_block_size, axis=-1)
                kcols = jnp.repeat(kb, v_block_size, axis=-1)
                p = p * kcols
            vb = _repeat_kv(
                _head_major(_block(v_quant.full, i, block_size, 1)
                            .astype(jnp.float32))
                * _block(v_quant.scale, i, block_size, 2)[..., None],
                group)
            acc = acc + jnp.einsum("bhqc,bhcd->bhqd", p, vb,
                                   preferred_element_type=jnp.float32)
            return (acc, imp)
        init = (jnp.zeros((b, hq, s, d), jnp.float32),
                jnp.zeros((b, hq, cap), jnp.float32))
        return jax.lax.fori_loop(0, n_live, body, init)

    # ---- pass 1 plane selection + requant ---------------------------------
    plane1 = "msb" if quant_enabled else "full"
    m1, den1, maxp1, mass1 = stats_pass(plane1)

    # requant decision on pass-1 max prob (pre head-mask in the reference;
    # with a dead group the reference zeroes its stats afterwards)
    max_prob = _group_reduce(maxp1, hkv, lambda x, a: x.max(axis=a))
    if do_requant:
        need = max_prob < requant_threshold            # [B, Hkv]
        if pass1_bits is not None:
            # an 8-bit pass-1 already read the full plane
            need = need & (jnp.asarray(pass1_bits, jnp.int32) < 8)
        m2, den2, maxp2, mass2 = stats_pass("full")
        sel_q = _repeat_kv(need[..., None], group)     # [B, Hq, 1]
        m = jnp.where(sel_q, m2, m1)
        den = jnp.where(sel_q, den2, den1)
        mass = (jnp.where(sel_q[..., None], mass2, mass1)
                if do_vprune else None)
        plane_sel = need                               # [B, Hkv] bool
    else:
        need = jnp.zeros((b, hkv), dtype=bool)
        m, den, mass = m1, den1, mass1
        plane_sel = None

    # ---- head pruning adjustments ----------------------------------------
    if hm is not None:
        group_alive = _group_reduce(hm, hkv, lambda x, a: x.any(axis=a))
        max_prob = jnp.where(group_alive, max_prob, 0.0)
        need = need & group_alive

    # ---- local V pruning keep mask ---------------------------------------
    keep_blk = None
    if do_vprune:
        from spatten_tpu.ops.attention_ref import kth_block_mass
        kth = kth_block_mass(mass, v_keep, v_block_size)
        keep_blk = (mass >= kth).astype(jnp.float32)   # [B, Hq, S, nvb]

    # ---- P·V + importance -------------------------------------------------
    if plane_sel is not None:
        # both-plane PV with per-group plane choice: probabilities differ
        # only via (m, den, scores); pv_pass recomputes scores per plane —
        # run it per plane and select (flagged groups are typically few;
        # the extra pass streams, it does not materialize)
        out1, imp1 = pv_pass("msb", m1, den1, keep_blk)
        out2, imp2 = pv_pass("full", m2, den2, keep_blk)
        sel = _repeat_kv(need[..., None, None], group)
        out = jnp.where(sel, out2, out1)
        imp = jnp.where(sel[..., 0], imp2, imp1)
    else:
        out, imp = pv_pass(plane1, m, den, keep_blk)

    imp_kv = _group_reduce(imp, hkv, lambda x, a: x.sum(axis=a))
    stats = AttentionStats(
        max_prob=max_prob,
        need_requant=need,
        importance_delta=imp_kv,
        probs=None,
    )
    return out, stats
