"""Fused Pallas TPU decode-attention — the SpAtten pipeline on MXU.

Two phases, mirroring the reference pipeline split at the TopK stage
(SpAttenController.scala: key side :79-366, value side :588-785):

**Phase A — Pallas kernel** (grid = (batch, kv-head packs)):
  * length-gated DMA of the packed 4-bit MSB K plane (0.5 B/elem; only
    rows < pruned length are ever fetched — the cascade-pruning payoff),
  * per-head QK^T on MXU + masked softmax (f32),
  * requant decision (max softmax prob < τ, RequantDecision.scala:69-76)
    with an @pl.when-gated refetch of the int8 plane and in-place recompute
    (the stageRequantizeOrRelease loop as a second pass over one head),
  * head pruning: per-head early exit — pruned heads never DMA or compute
    ("pruned heads never issue requests"),
  * importance epilogue (the cascade/head-pruning signal),
  * local V top-k at block granularity: exact k-th order statistic by
    all-pairs counting (replaces the QuickSelect FSM), emitting V-pruned
    probabilities.

**Phase B — XLA**: token-index gather of only the surviving V blocks
(`take_along_axis` = the score_buf-indexed MatrixFetcher gather) and the
P·V matmul on the compacted rows.  HBM V traffic is proportional to
`value_fetch_num`, exactly as in the hardware.

Numerics match `ops.attention_ref.spatten_attention_reference` (tests
compare in interpret mode).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops.attention_ref import MASK_VALUE, AttentionStats

_NEG = -3.0e38


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _kth_largest(mass: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest (counting duplicates) along the last axis.

    All-pairs counting on the VPU: c_i = #{j : mass_j >= mass_i}; the k-th
    order statistic is max{ mass_i : c_i >= k }.  N (num V blocks) is
    small, so the O(N^2) compare is trivial — this replaces the reference's
    QuickSelect FSM (utils/QuickSelect.scala) with one vector op.
    """
    ge = mass[..., None, :] >= mass[..., :, None]       # [..., N, N]
    count = jnp.sum(ge.astype(jnp.int32), axis=-1)
    cand = jnp.where(count >= k, mass, _NEG)
    return jnp.max(cand, axis=-1)


def _even_blocks(total: int, target: int) -> Tuple[int, int]:
    """(block_rows, num_blocks): num_blocks * block_rows == total,
    block_rows <= ~target."""
    nb = max(1, -(-total // target))
    while total % nb:
        nb += 1
    return total // nb, nb


def _heads_per_program(hkv: int, cap: int, head_dim: int) -> int:
    """Largest divisor of hkv (<=8) keeping the packed-plane scratch
    under ~4 MB (the rest of the kernel is row-blocked, so per-head VMEM
    is bounded regardless of capacity)."""
    budget = 4 * 1024 * 1024
    best = 1
    for h in range(1, min(hkv, 8) + 1):
        if hkv % h:
            continue
        if h * (cap // 2) * head_dim <= budget:   # msb uint8 scratch
            best = h
    return best


def _make_kernel(*, cap: int, group: int, head_dim: int, hpp: int,
                 sm_scale: float, requant_threshold: float,
                 quant_enabled: bool, v_keep: int, v_block: int,
                 importance_kind: str, use_rope: bool,
                 accumulate_importance: bool, quantize_queries: bool):
    half = cap // 2
    # all K processing is row-blocked in token blocks of `pblk` rows (also
    # the DMA granule), so per-program VMEM stays bounded at any capacity;
    # only the [G, C] score/prob vectors are materialized whole.
    pblk, num_pblk = _even_blocks(half, 1024)
    num_tblk = 2 * num_pblk                        # token blocks over cap
    num_vblk = cap // v_block
    keep_blocks = max(1, -(-v_keep // v_block)) if v_keep > 0 else 0
    do_vprune = 0 < v_keep and keep_blocks < num_vblk
    if do_vprune:
        assert pblk % v_block == 0, (
            f"token block {pblk} must be a multiple of v_block {v_block}")
    nb_local = pblk // v_block if do_vprune else 0
    do_requant = quant_enabled and requant_threshold > 0.0
    int_dots = quantize_queries and not use_rope

    def kernel(
        # scalar prefetch
        lengths_ref,                   # SMEM int32 [B]
        # VMEM-streamed inputs
        q_ref,                         # [1, HPP, G, D] f32
        kscale_ref,                    # [1, HPP, 1, C] f32
        cos_ref,                       # [C, D//2] f32 (HF tables duplicate
        sin_ref,                       # [C, D//2] f32  halves; we re-dup
                                       #                in VMEM, halving HBM
                                       #                + VMEM footprint)
        hmask_ref,                     # [1, HPP, 1, G] f32 (1=alive)
        imp_in_ref,                    # [1, HPP, 1, C] f32 (accumulator,
                                       #   aliased in-place with imp_ref)
        # HBM (manually DMA'd, length- and liveness-gated)
        kmsb_hbm,                      # [B, Hkv, C//2, D] uint8 (packed)
        kfull_hbm,                     # [B, Hkv, C, D] int8
        # outputs
        probs_ref,                     # [1, HPP, G, C] f32 (V-pruned)
        maxp_ref,                      # [1, HPP, 1, 128] f32
        need_ref,                      # [1, HPP, 1, 128] int32
        imp_ref,                       # [1, HPP, 1, C] f32
        # scratch
        kmsb_scr,                      # [HPP, C//2, D] uint8
        kfull_scr,                     # [C, D] int8 (one head at a time)
        scores_scr,                    # [G, C] f32 (one head at a time)
        kmsb_sem,                      # DMA sems (HPP, num_pblk)
        kfull_sem,                     # DMA sems (num_tblk,)
    ):
        b = pl.program_id(0)
        jpack = pl.program_id(1)
        h0 = jpack * hpp
        length = lengths_ref[b]
        packed_limit = jnp.minimum(length, half)

        col = jax.lax.broadcasted_iota(jnp.int32, (group, cap), 1)
        valid = col < length                          # [G, C]

        alive = [jnp.max(hmask_ref[0, h, 0, :]) > 0.0 for h in range(hpp)]

        # ---- start all alive heads' MSB DMAs up front (overlap) ----------
        def msb_dma(h, i):
            return pltpu.make_async_copy(
                kmsb_hbm.at[b, h0 + h, pl.ds(i * pblk, pblk), :],
                kmsb_scr.at[h, pl.ds(i * pblk, pblk), :],
                kmsb_sem.at[h, i],
            )

        if quant_enabled:
            for h in range(hpp):
                @pl.when(alive[h])
                def _(h=h):
                    def start(i, _):
                        @pl.when(i * pblk < packed_limit)
                        def _():
                            msb_dma(h, i).start()
                        return 0
                    jax.lax.fori_loop(0, num_pblk, start, 0)

        def fetch_kfull(h):
            """Length-gated copy of head h's int8 plane into kfull_scr."""
            def phase(do_wait):
                def body(i, _):
                    @pl.when(i * pblk < length)
                    def _():
                        cp = pltpu.make_async_copy(
                            kfull_hbm.at[b, h0 + h,
                                         pl.ds(i * pblk, pblk), :],
                            kfull_scr.at[pl.ds(i * pblk, pblk), :],
                            kfull_sem.at[i],
                        )
                        if do_wait:
                            cp.wait()
                        else:
                            cp.start()
                    return 0
                jax.lax.fori_loop(0, num_tblk, body, 0)
            phase(False)
            phase(True)

        def rope_block(kb, t):
            """Rotate a [pblk, D] block at cache positions of block t."""
            if not use_rope:
                return kb
            c = cos_ref[pl.ds(t * pblk, pblk), :]     # [pblk, D//2]
            s = sin_ref[pl.ds(t * pblk, pblk), :]
            cf = jnp.concatenate([c, c], axis=-1)
            sf = jnp.concatenate([s, s], axis=-1)
            return kb * cf + _rotate_half(kb) * sf

        def blocked_scores(get_kblk, q, acc_dtype=jnp.float32):
            """Write q @ K_t^T (raw dot) into scores_scr, per block.

            Blocks at/after `length` are skipped entirely (no decode, no
            rope, no matmul) — compute is length-gated like the DMA.
            Stale values beyond `length` are neutralized by `valid`.
            Per-column scales / offsets / sm_scale are applied in
            `softmax_from_scores` (dequantization folded into the score
            epilogue: kscale_c·(16·(q·k4)_c + 7.5·Σq_g) — O(G·C) instead
            of O(C·D) elementwise work).  With int8 q and K the dot runs
            on the integer MXU (acc_dtype=int32) — the reference computes
            on fixed-point operands too (12-bit, SpAtten.scala:94-120)."""
            for t in range(num_tblk):
                @pl.when(t * pblk < length)
                def _(t=t):
                    kb = rope_block(get_kblk(t), t)   # [pblk, D]
                    s_blk = jax.lax.dot_general(
                        q, kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=acc_dtype,
                    )                                 # [G, pblk]
                    scores_scr[:, pl.ds(t * pblk, pblk)] = \
                        s_blk.astype(jnp.float32)

        def softmax_from_scores(colscale, coloffset, rowscale=1.0):
            """Affine epilogue + masked softmax.  colscale/coloffset are
            [C] vectors (or scalars), rowscale [G, 1] (or scalar); the
            scaled scores are written back to scores_scr for the
            presoftmax-importance consumer."""
            s = (scores_scr[:] * rowscale) * colscale + coloffset
            scores_scr[:] = s
            s_masked = jnp.where(valid, s, MASK_VALUE)
            m = jnp.max(s_masked, axis=-1, keepdims=True)
            e = jnp.exp(s_masked - m)
            e = jnp.where(valid, e, 0.0)
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            return e / denom                          # [G, C]

        if do_vprune:
            # block-aggregation 0/1 matrix for ONE token block (the same
            # for every block): agg_local[r, j] = (r // v_block == j)
            row_blk = jax.lax.broadcasted_iota(
                jnp.int32, (pblk, nb_local), 0) // v_block
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (pblk, nb_local), 1)
            agg_local = (row_blk == col_ids).astype(jnp.float32)

        # ---- per-head pipeline -------------------------------------------
        for h in range(hpp):
            hmask_h = hmask_ref[0, h, 0, :]           # [G]

            @pl.when(jnp.logical_not(alive[h]))
            def _dead(h=h):
                probs_ref[0, h] = jnp.zeros((group, cap),
                                            probs_ref.dtype)
                maxp_ref[0, h, 0, :] = jnp.zeros((128,), jnp.float32)
                need_ref[0, h, 0, :] = jnp.zeros((128,), jnp.int32)
                if accumulate_importance:
                    # dead head adds nothing; carry the accumulator through
                    imp_ref[0, h, 0] = imp_in_ref[0, h, 0]
                else:
                    imp_ref[0, h, 0] = jnp.zeros((cap,), jnp.float32)

            @pl.when(alive[h])
            def _live(h=h, hmask_h=hmask_h):
                q = q_ref[0, h]                       # [G, D] f32
                kscale = kscale_ref[0, h, 0]          # [C]

                # With rope off, K dequantization folds into the score
                # epilogue (kblk returns raw int values); with rope on,
                # the rotation is value-dependent so blocks dequantize in
                # full and the epilogue is just sm_scale.
                fold = not use_rope

                if int_dots:
                    # per-row int8 query quantization: the integer MXU
                    # carries the dot, scales move to the epilogue
                    qamax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
                    qscale = jnp.maximum(qamax, 1e-20) / 127.0   # [G, 1]
                    q_mat = jnp.clip(jnp.round(q / qscale),
                                     -127, 127).astype(jnp.int8)
                    qsum = jnp.sum(q_mat.astype(jnp.int32), axis=-1,
                                   keepdims=True).astype(jnp.float32)
                    rowscale = qscale
                    acc = jnp.int32
                else:
                    q_mat = q
                    qsum = jnp.sum(q, axis=-1, keepdims=True)    # [G, 1]
                    rowscale = 1.0
                    acc = jnp.float32

                def kblk_full(t):
                    rows = kfull_scr[pl.ds(t * pblk, pblk), :]
                    if int_dots:
                        return rows                    # int8, raw
                    raw = rows.astype(jnp.float32)
                    if fold:
                        return raw
                    sc = kscale[t * pblk:(t + 1) * pblk]
                    return raw * sc[:, None]

                full_scale = (kscale * sm_scale) if fold else sm_scale
                full_offset = 0.0

                if quant_enabled:
                    def wait(i, _):
                        @pl.when(i * pblk < packed_limit)
                        def _():
                            msb_dma(h, i).wait()
                        return 0
                    jax.lax.fori_loop(0, num_pblk, wait, 0)

                    def kblk_msb(t):
                        # split-token packing: token block t < num_pblk is
                        # the hi nibble of packed block t; else the lo
                        # nibble of packed block t - num_pblk.  (int32
                        # nibble math: Mosaic has no int8 vector shifts.)
                        p = t if t < num_pblk else t - num_pblk
                        rows = kmsb_scr[h, pl.ds(p * pblk, pblk), :]
                        nib = rows.astype(jnp.int32)
                        nib = (nib >> 4) if t < num_pblk else (nib & 0xF)
                        k4i = (nib ^ 8) - 8
                        if int_dots:
                            return k4i.astype(jnp.int8)
                        k4 = k4i.astype(jnp.float32)
                        if fold:
                            return k4
                        sc = kscale[t * pblk:(t + 1) * pblk]
                        return (k4 * 16.0 + qz.MSB_MIDPOINT) * sc[:, None]

                    blocked_scores(kblk_msb, q_mat, acc)
                    if fold:
                        p1_scale = kscale * (16.0 * sm_scale)
                        p1_offset = (rowscale * qsum) * (
                            kscale * (qz.MSB_MIDPOINT * sm_scale))[None, :]
                    else:
                        p1_scale, p1_offset = sm_scale, 0.0
                else:
                    fetch_kfull(h)
                    blocked_scores(kblk_full, q_mat, acc)
                    p1_scale, p1_offset = full_scale, full_offset

                probs1 = softmax_from_scores(p1_scale, p1_offset, rowscale)

                # requant decision + conditional recompute --------------
                max_prob = jnp.max(probs1)
                maxp_ref[0, h, 0, :] = jnp.full((128,), max_prob,
                                                jnp.float32)
                probs_ref[0, h] = probs1.astype(probs_ref.dtype)
                if do_requant:
                    need = max_prob < requant_threshold
                    need_ref[0, h, 0, :] = jnp.full(
                        (128,), need.astype(jnp.int32))

                    @pl.when(need)
                    def _():
                        fetch_kfull(h)
                        blocked_scores(kblk_full, q_mat, acc)
                        probs_ref[0, h] = softmax_from_scores(
                            full_scale, full_offset, rowscale
                        ).astype(probs_ref.dtype)
                else:
                    need_ref[0, h, 0, :] = jnp.zeros((128,), jnp.int32)

                probs = probs_ref[0, h].astype(jnp.float32) * \
                    hmask_h[:, None]
                probs_ref[0, h] = probs.astype(probs_ref.dtype)

                # importance epilogue ----------------------------------
                if importance_kind == "prob":
                    delta = jnp.sum(probs, axis=0)
                else:                                 # "presoftmax"
                    delta = jnp.sum(
                        jnp.where(valid, scores_scr[:], 0.0) *
                        hmask_h[:, None], axis=0)
                if accumulate_importance:
                    # fused accumulate (in-place via aliasing): the slot
                    # of the just-appended token (length-1) starts fresh
                    prev = jnp.where(col[0] == length - 1, 0.0,
                                     imp_in_ref[0, h, 0])
                    imp_ref[0, h, 0] = prev + delta
                else:
                    imp_ref[0, h, 0] = delta

                # local V pruning: zero the probabilities of dropped
                # blocks (phase B fetches only surviving blocks) -------
                if do_vprune:
                    mass = jnp.concatenate([
                        jax.lax.dot_general(
                            probs[:, t * pblk:(t + 1) * pblk], agg_local,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for t in range(num_tblk)
                    ], axis=-1)                       # [G, num_vblk]
                    kth = _kth_largest(mass, keep_blocks)     # [G]
                    keep_gb = (mass >= kth[:, None]).astype(jnp.float32)
                    for t in range(num_tblk):
                        keep_local = keep_gb[:, t * nb_local:
                                             (t + 1) * nb_local]
                        keep_cols = jax.lax.dot_general(
                            keep_local, agg_local,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [G,pblk]
                        probs_ref[0, h, :, pl.ds(t * pblk, pblk)] = (
                            probs[:, t * pblk:(t + 1) * pblk] * keep_cols
                        ).astype(probs_ref.dtype)

    return kernel, (num_pblk, num_tblk)


def decode_attention(
    q: jax.Array,                  # [B, Hq, 1, D] f32/bf16 (rotated queries)
    k_quant: qz.QuantizedKV,       # planes [B, Hkv, C(/2), D]
    v_quant: qz.QuantizedKV,
    cos: jax.Array,                # [C, D]
    sin: jax.Array,
    lengths: jax.Array,            # [B] int32 (valid tokens incl. query)
    *,
    sm_scale: float,
    requant_threshold: float = 0.0,
    quant_enabled: bool = True,
    v_keep: int = 0,
    v_block_size: int = 16,
    head_mask: Optional[jax.Array] = None,     # [Hq] or [B, Hq] bool
    importance_kind: str = "prob",
    use_rope: bool = True,
    quantize_queries: bool = False,  # int8 queries + integer MXU dots
                                     # (requires use_rope=False)
    importance_in: Optional[jax.Array] = None,  # [B, Hkv, C] accumulator
    probs_dtype=jnp.float32,   # bf16 halves the phase-A->B transport (the
                               # per-layer [B,Hkv,G,C] HBM round trip) at
                               # ~1e-3 relative output error
    interpret: bool = False,
) -> Tuple[jax.Array, AttentionStats]:
    """Single-token (decode) SpAtten attention.  Returns (out [B,Hq,1,D],
    stats) matching `spatten_attention_reference` for q_len == 1.

    When `importance_in` is given, the cascade accumulation is fused into
    the kernel (in-place via buffer aliasing): `stats.importance_delta`
    then holds the UPDATED accumulator (with the new token's slot reset
    before accumulation), halving the accumulator's HBM traffic."""
    b, hq, q_len, d = q.shape
    assert q_len == 1, "decode kernel is single-query; use the reference/" \
        "prefill path for q_len > 1"
    hkv = k_quant.full.shape[1]
    cap = k_quant.full.shape[2]
    group = hq // hkv
    assert cap % v_block_size == 0
    hpp = _heads_per_program(hkv, cap, d)

    accumulate = importance_in is not None
    kernel, (num_pblk, num_tblk) = _make_kernel(
        cap=cap, group=group, head_dim=d, hpp=hpp, sm_scale=sm_scale,
        requant_threshold=requant_threshold, quant_enabled=quant_enabled,
        v_keep=v_keep, v_block=v_block_size,
        importance_kind=importance_kind, use_rope=use_rope,
        accumulate_importance=accumulate,
        quantize_queries=quantize_queries,
    )

    qg = q.astype(jnp.float32).reshape(b, hkv, group, d)
    if head_mask is None:
        hm = jnp.ones((b, hkv, 1, group), jnp.float32)
    else:
        hmb = head_mask if head_mask.ndim == 2 else \
            jnp.broadcast_to(head_mask[None], (b, hq))
        hm = hmb.astype(jnp.float32).reshape(b, hkv, 1, group)

    kscale = k_quant.scale.reshape(b, hkv, 1, cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv // hpp),
        in_specs=[
            pl.BlockSpec((1, hpp, group, d), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpp, 1, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d // 2), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d // 2), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpp, 1, group), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpp, 1, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),     # importance in
            pl.BlockSpec(memory_space=pl.ANY),         # k msb (HBM)
            pl.BlockSpec(memory_space=pl.ANY),         # k full (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, hpp, group, cap),
                         lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpp, 1, 128), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpp, 1, 128), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpp, 1, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hpp, cap // 2, d), jnp.uint8),
            pltpu.VMEM((cap, d), jnp.int8),
            pltpu.VMEM((group, cap), jnp.float32),
            pltpu.SemaphoreType.DMA((hpp, num_pblk)),
            pltpu.SemaphoreType.DMA((num_tblk,)),
        ],
    )

    if accumulate:
        imp_in = importance_in.astype(jnp.float32).reshape(b, hkv, 1, cap)
        # operand index counts the scalar-prefetch arg too: lengths=0,
        # q=1, kscale=2, cos=3, sin=4, hmask=5, imp_in=6; output imp=3
        aliases = {6: 3}
    else:
        imp_in = jnp.zeros((b, hkv, 1, cap), jnp.float32)
        aliases = {}
    probs_pv, maxp, need, imp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, group, cap), probs_dtype),
            jax.ShapeDtypeStruct((b, hkv, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, hkv, 1, cap), jnp.float32),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        qg, kscale,
        cos[:, : d // 2].astype(jnp.float32),
        sin[:, : d // 2].astype(jnp.float32), hm, imp_in,
        k_quant.msb, k_quant.full,
    )

    # ---- phase B: fetch surviving V blocks by index + P·V ----------------
    out = _pv_kernel(probs_pv, v_quant, lengths, v_keep=v_keep,
                     v_block_size=v_block_size, group=group,
                     interpret=interpret)

    stats = AttentionStats(
        max_prob=maxp[..., 0, 0],
        need_requant=need[..., 0, 0].astype(bool),
        importance_delta=imp.reshape(b, hkv, cap),
        probs=None,
    )
    return out.reshape(b, hq, 1, d), stats


def _pv_kernel(probs_pv: jax.Array, v_quant: qz.QuantizedKV,
               lengths: jax.Array, *, v_keep: int, v_block_size: int,
               group: int, interpret: bool) -> jax.Array:
    """P·V fetching only the surviving V blocks, by index.

    The TPU analog of the reference's score_buf-indexed V gather
    (stageFetchValMat, SpAttenController.scala:668-736): XLA computes the
    per-(seq, kv_head) list of surviving block ids (a tiny top-k over block
    masses), which is scalar-prefetched into a Pallas kernel that DMAs
    exactly those blocks from HBM into their original VMEM offsets and runs
    one [G, C] x [C, D] MXU matmul.  Un-fetched rows hold stale garbage,
    but their probabilities are exactly zero, so they contribute nothing.

    Without V pruning the index list is simply every in-length block —
    giving the dense path length-gated fetch for free.
    """
    b, hkv, g, cap = probs_pv.shape
    d = v_quant.full.shape[-1]
    vblk = v_block_size
    nb = cap // vblk
    keep_blocks = max(1, -(-v_keep // vblk)) if v_keep > 0 else 0
    do_vprune = 0 < v_keep and keep_blocks < nb

    blk_range = jnp.arange(nb, dtype=jnp.int32)
    if do_vprune:
        # union (over the GQA group) of surviving blocks, ranked by mass;
        # +4 slack absorbs ties at the k-th mass (a tied block beyond the
        # slack loses only its tiny probability mass)
        ub = min(nb, group * keep_blocks + 4)
        mass_any = probs_pv.sum(axis=2).reshape(b, hkv, nb, vblk).sum(-1)
        val, idx = jax.lax.top_k(mass_any, ub)           # [B, Hkv, ub]
        blk_idx = jnp.where(val > 0, idx, -1).astype(jnp.int32)
    else:
        ub = nb
        in_len = (blk_range[None, :] * vblk) < lengths[:, None]   # [B, nb]
        blk_idx = jnp.where(in_len, blk_range[None, :], -1)
        blk_idx = jnp.broadcast_to(blk_idx[:, None], (b, hkv, nb)
                                   ).astype(jnp.int32)

    def kernel(blkidx_ref,             # SMEM int32 [B, Hkv, UB]
               probs_ref,              # [1, 1, G, C] f32
               vscale_ref,             # [1, 1, 1, C] f32
               vfull_hbm,              # [B, Hkv, C, D] int8 (ANY)
               out_ref,                # [1, 1, G, D] f32
               v_scr,                  # [C, D] int8
               sems):                  # DMA sems (UB,)
        bb = pl.program_id(0)
        hh = pl.program_id(1)

        def dma(s, idx):
            return pltpu.make_async_copy(
                vfull_hbm.at[bb, hh, pl.ds(idx * vblk, vblk), :],
                v_scr.at[pl.ds(idx * vblk, vblk), :],
                sems.at[s],
            )

        def phase(do_wait):
            def body(s, _):
                idx = blkidx_ref[bb, hh, s]

                @pl.when(idx >= 0)
                def _():
                    cp = dma(s, idx)
                    if do_wait:
                        cp.wait()
                    else:
                        cp.start()
                return 0
            jax.lax.fori_loop(0, ub, body, 0)

        if do_vprune:
            # tie overflow past `ub` can leave a surviving block unfetched
            # with nonzero probability; zero-init the scratch so unfetched
            # always means a zero contribution (never stale VMEM)
            v_scr[...] = jnp.zeros_like(v_scr)
        phase(False)
        phase(True)

        v_deq = v_scr[:].astype(jnp.float32) * \
            vscale_ref[0, 0, 0][:, None]
        out_ref[0, 0] = jax.lax.dot_general(
            probs_ref[0, 0].astype(jnp.float32), v_deq,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    vscale = v_quant.scale.reshape(b, hkv, 1, cap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, j, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cap, d), jnp.int8),
            pltpu.SemaphoreType.DMA((ub,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), jnp.float32),
        interpret=interpret,
    )(blk_idx, probs_pv, vscale, v_quant.full)
    return out
