"""Single-kernel SpAtten decode step: append + QK + softmax + requant +
importance + V-prune + P·V, all in VMEM.

Round-1 split the pipeline at the TopK stage (phase A kernel -> HBM probs
round-trip -> phase B kernel) and appended the new token's KV row in XLA
(a vmapped dynamic_update_slice = batched scatter over the [L,B,Hkv,C,D]
planes).  Profiling on the real chip (tools/profile_decode.py) showed the
scatter alone cost more than all attention compute, and the probs
round-trip paid HBM for a tensor that never needed to leave the core.

This kernel is the whole reference pipeline in one pallas_call, mirroring
SpAttenController.scala's single 15-stage dataflow (:79-785):

  * append: quantizes the incoming K/V row in-kernel and DMAs it into the
    int8 plane + nibble-RMWs the packed 4-bit plane (the masked LSB/bit-
    plane write of Buffer.scala:78-83 / SpAttenController.scala:230-232);
    the caller aliases the cache planes so the write is truly in place.
  * phase A: length-gated MSB fetch, blocked QK^T on MXU, masked f32
    softmax, requant decision + @pl.when full-plane recompute
    (RequantDecision.scala:69-76 + stageRequantizeOrRelease loop),
    importance epilogue, per-head early-exit for pruned heads.
  * local V pruning + P·V: per-(query-head, block) exact top-k keep at
    block granularity (k-th order statistic by all-pairs counting replaces
    the QuickSelect FSM); only surviving blocks are DMA'd (the score_buf-
    indexed fetch of stageFetchValMat, :668-736) and the P·V matmul runs
    with probabilities that are *exactly* zero for dropped blocks — an
    unfetched block's stale scratch rows always multiply zero.
  * dense mode (quant_enabled=False, v_keep=0) length-gates both fetches
    and skips every pruning stage — the honest dense-int8 baseline runs
    the same kernel with the SpAtten machinery off.

Numerics match `ops.attention_ref.spatten_attention_reference` on the
post-append cache (tests compare in interpret mode).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops.attention_ref import MASK_VALUE, AttentionStats
from spatten_tpu.ops.decode_attention import (
    _even_blocks, _heads_per_program, _kth_largest, _rotate_half,
)


def _make_kernel(*, cap: int, group: int, head_dim: int, hpp: int,
                 sm_scale: float, requant_threshold: float,
                 quant_enabled: bool, v_keep: int, v_block: int,
                 importance_kind: str, use_rope: bool,
                 accumulate_importance: bool, quantize_queries: bool,
                 track_importance: bool, importance_ema: float = 1.0):
    half = cap // 2
    pblk, num_pblk = _even_blocks(half, 1024)
    num_tblk = 2 * num_pblk
    num_vblk = cap // v_block
    keep_blocks = max(1, -(-v_keep // v_block)) if v_keep > 0 else 0
    do_vprune = 0 < v_keep and keep_blocks < num_vblk
    if do_vprune:
        assert pblk % v_block == 0
    do_requant = quant_enabled and requant_threshold > 0.0
    int_dots = quantize_queries and not use_rope
    d = head_dim

    def kernel(*refs):
        it = iter(refs)
        lengths_ref = next(it)             # SMEM int32 [B]
        q_ref = next(it)                   # [1, HPP, G, D] f32
        knew_ref = next(it)                # [1, HPP, 1, D] f32 (raw row)
        vnew_ref = next(it)
        kscale_ref = next(it)              # [1, HPP, 1, C] f32 (aliased)
        vscale_ref = next(it)
        if use_rope:
            cos_ref = next(it)             # [C, D//2] f32
            sin_ref = next(it)
        hmask_ref = next(it)               # [1, HPP, 1, G] f32
        imp_in_ref = next(it)              # [1, HPP, 1, C or 128] f32
        kmsb_hbm = next(it)                # [B, Hkv, C//2, D] uint8 (ANY)
        kfull_hbm = next(it)               # [B, Hkv, C, D] int8 (ANY)
        vmsb_hbm = next(it)
        vfull_hbm = next(it)
        out_ref = next(it)                 # [1, HPP, G, D] f32
        maxp_ref = next(it)                # [1, HPP, 1, 128] f32
        need_ref = next(it)                # [1, HPP, 1, 128] int32
        imp_ref = next(it)                 # [1, HPP, 1, C or 128] f32
        kscale_out = next(it)              # aliased with kscale_ref
        vscale_out = next(it)
        kmsb_out = next(it)                # aliased planes (ANY)
        kfull_out = next(it)
        vmsb_out = next(it)
        vfull_out = next(it)
        # one whole (8, D) scratch per staged plane-row: HBM memrefs tile 8
        # sublanes, so a single-row DMA slice is unlowerable — instead we
        # read-modify-write the aligned 8-row block containing the target
        # row (each scratch is whole-ref DMA'd, no VMEM slicing either)
        row_scr = [next(it) for _ in range(2 * hpp)]   # (8, D) int8 each
        rmw_scr = [next(it) for _ in range(2 * hpp)]   # (8, D) uint8 each
        kmsb_scr = next(it)                # [HPP, C//2, D] uint8
        kfull_scr = next(it)               # [C, D] int8
        scores_scr = next(it)              # [G, C] f32
        probs_scr = next(it)               # [G, C] f32 (final probs)
        v_scr = next(it)                   # [C, D] int8
        app_sem = next(it)                 # DMA (4, HPP)
        kmsb_sem = next(it)                # DMA (HPP, num_pblk)
        kfull_sem = next(it)               # DMA (num_tblk,)
        v_sem = next(it)                   # DMA (num_vblk,)

        b = pl.program_id(0)
        jpack = pl.program_id(1)
        h0 = jpack * hpp
        length = lengths_ref[b]            # includes the new token
        idx = length - 1                   # slot of the appended row
        packed_limit = jnp.minimum(length, half)
        is_hi = idx < half
        prow = jnp.where(is_hi, idx, idx - half)

        col = jax.lax.broadcasted_iota(jnp.int32, (group, cap), 1)
        valid = col < length               # [G, C]
        col1 = col[0]                      # [C]

        # ------------------------------------------------------------------
        # APPEND: quantize the new rows in-kernel, RMW both planes.
        # Semantics bit-match qz.update_token (same round/clip/scale).
        # Every plane write is an aligned 8-row block read-modify-write:
        # read the block holding the target row, splice the new row in
        # with a sublane mask, write the block back.
        # ------------------------------------------------------------------
        fstart = (idx // 8) * 8            # full-plane block start
        pstart = (prow // 8) * 8           # packed-plane block start

        def full_slice(ref, h):
            return ref.at[b, h0 + h, pl.ds(fstart, 8), :]

        def packed_slice(ref, h):
            return ref.at[b, h0 + h, pl.ds(pstart, 8), :]

        # start all block reads up front
        for h in range(hpp):
            pltpu.make_async_copy(full_slice(kfull_out, h),
                                  row_scr[2 * h], app_sem.at[0, h]).start()
            pltpu.make_async_copy(full_slice(vfull_out, h),
                                  row_scr[2 * h + 1],
                                  app_sem.at[1, h]).start()
            pltpu.make_async_copy(packed_slice(kmsb_out, h),
                                  rmw_scr[2 * h], app_sem.at[2, h]).start()
            pltpu.make_async_copy(packed_slice(vmsb_out, h),
                                  rmw_scr[2 * h + 1],
                                  app_sem.at[3, h]).start()

        def quant_row(row):                # [1, D] f32 -> (int8 row, scale)
            amax = jnp.max(jnp.abs(row))
            scale = jnp.where(amax > 0, amax / 127.0, 1.0)
            q8 = jnp.clip(jnp.round(row / scale), -127, 127
                          ).astype(jnp.int8)
            return q8, scale

        new_rows = []                      # (kq8, vq8) per head
        new_scales = []                    # (kscale, vscale) per head
        for h in range(hpp):
            kq8, ks = quant_row(knew_ref[0, h].astype(jnp.float32))
            vq8, vs = quant_row(vnew_ref[0, h].astype(jnp.float32))
            new_rows.append((kq8, vq8))
            new_scales.append((ks, vs))
            # scale-row updates (VMEM blocks, aliased): the epilogue below
            # must see the new token's scale
            is_new = col1 == idx
            kscale_out[0, h, 0, :] = jnp.where(
                is_new, ks, kscale_ref[0, h, 0, :])
            vscale_out[0, h, 0, :] = jnp.where(
                is_new, vs, vscale_ref[0, h, 0, :])

        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
        fmask = sub8 == (idx - fstart)     # [8, D] row selector
        pmask = sub8 == (prow - pstart)

        def nib_of(q8row):                 # int8 [1, D] -> int32 nibble
            return ((q8row.astype(jnp.int32) >> 4) & 0xF)

        for h in range(hpp):
            kq8, vq8 = new_rows[h]
            # full planes: splice the int8 row into its block
            for scr_i, q8 in ((2 * h, kq8), (2 * h + 1, vq8)):
                sem = app_sem.at[scr_i % 2, h]
                ref = full_slice(kfull_out if scr_i % 2 == 0 else vfull_out,
                                 h)
                pltpu.make_async_copy(ref, row_scr[scr_i], sem).wait()
                blk = row_scr[scr_i][...]
                row_scr[scr_i][...] = jnp.where(
                    fmask, jnp.broadcast_to(q8, (8, d)), blk)
                pltpu.make_async_copy(row_scr[scr_i], ref, sem).start()
            # packed planes: splice only the owned nibble of the byte row
            for scr_i, q8 in ((2 * h, kq8), (2 * h + 1, vq8)):
                sem = app_sem.at[2 + scr_i % 2, h]
                ref = packed_slice(kmsb_out if scr_i % 2 == 0 else vmsb_out,
                                   h)
                pltpu.make_async_copy(ref, rmw_scr[scr_i], sem).wait()
                old = rmw_scr[scr_i][...].astype(jnp.int32)
                nib = jnp.broadcast_to(nib_of(q8), (8, d))
                newb = jnp.where(is_hi,
                                 (nib << 4) | (old & 0x0F),
                                 (old & jnp.int32(0xF0)) | nib)
                rmw_scr[scr_i][...] = jnp.where(pmask, newb, old
                                                ).astype(jnp.uint8)
                pltpu.make_async_copy(rmw_scr[scr_i], ref, sem).start()

        # all four planes' writes must land before any fetch may read them
        for h in range(hpp):
            pltpu.make_async_copy(full_slice(kfull_out, h),
                                  row_scr[2 * h], app_sem.at[0, h]).wait()
            pltpu.make_async_copy(full_slice(vfull_out, h),
                                  row_scr[2 * h + 1],
                                  app_sem.at[1, h]).wait()
            pltpu.make_async_copy(packed_slice(kmsb_out, h),
                                  rmw_scr[2 * h], app_sem.at[2, h]).wait()
            pltpu.make_async_copy(packed_slice(vmsb_out, h),
                                  rmw_scr[2 * h + 1],
                                  app_sem.at[3, h]).wait()

        # ------------------------------------------------------------------
        # Phase A machinery (per-head, as in the split kernel)
        # ------------------------------------------------------------------
        alive = [jnp.max(hmask_ref[0, h, 0, :]) > 0.0 for h in range(hpp)]

        def msb_dma(h, i):
            return pltpu.make_async_copy(
                kmsb_out.at[b, h0 + h, pl.ds(i * pblk, pblk), :],
                kmsb_scr.at[h, pl.ds(i * pblk, pblk), :],
                kmsb_sem.at[h, i])

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
            def phase(do_wait):
                def body(i, _):
                    @pl.when(i * pblk < length)
                    def _():
                        cp = pltpu.make_async_copy(
                            kfull_out.at[b, h0 + h,
                                         pl.ds(i * pblk, pblk), :],
                            kfull_scr.at[pl.ds(i * pblk, pblk), :],
                            kfull_sem.at[i])
                        if do_wait:
                            cp.wait()
                        else:
                            cp.start()
                    return 0
                jax.lax.fori_loop(0, num_tblk, body, 0)
            phase(False)
            phase(True)

        def rope_block(kb, t):
            if not use_rope:
                return kb
            c = cos_ref[pl.ds(t * pblk, pblk), :]
            s = sin_ref[pl.ds(t * pblk, pblk), :]
            cf = jnp.concatenate([c, c], axis=-1)
            sf = jnp.concatenate([s, s], axis=-1)
            return kb * cf + _rotate_half(kb) * sf

        def blocked_scores(get_kblk, q, acc_dtype=jnp.float32):
            for t in range(num_tblk):
                @pl.when(t * pblk < length)
                def _(t=t):
                    kb = rope_block(get_kblk(t), t)
                    s_blk = jax.lax.dot_general(
                        q, kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=acc_dtype)
                    scores_scr[:, pl.ds(t * pblk, pblk)] = \
                        s_blk.astype(jnp.float32)

        def softmax_from_scores(colscale, coloffset, rowscale=1.0):
            s = (scores_scr[:] * rowscale) * colscale + coloffset
            scores_scr[:] = s
            s_masked = jnp.where(valid, s, MASK_VALUE)
            m = jnp.max(s_masked, axis=-1, keepdims=True)
            e = jnp.exp(s_masked - m)
            e = jnp.where(valid, e, 0.0)
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            return e / denom

        if do_vprune:
            # full-width block-aggregation 0/1 matrix [C, nvb]: one MXU
            # pass computes all block masses (and one more expands the
            # keep mask back to columns) — probs live whole in VMEM here,
            # so there is no reason to matmul per token block
            row_blk = jax.lax.broadcasted_iota(
                jnp.int32, (cap, num_vblk), 0) // v_block
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (cap, num_vblk), 1)
            agg_full = (row_blk == col_ids).astype(jnp.float32)

        # ------------------------------------------------------------------
        # per-head pipeline: scores -> softmax -> requant -> importance ->
        # V-select -> indexed V fetch -> P·V (probs never leave VMEM)
        # ------------------------------------------------------------------
        for h in range(hpp):
            hmask_h = hmask_ref[0, h, 0, :]

            @pl.when(jnp.logical_not(alive[h]))
            def _dead(h=h):
                out_ref[0, h] = jnp.zeros((group, d), out_ref.dtype)
                maxp_ref[0, h, 0, :] = jnp.zeros((128,), jnp.float32)
                need_ref[0, h, 0, :] = jnp.zeros((128,), jnp.int32)
                if track_importance:
                    if accumulate_importance:
                        imp_ref[0, h, 0] = imp_in_ref[0, h, 0]
                    else:
                        imp_ref[0, h, 0] = jnp.zeros((cap,), jnp.float32)
                else:
                    imp_ref[0, h, 0] = jnp.zeros((128,), jnp.float32)

            @pl.when(alive[h])
            def _live(h=h, hmask_h=hmask_h):
                q = q_ref[0, h]                       # [G, D] f32
                kscale = kscale_out[0, h, 0]          # [C] (updated row)

                fold = not use_rope
                if int_dots:
                    qamax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
                    qscale = jnp.maximum(qamax, 1e-20) / 127.0
                    q_mat = jnp.clip(jnp.round(q / qscale),
                                     -127, 127).astype(jnp.int8)
                    qsum = jnp.sum(q_mat.astype(jnp.int32), axis=-1,
                                   keepdims=True).astype(jnp.float32)
                    rowscale = qscale
                    acc = jnp.int32
                else:
                    q_mat = q
                    qsum = jnp.sum(q, axis=-1, keepdims=True)
                    rowscale = 1.0
                    acc = jnp.float32

                def kblk_full(t):
                    rows = kfull_scr[pl.ds(t * pblk, pblk), :]
                    if int_dots:
                        return rows
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

                probs_scr[:] = softmax_from_scores(p1_scale, p1_offset,
                                                   rowscale)

                max_prob = jnp.max(probs_scr[:])
                maxp_ref[0, h, 0, :] = jnp.full((128,), max_prob,
                                                jnp.float32)
                if do_requant:
                    need = max_prob < requant_threshold
                    need_ref[0, h, 0, :] = jnp.full(
                        (128,), need.astype(jnp.int32))

                    @pl.when(need)
                    def _requant():
                        fetch_kfull(h)
                        blocked_scores(kblk_full, q_mat, acc)
                        probs_scr[:] = softmax_from_scores(
                            full_scale, full_offset, rowscale)
                else:
                    need_ref[0, h, 0, :] = jnp.zeros((128,), jnp.int32)

                # ---- tail: head mask, importance, V-select, P·V --------
                probs = probs_scr[:] * hmask_h[:, None]

                if track_importance:
                    if importance_kind == "prob":
                        delta = jnp.sum(probs, axis=0)
                    else:
                        delta = jnp.sum(
                            jnp.where(valid, scores_scr[:], 0.0) *
                            hmask_h[:, None], axis=0)
                    if accumulate_importance:
                        prev = jnp.where(col1 == idx, 0.0,
                                         imp_in_ref[0, h, 0])
                        if importance_ema != 1.0:
                            prev = prev * importance_ema
                        imp_ref[0, h, 0] = prev + delta
                    else:
                        imp_ref[0, h, 0] = delta
                else:
                    imp_ref[0, h, 0] = jnp.zeros((128,), jnp.float32)

                # --- V selection + fetch flags -----------------------
                if do_vprune:
                    mass = jax.lax.dot_general(
                        probs, agg_full, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    )                             # [G, num_vblk]
                    kth = _kth_largest(mass, keep_blocks)
                    keep_gb = (mass >= kth[:, None]
                               ).astype(jnp.float32)
                    # fetch score per block: kept by any group member AND
                    # nonzero mass (mass==0 blocks are masked/out-of-length)
                    fetch_f = jnp.max(keep_gb * mass, axis=0)  # [nvb]
                    # rank blocks by fetch score (descending, index ties):
                    # only the top keep_ub are fetched, and — so unfetched
                    # always means zero probability — only those stay kept
                    # (ties past the budget drop deterministically, like
                    # the reference TopK's keep_equal_num rule,
                    # TopK.scala:148-224)
                    keep_ub = min(num_vblk, group * keep_blocks)
                    jvec = jax.lax.broadcasted_iota(
                        jnp.int32, (num_vblk, num_vblk), 1)
                    si = fetch_f[None, :]          # scores as columns
                    sj = fetch_f[:, None]          # scores as rows
                    gt = (si > sj) | ((si == sj) & (jvec < jvec.T))
                    rank = jnp.sum(gt.astype(jnp.int32), axis=1)  # [nvb]
                    fetched = ((rank < keep_ub) & (fetch_f > 0.0)
                               ).astype(jnp.float32)              # [nvb]
                    keep_gb = keep_gb * fetched[None, :]
                    # zero dropped (g, block) probabilities exactly
                    keep_cols = jax.lax.dot_general(
                        keep_gb, agg_full, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [G, C]
                    probs_pv = probs * keep_cols
                else:
                    fetch_f = None
                    probs_pv = probs

                # --- V fetch --------------------------------------------
                def vdma(j, s):
                    return pltpu.make_async_copy(
                        vfull_out.at[b, h0 + h,
                                     pl.ds(j * v_block, v_block), :],
                        v_scr.at[pl.ds(j * v_block, v_block), :],
                        v_sem.at[s])

                if fetch_f is not None:
                    # UNCONDITIONAL indexed fetch of the kept blocks: a
                    # per-block `@pl.when(flag[j])` costs a vector->scalar
                    # sync per block (measured ~3.7 ms/step at bench
                    # shapes — slower than just fetching everything).
                    # Instead extract only the keep_ub ranked block ids;
                    # unkept ranks resolve to block 0, whose re-fetch is
                    # an idempotent no-op.
                    rvec = jax.lax.broadcasted_iota(
                        jnp.int32, (keep_ub, num_vblk), 0)
                    cvec = jax.lax.broadcasted_iota(
                        jnp.int32, (keep_ub, num_vblk), 1)
                    hit = ((rank[None, :] == rvec)
                           & (fetch_f[None, :] > 0.0))
                    ids = jnp.sum(jnp.where(hit, cvec, 0),
                                  axis=1)          # [keep_ub]
                    for s in range(keep_ub):
                        vdma(ids[s], s).start()
                    for s in range(keep_ub):
                        vdma(ids[s], s).wait()
                else:
                    # dense mode: scalar-only length gate (cheap conds)
                    for do_wait in (False, True):
                        for j in range(num_vblk):
                            @pl.when((j * v_block) < length)
                            def _(j=j):
                                if do_wait:
                                    vdma(j, j % num_vblk).wait()
                                else:
                                    vdma(j, j % num_vblk).start()

                # --- P·V: fold the V scale into the probabilities ----
                vscale_row = vscale_out[0, h, 0]          # [C]
                pv = probs_pv * vscale_row[None, :]
                out = jax.lax.dot_general(
                    pv, v_scr[:].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, h] = out.astype(out_ref.dtype)

    return kernel, (num_pblk, num_tblk, num_vblk)


def fused_decode_attention(
    q: jax.Array,                  # [B, Hq, 1, D] (rotated queries)
    k_quant: qz.QuantizedKV,       # planes [B, Hkv, C(/2), D] — ALIASED
    v_quant: qz.QuantizedKV,       # (donate via jit for in-place update)
    k_new: jax.Array,              # [B, Hkv, 1, D] raw new K row (already
                                   #   rotated iff rope_mode == "cached")
    v_new: jax.Array,              # [B, Hkv, 1, D] raw new V row
    cos: jax.Array,                # [C, D]
    sin: jax.Array,
    lengths: jax.Array,            # [B] int32 valid tokens INCL. new row
    *,
    sm_scale: float = 1.0,
    requant_threshold: float = 0.0,
    quant_enabled: bool = True,
    v_keep: int = 0,
    v_block_size: int = 16,
    head_mask: Optional[jax.Array] = None,
    importance_kind: str = "prob",
    use_rope: bool = True,
    quantize_queries: bool = False,
    importance_in: Optional[jax.Array] = None,   # [B, Hkv, C]
    track_importance: bool = True,
    importance_ema: float = 1.0,    # imp <- ema * imp + delta (CSV col 15
                                    #   `if_rescale_previous_importance`)
    interpret: bool = False,
) -> Tuple[jax.Array, AttentionStats, qz.QuantizedKV, qz.QuantizedKV]:
    """One fused decode step.  Returns (out [B,Hq,1,D], stats,
    k_quant', v_quant') where the primed caches contain the appended row
    (planes aliased in-place when the caller donates them).

    `sm_scale` may fold per-layer scaling into the queries instead (pass
    pre-scaled q and sm_scale=1.0) — needed when the scale is a traced
    per-layer value (GPT-2's scale_attn_by_inverse_layer_idx).
    """
    b, hq, q_len, d = q.shape
    assert q_len == 1
    hkv = k_quant.full.shape[1]
    cap = k_quant.full.shape[2]
    group = hq // hkv
    assert cap % v_block_size == 0
    hpp = _heads_per_program(hkv, cap, d)

    accumulate = importance_in is not None
    kernel, (num_pblk, num_tblk, num_vblk) = _make_kernel(
        cap=cap, group=group, head_dim=d, hpp=hpp, sm_scale=sm_scale,
        requant_threshold=requant_threshold, quant_enabled=quant_enabled,
        v_keep=v_keep, v_block=v_block_size,
        importance_kind=importance_kind, use_rope=use_rope,
        accumulate_importance=accumulate,
        quantize_queries=quantize_queries,
        track_importance=track_importance,
        importance_ema=importance_ema)

    qg = q.astype(jnp.float32).reshape(b, hkv, group, d)
    if head_mask is None:
        hm = jnp.ones((b, hkv, 1, group), jnp.float32)
    else:
        hmb = head_mask if head_mask.ndim == 2 else \
            jnp.broadcast_to(head_mask[None], (b, hq))
        hm = hmb.astype(jnp.float32).reshape(b, hkv, 1, group)

    kscale = k_quant.scale.reshape(b, hkv, 1, cap)
    vscale = v_quant.scale.reshape(b, hkv, 1, cap)
    imp_cols = cap if track_importance else 128
    if accumulate:
        imp_in = importance_in.astype(jnp.float32).reshape(b, hkv, 1, cap)
    else:
        imp_in = jnp.zeros((b, hkv, 1, imp_cols), jnp.float32)

    def blk(shape, index=lambda i, j, *_: (i, j, 0, 0)):
        return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

    in_specs = [
        blk((1, hpp, group, d)),                     # q
        blk((1, hpp, 1, d)),                         # k_new
        blk((1, hpp, 1, d)),                         # v_new
        blk((1, hpp, 1, cap)),                       # kscale
        blk((1, hpp, 1, cap)),                       # vscale
    ]
    rope_args = []
    if use_rope:
        in_specs += [
            pl.BlockSpec((cap, d // 2), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d // 2), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        rope_args = [cos[:, : d // 2].astype(jnp.float32),
                     sin[:, : d // 2].astype(jnp.float32)]
    in_specs += [
        blk((1, hpp, 1, group)),                     # hmask
        blk((1, hpp, 1, imp_cols)),                  # imp_in
        pl.BlockSpec(memory_space=pl.ANY),        # kmsb
        pl.BlockSpec(memory_space=pl.ANY),        # kfull
        pl.BlockSpec(memory_space=pl.ANY),        # vmsb
        pl.BlockSpec(memory_space=pl.ANY),        # vfull
    ]
    out_specs = [
        blk((1, hpp, group, d)),                     # out
        blk((1, hpp, 1, 128)),                       # maxp
        blk((1, hpp, 1, 128)),                       # need
        blk((1, hpp, 1, imp_cols)),                  # imp
        blk((1, hpp, 1, cap)),                       # kscale'
        blk((1, hpp, 1, cap)),                       # vscale'
        pl.BlockSpec(memory_space=pl.ANY),        # kmsb'
        pl.BlockSpec(memory_space=pl.ANY),        # kfull'
        pl.BlockSpec(memory_space=pl.ANY),        # vmsb'
        pl.BlockSpec(memory_space=pl.ANY),        # vfull'
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, hkv, group, d), jnp.float32),
        jax.ShapeDtypeStruct((b, hkv, 1, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, hkv, 1, 128), jnp.int32),
        jax.ShapeDtypeStruct((b, hkv, 1, imp_cols), jnp.float32),
        jax.ShapeDtypeStruct(kscale.shape, jnp.float32),
        jax.ShapeDtypeStruct(vscale.shape, jnp.float32),
        jax.ShapeDtypeStruct(k_quant.msb.shape, jnp.uint8),
        jax.ShapeDtypeStruct(k_quant.full.shape, jnp.int8),
        jax.ShapeDtypeStruct(v_quant.msb.shape, jnp.uint8),
        jax.ShapeDtypeStruct(v_quant.full.shape, jnp.int8),
    ]
    # operand index -> output index (operand 0 is the scalar prefetch)
    nrope = 2 if use_rope else 0
    kscale_op = 4                      # lengths=0 q=1 knew=2 vnew=3
    imp_op = 6 + nrope + 1             # hmask at 6+nrope, imp after
    plane0_op = imp_op + 1
    aliases = {
        kscale_op: 4, kscale_op + 1: 5,
        plane0_op: 6, plane0_op + 1: 7,
        plane0_op + 2: 8, plane0_op + 3: 9,
    }
    if accumulate:
        aliases[imp_op] = 3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv // hpp),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((8, d), jnp.int8) for _ in range(2 * hpp)] +
            [pltpu.VMEM((8, d), jnp.uint8) for _ in range(2 * hpp)] + [
            pltpu.VMEM((hpp, cap // 2, d), jnp.uint8),    # kmsb scratch
            pltpu.VMEM((cap, d), jnp.int8),               # kfull scratch
            pltpu.VMEM((group, cap), jnp.float32),        # scores
            pltpu.VMEM((group, cap), jnp.float32),        # final probs
            pltpu.VMEM((cap, d), jnp.int8),               # v scratch
            pltpu.SemaphoreType.DMA((4, hpp)),
            pltpu.SemaphoreType.DMA((hpp, num_pblk)),
            pltpu.SemaphoreType.DMA((num_tblk,)),
            pltpu.SemaphoreType.DMA((num_vblk,)),
        ]),
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        qg,
        k_new.astype(jnp.float32).reshape(b, hkv, 1, d),
        v_new.astype(jnp.float32).reshape(b, hkv, 1, d),
        kscale, vscale, *rope_args, hm, imp_in,
        k_quant.msb, k_quant.full, v_quant.msb, v_quant.full,
    )
    (out, maxp, need, imp, kscale2, vscale2,
     kmsb2, kfull2, vmsb2, vfull2) = outs

    k2 = qz.QuantizedKV(full=kfull2, msb=kmsb2,
                        scale=kscale2.reshape(b, hkv, cap))
    v2 = qz.QuantizedKV(full=vfull2, msb=vmsb2,
                        scale=vscale2.reshape(b, hkv, cap))
    stats = AttentionStats(
        max_prob=maxp[..., 0, 0],
        need_requant=need[..., 0, 0].astype(bool),
        importance_delta=(imp.reshape(b, hkv, cap) if track_importance
                          else jnp.zeros((b, hkv, cap), jnp.float32)),
        probs=None,
    )
    return out.reshape(b, hq, 1, d), stats, k2, v2
