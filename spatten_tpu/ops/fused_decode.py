"""Single-kernel SpAtten decode step: append + QK + softmax + requant +
importance + V-prune + P·V, all in VMEM.

Round-1 split the pipeline at the TopK stage (phase A kernel -> HBM probs
round-trip -> phase B kernel) and appended the new token's KV row in XLA
(a vmapped dynamic_update_slice = batched scatter over the [L,B,Hkv,C,D]
planes).  Profiling on the real chip (tools/profile_decode.py) showed the
scatter alone cost more than all attention compute, and the probs
round-trip paid HBM for a tensor that never needed to leave the core.

This kernel is the whole reference pipeline in one pallas_call, mirroring
SpAttenController.scala's single 15-stage dataflow (:79-785), organized
for DMA-latency hiding (length sweeps showed the first fusion was
latency-bound at ~70us/program, byte-insensitive):

  * program start: every DMA that can be issued immediately is — the
    append's RMW block reads, every alive head's MSB (or full-plane) K
    fetch, and (dense mode) every head's V fetch — all reading the OLD
    planes.  Nothing orders behind the append.
  * patch, don't order: the appended token's K/V row is quantized in
    registers; its score column and P·V contribution are patched from
    those registers, so fetched stale data for slot `length-1` never
    matters.  (The fetch may race the append write; either value is
    overwritten by the patch.)
  * append: aligned 8-row RMW blocks splice the new row into the int8
    plane and its nibble into the packed 4-bit plane (the masked
    bit-plane write of Buffer.scala:78-83 / SpAttenController.scala:
    230-232); reads land during phase A, writes drain at program end.
  * phase A per head: blocked QK^T on MXU, masked f32 softmax, requant
    decision + @pl.when full-plane recompute (RequantDecision.scala:
    69-76), importance epilogue, exact per-(query-head, block) V top-k
    (k-th order statistic replaces the QuickSelect FSM), and the V fetch
    *starts* (indexed, unconditional — block ids extracted after a
    vector-side ranking; ids park in SMEM for the P·V pass).
  * P·V pass per head: waits the V DMAs (latency hidden behind the other
    heads' phase A), folds the V scale into the probabilities, runs one
    [G,C]x[C,D] MXU matmul, and adds the patched new-token contribution.
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
    keep_ub = min(num_vblk, group * keep_blocks) if do_vprune else 0
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
            cosidx_ref = next(it)          # [1, 1, 1, D] rope row at idx
            sinidx_ref = next(it)
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
        # one whole (8, D) scratch per staged plane-row: HBM memrefs tile
        # 8 sublanes, so a single-row DMA slice is unlowerable — we RMW
        # the aligned 8-row block containing the target row instead
        row_scr = [next(it) for _ in range(2 * hpp)]   # (8, D) int8 each
        rmw_scr = [next(it) for _ in range(2 * hpp)]   # (8, D) uint8 each
        kmsb_scr = next(it)                # [HPP, C//2, D] uint8
        kfull_scr = next(it)               # [HPP, C, D] int8 (per head)
        scores_scr = next(it)              # [HPP*G, C] f32 (all heads)
        probs_scr = next(it)               # [HPP*G, C] f32 (post-select)
        v_scr = next(it)                   # [HPP, C, D] int8
        ids_smem = next(it)                # SMEM (HPP, max(keep_ub,1)) i32
        app_sem = next(it)                 # DMA (4, HPP)
        kmsb_sem = next(it)                # DMA (HPP, num_pblk)
        kfull_sem = next(it)               # DMA (HPP, num_tblk)
        v_sem = next(it)                   # DMA (HPP, keep_ub | num_tblk)

        b = pl.program_id(0)
        jpack = pl.program_id(1)
        h0 = jpack * hpp
        length = lengths_ref[b]            # includes the new token
        idx = length - 1                   # slot of the appended row
        packed_limit = jnp.minimum(length, half)
        is_hi = idx < half
        prow = jnp.where(is_hi, idx, idx - half)

        rows = hpp * group                 # combined score-plane rows
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, cap), 1)
        valid = col < length               # [rows, C]
        col1 = col[0]                      # [C]
        alive = [jnp.max(hmask_ref[0, h, 0, :]) > 0.0 for h in range(hpp)]

        # ------------------------------------------------------------------
        # LAUNCH: every DMA that reads the old planes starts now.
        # ------------------------------------------------------------------
        fstart = (idx // 8) * 8            # full-plane RMW block start
        pstart = (prow // 8) * 8           # packed-plane RMW block start

        def full_slice(ref, h):
            return ref.at[b, h0 + h, pl.ds(fstart, 8), :]

        def packed_slice(ref, h):
            return ref.at[b, h0 + h, pl.ds(pstart, 8), :]

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

        def msb_dma(h, i):
            return pltpu.make_async_copy(
                kmsb_out.at[b, h0 + h, pl.ds(i * pblk, pblk), :],
                kmsb_scr.at[h, pl.ds(i * pblk, pblk), :],
                kmsb_sem.at[h, i])

        def kfull_dma(h, i):
            return pltpu.make_async_copy(
                kfull_out.at[b, h0 + h, pl.ds(i * pblk, pblk), :],
                kfull_scr.at[h, pl.ds(i * pblk, pblk), :],
                kfull_sem.at[h, i])

        def kfull_phase(h, do_wait):
            def body(i, _):
                @pl.when(i * pblk < length)
                def _():
                    cp = kfull_dma(h, i)
                    if do_wait:
                        cp.wait()
                    else:
                        cp.start()
                return 0
            jax.lax.fori_loop(0, num_tblk, body, 0)

        # dense V fetch at pblk granularity (no selection -> coarse DMAs)
        def vdense_dma(h, i):
            return pltpu.make_async_copy(
                vfull_out.at[b, h0 + h, pl.ds(i * pblk, pblk), :],
                v_scr.at[h, pl.ds(i * pblk, pblk), :],
                v_sem.at[h, i])

        def vdense_phase(h, do_wait):
            def body(i, _):
                @pl.when(i * pblk < length)
                def _():
                    cp = vdense_dma(h, i)
                    if do_wait:
                        cp.wait()
                    else:
                        cp.start()
                return 0
            jax.lax.fori_loop(0, num_tblk, body, 0)

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
        else:
            for h in range(hpp):
                @pl.when(alive[h])
                def _(h=h):
                    kfull_phase(h, do_wait=False)
        if not do_vprune:
            for h in range(hpp):
                @pl.when(alive[h])
                def _(h=h):
                    vdense_phase(h, do_wait=False)

        # ------------------------------------------------------------------
        # Quantize the new rows in registers; update the scale rows.
        # Semantics bit-match qz.update_token (same round/clip/scale).
        # ------------------------------------------------------------------
        def quant_row(row):                # [1, D] f32 -> (int8 row, scale)
            amax = jnp.max(jnp.abs(row))
            scale = jnp.where(amax > 0, amax / 127.0, 1.0)
            q8 = jnp.clip(jnp.round(row / scale), -127, 127
                          ).astype(jnp.int8)
            return q8, scale

        new_k, new_v = [], []              # (q8 row [1, D], scale) per head
        is_new_col = col1 == idx
        for h in range(hpp):
            kq8, ks = quant_row(knew_ref[0, h].astype(jnp.float32))
            vq8, vs = quant_row(vnew_ref[0, h].astype(jnp.float32))
            new_k.append((kq8, ks))
            new_v.append((vq8, vs))
            kscale_out[0, h, 0, :] = jnp.where(
                is_new_col, ks, kscale_ref[0, h, 0, :])
            vscale_out[0, h, 0, :] = jnp.where(
                is_new_col, vs, vscale_ref[0, h, 0, :])

        def rope_row(vec):
            """Rotate a [1, D] row to cache position idx."""
            c = cosidx_ref[0, 0]           # [1, D]
            s = sinidx_ref[0, 0]
            return vec * c + _rotate_half(vec) * s

        # ------------------------------------------------------------------
        # Phase A per head: scores (patched at the new column) -> softmax
        # -> requant -> importance -> V select -> V DMA start.
        # ------------------------------------------------------------------
        def rope_block(kb, t):
            if not use_rope:
                return kb
            c = cos_ref[pl.ds(t * pblk, pblk), :]
            s = sin_ref[pl.ds(t * pblk, pblk), :]
            cf = jnp.concatenate([c, c], axis=-1)
            sf = jnp.concatenate([s, s], axis=-1)
            return kb * cf + _rotate_half(kb) * sf

        def blocked_scores(h, get_kblk, q, acc_dtype=jnp.float32):
            """QK^T for head h's G rows of the combined scores plane."""
            for t in range(num_tblk):
                @pl.when(t * pblk < length)
                def _(t=t):
                    kb = rope_block(get_kblk(t), t)
                    s_blk = jax.lax.dot_general(
                        q, kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=acc_dtype)
                    scores_scr[pl.ds(h * group, group),
                               pl.ds(t * pblk, pblk)] = \
                        s_blk.astype(jnp.float32)

        def softmax_rows(s, vmask, colscale, coloffset, rowscale):
            """Masked softmax of score rows (any leading row count)."""
            s = (s * rowscale) * colscale + coloffset
            s_masked = jnp.where(vmask, s, MASK_VALUE)
            m = jnp.max(s_masked, axis=-1, keepdims=True)
            e = jnp.exp(s_masked - m)
            e = jnp.where(vmask, e, 0.0)
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            return s, e / denom

        if do_vprune:
            # full-width block-aggregation 0/1 matrix [C, nvb]: one MXU
            # pass computes all block masses, one more expands the keep
            # mask back to columns
            row_blk = jax.lax.broadcasted_iota(
                jnp.int32, (cap, num_vblk), 0) // v_block
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (cap, num_vblk), 1)
            agg_full = (row_blk == col_ids).astype(jnp.float32)

        # ------------------------------------------------------------------
        # Head-batched phase A: per-head QK writes into one [rows, C]
        # scores plane; softmax / epilogue / importance / V selection then
        # vectorize across all heads' rows at once (a [1, C]-shaped plane
        # uses 1 of 8 sublanes — batching heads recovers the other 7).
        # ------------------------------------------------------------------
        fold = not use_rope
        q_all = q_ref[0].reshape(rows, d).astype(jnp.float32)
        if int_dots:
            qamax = jnp.max(jnp.abs(q_all), axis=-1, keepdims=True)
            qscale = jnp.maximum(qamax, 1e-20) / 127.0
            q_mat_all = jnp.clip(jnp.round(q_all / qscale),
                                 -127, 127).astype(jnp.int8)
            qf_all = q_mat_all.astype(jnp.float32)
            qsum = jnp.sum(q_mat_all.astype(jnp.int32), axis=-1,
                           keepdims=True).astype(jnp.float32)
            rowscale = qscale              # [rows, 1]
            acc = jnp.int32
        else:
            q_mat_all = q_all
            qf_all = q_all
            qsum = jnp.sum(q_all, axis=-1, keepdims=True)
            rowscale = 1.0
            acc = jnp.float32

        kscale_hpp = kscale_out[0, :, 0, :]            # [hpp, C] updated
        kscale_rows = (jnp.repeat(kscale_hpp, group, axis=0)
                       if group > 1 else kscale_hpp)   # [rows, C]

        # head/group liveness as [rows, 1] / [hpp, 1] planes (built from
        # scalar extracts: the [.., G]-lane mask can't reshape into rows)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        hpp_iota = jax.lax.broadcasted_iota(jnp.int32, (hpp, 1), 0)
        hmask_rows = jnp.zeros((rows, 1), jnp.float32)
        for h in range(hpp):
            for g in range(group):
                hmask_rows = hmask_rows + jnp.where(
                    rows_iota == h * group + g,
                    hmask_ref[0, h, 0, g], 0.0)
        alive_hpp = jnp.zeros((hpp, 1), jnp.float32)
        for h in range(hpp):
            alive_hpp = alive_hpp + jnp.where(
                hpp_iota == h, alive[h].astype(jnp.float32), 0.0)
        alive_rows = (jnp.repeat(alive_hpp, group, axis=0)
                      if group > 1 else alive_hpp)     # [rows, 1]

        # new-row register planes for the score patches
        kq8_all = jnp.concatenate(
            [jnp.broadcast_to(new_k[h][0], (group, d)) for h in range(hpp)],
            axis=0)                                    # [rows, D] int8
        k4new_all = (kq8_all.astype(jnp.int32) >> 4).astype(jnp.float32)
        ks_all = jnp.concatenate(
            [jnp.full((group, 1), 1.0, jnp.float32) * new_k[h][1]
             for h in range(hpp)], axis=0)             # [rows, 1]

        def patch_col_p1():
            """[rows, 1] raw pass-1 score of the appended token."""
            if fold:
                return jnp.sum(qf_all * k4new_all, axis=-1, keepdims=True)
            vec = (k4new_all * 16.0 + qz.MSB_MIDPOINT) * ks_all
            vec = rope_row(vec)
            return jnp.sum(q_all * vec, axis=-1, keepdims=True)

        def patch_col_full():
            """[rows, 1] raw full-plane score of the appended token."""
            kd = kq8_all.astype(jnp.float32)
            if fold:
                return jnp.sum(qf_all * kd, axis=-1, keepdims=True)
            vec = kd * ks_all
            vec = rope_row(vec)
            return jnp.sum(q_all * vec, axis=-1, keepdims=True)

        def kblk_full(h, t):
            rows_k = kfull_scr[h, pl.ds(t * pblk, pblk), :]
            if int_dots:
                return rows_k
            raw = rows_k.astype(jnp.float32)
            if fold:
                return raw
            sc = kscale_out[0, h, 0][t * pblk:(t + 1) * pblk]
            return raw * sc[:, None]

        full_scale = (kscale_rows * sm_scale) if fold else sm_scale

        # --- per-head QK (the only per-head phase-A work) ----------------
        for h in range(hpp):
            @pl.when(alive[h])
            def _qk(h=h):
                q_mat = q_mat_all[h * group:(h + 1) * group]
                if quant_enabled:
                    def wait(i, _):
                        @pl.when(i * pblk < packed_limit)
                        def _():
                            msb_dma(h, i).wait()
                        return 0
                    jax.lax.fori_loop(0, num_pblk, wait, 0)

                    def kblk_msb(t):
                        pkt = t if t < num_pblk else t - num_pblk
                        rows_k = kmsb_scr[h, pl.ds(pkt * pblk, pblk), :]
                        nib = rows_k.astype(jnp.int32)
                        nib = (nib >> 4) if t < num_pblk else (nib & 0xF)
                        k4i = (nib ^ 8) - 8
                        if int_dots:
                            return k4i.astype(jnp.int8)
                        k4 = k4i.astype(jnp.float32)
                        if fold:
                            return k4
                        sc = kscale_out[0, h, 0][t * pblk:(t + 1) * pblk]
                        return (k4 * 16.0 + qz.MSB_MIDPOINT) * sc[:, None]

                    blocked_scores(h, kblk_msb, q_mat, acc)
                else:
                    kfull_phase(h, do_wait=True)
                    blocked_scores(h, lambda t: kblk_full(h, t), q_mat, acc)

        # --- combined epilogue + softmax ---------------------------------
        if quant_enabled:
            if fold:
                p1_scale = kscale_rows * (16.0 * sm_scale)
                p1_offset = (rowscale * qsum) * (
                    kscale_rows * (qz.MSB_MIDPOINT * sm_scale))
                patch1 = patch_col_p1()
            else:
                p1_scale, p1_offset = sm_scale, 0.0
                patch1 = patch_col_p1()
        else:
            p1_scale = full_scale
            p1_offset = 0.0
            patch1 = patch_col_full()

        # patch the appended token's column (the plane row may be stale —
        # the fetch did not order behind the append)
        s_all = jnp.where(col == idx, patch1, scores_scr[:])
        s_all, probs_all = softmax_rows(s_all, valid, p1_scale, p1_offset,
                                        rowscale)
        scores_scr[:] = s_all

        # --- requant decision + per-head recompute -----------------------
        maxp_rows = jnp.max(probs_all, axis=-1, keepdims=True) * alive_rows
        probs_scr[:] = probs_all
        for h in range(hpp):
            r0 = h * group
            mp_h = jnp.max(
                jnp.where((rows_iota >= r0) & (rows_iota < r0 + group),
                          maxp_rows, 0.0))
            maxp_ref[0, h, 0, :] = jnp.full((128,), mp_h, jnp.float32)
            if do_requant:
                need_h = alive[h] & (mp_h < requant_threshold)
                need_ref[0, h, 0, :] = jnp.full(
                    (128,), need_h.astype(jnp.int32))

                @pl.when(need_h)
                def _requant(h=h):
                    kfull_phase(h, do_wait=False)
                    kfull_phase(h, do_wait=True)
                    q_mat = q_mat_all[h * group:(h + 1) * group]
                    blocked_scores(h, lambda t: kblk_full(h, t), q_mat,
                                   acc)
                    sl = pl.ds(h * group, group)
                    s_h = jnp.where(col[:group] == idx,
                                    patch_col_full()[r0:r0 + group],
                                    scores_scr[sl, :])
                    fs = (full_scale[r0:r0 + group]
                          if fold else full_scale)
                    rs = (rowscale[r0:r0 + group]
                          if int_dots else rowscale)
                    s_h, p_h = softmax_rows(s_h, valid[:group], fs, 0.0,
                                            rs)
                    scores_scr[sl, :] = s_h
                    probs_scr[sl, :] = p_h
            else:
                need_ref[0, h, 0, :] = jnp.zeros((128,), jnp.int32)

        probs_all = probs_scr[:] * hmask_rows          # [rows, C]

        # --- importance (all heads at once) ------------------------------
        if track_importance:
            if importance_kind == "prob":
                delta_rows = probs_all
            else:
                delta_rows = jnp.where(valid, scores_scr[:], 0.0) * \
                    hmask_rows
            if group > 1:
                delta = jnp.sum(delta_rows.reshape(hpp, group, cap),
                                axis=1)                # [hpp, C]
            else:
                delta = delta_rows
            if accumulate_importance:
                prev = jnp.where(col1[None, :] == idx, 0.0,
                                 imp_in_ref[0, :, 0, :])
                if importance_ema != 1.0:
                    prev = prev * importance_ema
                imp_ref[0, :, 0, :] = jnp.where(
                    alive_hpp > 0.0, prev + delta, imp_in_ref[0, :, 0, :])
            else:
                imp_ref[0, :, 0, :] = delta
        else:
            imp_ref[0, :, 0, :] = jnp.zeros((hpp, 128), jnp.float32)

        # --- V selection (all heads at once) + indexed fetch start -------
        head_ids = []
        if do_vprune:
            mass = jax.lax.dot_general(
                probs_all, agg_full, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [rows, nvb]
            kth = _kth_largest(mass, keep_blocks)      # [rows]
            keep_gb = (mass >= kth[..., None]).astype(jnp.float32)
            fm = keep_gb * mass
            fetch_f = (jnp.max(fm.reshape(hpp, group, num_vblk), axis=1)
                       if group > 1 else fm)           # [hpp, nvb]
            # rank blocks per head by fetch score (descending, index tie-
            # break); only the top keep_ub fetch, and only those stay
            # kept — ties past the budget drop exactly like the reference
            # TopK's keep_equal_num rule (TopK.scala:148-224)
            jvec = jax.lax.broadcasted_iota(
                jnp.int32, (num_vblk, num_vblk), 1)
            gt = (fetch_f[:, None, :] > fetch_f[:, :, None]) | (
                (fetch_f[:, None, :] == fetch_f[:, :, None])
                & (jvec < jvec.T)[None])
            rank = jnp.sum(gt.astype(jnp.int32), axis=2)   # [hpp, nvb]
            fetched = ((rank < keep_ub) & (fetch_f > 0.0)
                       ).astype(jnp.float32)               # [hpp, nvb]
            fetched_rows = (jnp.repeat(fetched, group, axis=0)
                            if group > 1 else fetched)
            keep_gb = keep_gb * fetched_rows
            keep_cols = jax.lax.dot_general(
                keep_gb, agg_full, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [rows, C]
            probs_scr[:] = probs_all * keep_cols
            # extract the kept block ids; unkept ranks resolve to block 0
            # (re-fetch of block 0 is an idempotent no-op)
            rvec = jax.lax.broadcasted_iota(
                jnp.int32, (hpp, keep_ub, num_vblk), 1)
            cvec = jax.lax.broadcasted_iota(
                jnp.int32, (hpp, keep_ub, num_vblk), 2)
            hit = ((rank[:, None, :] == rvec)
                   & (fetch_f[:, None, :] > 0.0))
            ids = jnp.sum(jnp.where(hit, cvec, 0), axis=2)  # [hpp, keep_ub]
            for h in range(hpp):
                @pl.when(alive[h])
                def _vfetch(h=h):
                    for s in range(keep_ub):
                        blk = ids[h, s]
                        ids_smem[h, s] = blk
                        pltpu.make_async_copy(
                            vfull_out.at[b, h0 + h,
                                         pl.ds(blk * v_block, v_block), :],
                            v_scr.at[h, pl.ds(blk * v_block, v_block), :],
                            v_sem.at[h, s]).start()
        else:
            probs_scr[:] = probs_all

        # ------------------------------------------------------------------
        # Append modify + write start (RMW reads landed during phase A).
        # ------------------------------------------------------------------
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
        fmask = sub8 == (idx - fstart)
        pmask = sub8 == (prow - pstart)

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
            for scr_i, (q8, _) in ((2 * h, new_k[h]), (2 * h + 1, new_v[h])):
                blk = row_scr[scr_i][...]
                row_scr[scr_i][...] = jnp.where(
                    fmask, jnp.broadcast_to(q8, (8, d)), blk)
                old = rmw_scr[scr_i][...].astype(jnp.int32)
                nib = jnp.broadcast_to(
                    (q8.astype(jnp.int32) >> 4) & 0xF, (8, d))
                newb = jnp.where(is_hi,
                                 (nib << 4) | (old & 0x0F),
                                 (old & jnp.int32(0xF0)) | nib)
                rmw_scr[scr_i][...] = jnp.where(pmask, newb, old
                                                ).astype(jnp.uint8)
            pltpu.make_async_copy(row_scr[2 * h], full_slice(kfull_out, h),
                                  app_sem.at[0, h]).start()
            pltpu.make_async_copy(row_scr[2 * h + 1],
                                  full_slice(vfull_out, h),
                                  app_sem.at[1, h]).start()
            pltpu.make_async_copy(rmw_scr[2 * h], packed_slice(kmsb_out, h),
                                  app_sem.at[2, h]).start()
            pltpu.make_async_copy(rmw_scr[2 * h + 1],
                                  packed_slice(vmsb_out, h),
                                  app_sem.at[3, h]).start()

        # ------------------------------------------------------------------
        # P·V pass per head (V DMA latency hidden behind phase A).
        # ------------------------------------------------------------------
        for h in range(hpp):
            @pl.when(alive[h])
            def _pv(h=h):
                if do_vprune:
                    for s in range(keep_ub):
                        blk = ids_smem[h, s]
                        pltpu.make_async_copy(
                            vfull_out.at[b, h0 + h,
                                         pl.ds(blk * v_block, v_block), :],
                            v_scr.at[h, pl.ds(blk * v_block, v_block), :],
                            v_sem.at[h, s]).wait()
                else:
                    vdense_phase(h, do_wait=True)

                probs_pv = probs_scr[pl.ds(h * group, group), :]
                vq8, vs = new_v[h]
                # patch the appended token's contribution: its plane row
                # may be stale, so zero its column and add the true row
                p_idx = jnp.sum(probs_pv * is_new_col[None, :].astype(
                    jnp.float32), axis=-1)                    # [G]
                probs_pv = probs_pv * (1.0 - is_new_col[None, :].astype(
                    jnp.float32))
                vscale_row = vscale_out[0, h, 0]
                pv = probs_pv * vscale_row[None, :]
                out = jax.lax.dot_general(
                    pv, v_scr[h].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = out + p_idx[:, None] * (
                    vq8.astype(jnp.float32) * vs)
                out_ref[0, h] = out.astype(out_ref.dtype)

        # append writes drain last (they were issued above; by now their
        # latency is hidden behind the P·V pass)
        for h in range(hpp):
            pltpu.make_async_copy(row_scr[2 * h], full_slice(kfull_out, h),
                                  app_sem.at[0, h]).wait()
            pltpu.make_async_copy(row_scr[2 * h + 1],
                                  full_slice(vfull_out, h),
                                  app_sem.at[1, h]).wait()
            pltpu.make_async_copy(rmw_scr[2 * h], packed_slice(kmsb_out, h),
                                  app_sem.at[2, h]).wait()
            pltpu.make_async_copy(rmw_scr[2 * h + 1],
                                  packed_slice(vmsb_out, h),
                                  app_sem.at[3, h]).wait()

    return kernel, (num_pblk, num_tblk, num_vblk, keep_ub)


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
    kernel, (num_pblk, num_tblk, num_vblk, keep_ub) = _make_kernel(
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
        # per-sequence rope row at the append position (idx = length - 1)
        pos_idx = jnp.maximum(lengths - 1, 0)
        cos_idx = jnp.take(cos, jnp.minimum(pos_idx, cos.shape[0] - 1),
                           axis=0).reshape(b, 1, 1, d)
        sin_idx = jnp.take(sin, jnp.minimum(pos_idx, sin.shape[0] - 1),
                           axis=0).reshape(b, 1, 1, d)
        in_specs += [
            pl.BlockSpec((cap, d // 2), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d // 2), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            blk((1, 1, 1, d), lambda i, j, *_: (i, 0, 0, 0)),
            blk((1, 1, 1, d), lambda i, j, *_: (i, 0, 0, 0)),
        ]
        rope_args = [cos[:, : d // 2].astype(jnp.float32),
                     sin[:, : d // 2].astype(jnp.float32),
                     cos_idx.astype(jnp.float32),
                     sin_idx.astype(jnp.float32)]
    in_specs += [
        blk((1, hpp, 1, group)),                     # hmask
        blk((1, hpp, 1, imp_cols)),                  # imp_in
        pl.BlockSpec(memory_space=pl.ANY),           # kmsb
        pl.BlockSpec(memory_space=pl.ANY),           # kfull
        pl.BlockSpec(memory_space=pl.ANY),           # vmsb
        pl.BlockSpec(memory_space=pl.ANY),           # vfull
    ]
    out_specs = [
        blk((1, hpp, group, d)),                     # out
        blk((1, hpp, 1, 128)),                       # maxp
        blk((1, hpp, 1, 128)),                       # need
        blk((1, hpp, 1, imp_cols)),                  # imp
        blk((1, hpp, 1, cap)),                       # kscale'
        blk((1, hpp, 1, cap)),                       # vscale'
        pl.BlockSpec(memory_space=pl.ANY),           # kmsb'
        pl.BlockSpec(memory_space=pl.ANY),           # kfull'
        pl.BlockSpec(memory_space=pl.ANY),           # vmsb'
        pl.BlockSpec(memory_space=pl.ANY),           # vfull'
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
    nrope = 4 if use_rope else 0
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
                pltpu.VMEM((hpp, cap // 2, d), jnp.uint8),    # kmsb
                pltpu.VMEM((hpp, cap, d), jnp.int8),          # kfull
                pltpu.VMEM((hpp * group, cap), jnp.float32),  # scores
                pltpu.VMEM((hpp * group, cap), jnp.float32),  # probs
                pltpu.VMEM((hpp, cap, d), jnp.int8),          # v
                pltpu.SMEM((hpp, max(keep_ub, 1)), jnp.int32),
                pltpu.SemaphoreType.DMA((4, hpp)),
                pltpu.SemaphoreType.DMA((hpp, num_pblk)),
                pltpu.SemaphoreType.DMA((hpp, num_tblk)),
                # sized to live DMAs only: the semaphore-flag space is
                # tiny (~512 slots)
                pltpu.SemaphoreType.DMA(
                    (hpp, keep_ub if keep_ub else num_tblk)),
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
