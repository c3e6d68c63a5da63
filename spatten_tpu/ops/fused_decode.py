"""Single-kernel SpAtten decode step over the token-major KV layout.

The cache planes are stored **token-major**: ``[B, C, Hkv*D]`` — one
contiguous row per token slot holding every head's vector.  This is the
layout the decode step wants on TPU:

* **one DMA per K block for all heads** (a contiguous ``[blk, Hkv*D]``
  slab) instead of one strided DMA per (head, block);
* the **append is a single 8-row read-modify-write per plane** (the new
  token's K/V for every head live in one row);
* QK^T for all heads is **one block-diagonal matmul per block**:
  queries are laid out as ``qbd[r, h*D:(h+1)*D] = q_r if head(r)==h else
  0``, so ``qbd @ K_blk^T`` contracts the fused head*D axis and the
  zero off-head lanes cancel every cross-head product;
* P·V is one ``[rows, C] @ [C, Hkv*D]`` matmul; the per-head outputs are
  the block-diagonal chunks, extracted with a constant mask and one
  ``[rows, H*D] @ [H*D, D]`` tiled-identity matmul — no per-head loops,
  no lane-dim reshapes, and **no lane-alignment constraint on D** (two
  64-dim heads pack into one 128-lane tile automatically, which is how
  GPT-2's d=64 runs the fused kernel on hardware; the reference chip is
  built around sizeD=64, SpAtten.scala:10-35).

Pipeline stages fused in this one pallas_call (mirroring the reference's
single 15-stage dataflow, SpAttenController.scala:79-785):

  append (masked nibble RMW = the bit-plane write of Buffer.scala:78-83)
  -> MSB-plane QK (MatrixFetcher 4-bit profile) -> masked f32 softmax
  (real, vs Softmax.scala's dummy) -> requant decision
  (RequantDecision.scala:69-76) -> merged full-plane recompute when any
  head fires (stageRequantBuffer's drop-and-reorder becomes a row-select
  between the two score planes) -> importance epilogue (cascade signal)
  -> per-row local V top-k keep mask (TopK.scala semantics: keep
  ``mass >= kth`` with ties) -> gated V fetch at coarse fetch-block
  granularity (a block is fetched iff any row keeps part of it) -> P·V.

The kernel computes attention with RoPE already applied (queries rotated
by the caller; keys either cached-rotated — EngineConfig.rope_mode
"cached" — or absolute-position models).  The "read"-rope mode keeps the
jnp reference path.

Numerics match ``ops.attention_ref.spatten_attention_reference`` on the
post-append cache (tests compare in interpret mode).

Dense mode (``quant_enabled=False``) maintains only the full planes and
scales; the packed nibble planes are never read there, so their append
RMW is skipped and their contents are undefined.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops.attention_ref import MASK_VALUE, AttentionStats


def _even_blocks(total: int, target: int) -> Tuple[int, int]:
    """(block_rows, num_blocks): num_blocks * block_rows == total,
    block_rows <= ~target."""
    nb = max(1, -(-total // target))
    while total % nb:
        nb += 1
    return total // nb, nb


import os as _os

PBLK_TARGET = 1024   # packed-K fetch rows per DMA (must match qz.pack_unit)
_XINST = not _os.environ.get("SPATTEN_NO_XINST")   # cross-instance prefetch
# Sharing the msb/full stream buffer measured ~30x SLOWER on v5e (the
# requant stream's reuse of pass-1's slots appears to defeat Mosaic's
# DMA/compute overlap) — kept as an opt-in experiment only.
_NO_SHARE = not _os.environ.get("SPATTEN_SHARE_KSTREAM")
NSLOTS = 4      # rotating VMEM slots per DMA stream (depth of the
                # manual prefetch pipeline; K/V planes stream through
                # these instead of residing whole in VMEM)


def _heads_per_program(hkv: int, cap: int, head_dim: int, group: int = 1
                       ) -> int:
    """Largest divisor of hkv whose lane slab (hpp*head_dim) is 128-aligned,
    whose row count (hpp*group) is sublane-aligned when possible, and whose
    VMEM footprint fits.

    The K/V planes stream through NSLOTS rotating [blk, slab] buffers, so
    the plane scratch is cap-independent; what scales with cap is the
    [rows, cap] score/prob planes."""
    budget = 11 * 1024 * 1024
    best = None
    for h in range(1, hkv + 1):
        if hkv % h:
            continue
        if (h * head_dim) % 128:
            continue
        if h != hkv and h % 8:
            # partial head chunks slice the scale planes' sublane dim with
            # pl.ds, which Mosaic requires 8-aligned
            continue
        slab = h * head_dim
        rows = h * group
        half = cap // 2
        pblk = _even_blocks(half, PBLK_TARGET)[0]
        # per-stream slots are capped at ~2 MB (mirrors _slots below)
        slots = max(2, min(NSLOTS, (2 * 1024 * 1024) // (pblk * slab)))
        stream = slab * pblk * slots * 3           # msb + kfull + v slots
        planes = rows * cap * 4 * 2                # scores + probs
        scales = h * cap * 4 * 3                   # ksc + vsc + imp slices
        if stream + planes + scales <= budget:
            best = h
    if best is None:
        raise ValueError(
            f"no head grouping with 128-aligned lanes fits VMEM "
            f"(hkv={hkv}, head_dim={head_dim}, cap={cap})")
    return best


def _kth_largest(x: jax.Array, k: int) -> jax.Array:
    """k-th largest value per row of x [..., n] (k >= 1), by counting.

    Replaces the reference's QuickSelect FSM (utils/QuickSelect.scala):
    an all-pairs comparison + row-sum ranks every element in one vector
    pass; the k-th order statistic is the smallest value with rank < k.
    """
    gt = (x[..., None, :] > x[..., :, None]).astype(jnp.int32)
    rank = jnp.sum(gt, axis=-1)                       # strictly-greater count
    # smallest value whose strictly-greater count is < k (tie-safe)
    return jnp.min(jnp.where(rank < k, x, jnp.inf), axis=-1)


def _fetch_block(cap: int, v_block: int, target: int = 256) -> int:
    """V fetch-DMA granularity: a multiple of v_block dividing cap,
    as close to `target` rows as possible.  The block count is capped at
    48 so the per-block fetch gates pack exactly into TWO f32-summed
    int32 bitmask words (24 exact bits each)."""
    best = v_block
    m = v_block
    while m <= min(cap, target):
        if cap % m == 0:
            best = m
        m += v_block
    while cap // best > 48:
        m = best + v_block
        while cap % m or m % v_block:
            m += v_block
        best = m
    return best


def _batches_per_program(batch: int, hpp: int, head_dim: int, group: int,
                         cap: int, *, quant_on: bool, need_kfull: bool,
                         need_scores2: bool, has_lsb2: bool,
                         do_vprune: bool, v_block: int, sc_bytes: int,
                         imp_bytes: int, track_imp: bool,
                         e_bytes: int = 4, mixed: bool = False) -> int:
    """Batch rows per kernel program (`bpp`).

    Grid instances run sequentially on the core and each one pays fixed
    scalar-core costs (DMA descriptor issues, semaphore waits) that the
    round-2 profiling measured at ~12 us/instance against ~8 us of
    actual traffic — the decode step was instance-serialization-bound.
    Grouping bpp batch rows into one program moves every stream block
    for the whole group with ONE descriptor and amortizes the fixed
    instance cost, at the price of group-level fetch gating (a K/V block
    moves if ANY member needs it).  Returns the largest divisor of
    `batch` (capped at 8) whose combined VMEM footprint fits, preferring
    int8-tileable row counts.

    The budget is aggressive (v5e VMEM is ~16 MB/core): with the shared
    msb/full stream buffer, the folded requant merge, and the bf16
    e-plane, bpp=4 fits the serving shapes where the round-3 kernel was
    held at 2 — halving the instance-serialization cost that bounds the
    decode step."""
    budget = 13 * 1024 * 1024
    slab = hpp * head_dim
    rows = hpp * group
    half = cap // 2
    pblk, num_pblk = _even_blocks(half, PBLK_TARGET)
    qblk = max(1, pblk // 2)
    fblk = _fetch_block(cap, v_block) if do_vprune else pblk
    nfb = cap // fblk
    # requant fire-count packing (the kernel asserts
    # ngate * bit_length(bpp*gate_hpg) <= 22, see _make_kernel): candidate
    # groups that would overflow the exact-f32-sum bit budget are skipped
    gate_hpg = max(1, -(-128 // head_dim))
    if hpp % gate_hpg:
        gate_hpg = hpp
    ngate = hpp // gate_hpg
    fits = [1]
    for bpp in range(2, min(batch, 8) + 1):
        if batch % bpp:
            continue
        if need_scores2 and ngate * (bpp * gate_hpg).bit_length() > 22:
            continue
        # column-space pass bound: the [R, cap] VPU passes (scale, exp,
        # importance) and the group-union overfetch grow with R*cap;
        # measured on v5e, groups beyond R*cap ~ 128K trade away more in
        # pass time + unioned fetch bytes than they save in per-instance
        # overhead (bpp4 at cap 16384 regressed 3.8 -> 4.3 ms/step while
        # bpp4 at cap 8192 improved 1.56x -> 1.72x)
        if bpp * rows * cap > 128 * 1024:
            continue
        R = bpp * rows

        def slots(nblk, blk):
            if nblk <= 1:
                return 1
            return max(2, min(nblk, NSLOTS,
                              (2 * 1024 * 1024) // (bpp * blk * slab)))

        mem = 0
        # on the opt-in shared path the msb and full-plane streams SHARE
        # one slot buffer (never live at once) sized to the larger slot
        # count; dense mode has only the full stream
        kslots = 0
        if quant_on:
            kslots = slots(num_pblk, pblk)
            if need_kfull and not _NO_SHARE:
                kslots = max(kslots, slots(cap // pblk, pblk))
        kf_mem = 0
        if need_kfull:
            # mirrors _make_kernel's kfblk: the half-block requant stream
            # only exists on the separate-buffer (_NO_SHARE) path; when
            # the msb/full streams share one slot buffer the full stream
            # reuses the pblk-sized msb slots (no extra memory)
            if quant_on and not _NO_SHARE:
                kf_mem = 0      # shared with the msb slots accounted below
            else:
                kfb = (pblk // 2 if (quant_on and not mixed and _NO_SHARE
                                     and pblk % 256 == 0) else pblk)
                kf_mem = slots(cap // kfb, kfb) * bpp * kfb * slab
        mem += kslots * bpp * pblk * slab + kf_mem
        if has_lsb2:
            ls = max(2, min(num_pblk, NSLOTS)) if num_pblk > 1 else 1
            mem += ls * bpp * qblk * slab
        mem += slots(nfb, fblk) * bpp * fblk * slab      # V slots
        mem += R * cap * (4 + e_bytes)  # scores + e (no scores2)
        mem += bpp * 8 * cap * sc_bytes * 2      # scale scratch (8-padded)
        if track_imp:
            mem += bpp * 8 * cap * imp_bytes
        if do_vprune:
            mem += R * (cap // v_block) * 4
        mem += R * slab * 4 + bpp * 8 * slab * 5   # pvacc + append scratch
        if mem <= budget:
            fits.append(bpp)
    best8 = [x for x in fits if (x * rows) % 8 == 0]
    return max(best8) if best8 else max(fits)


def _make_kernel(*, cap: int, group: int, head_dim: int, hpp: int,
                 sm_scale: float, requant_threshold: float,
                 quant_enabled: bool, v_keep: int, v_block: int,
                 importance_kind: str, accumulate_importance: bool,
                 imp_per_row: bool = False,
                 quantize_queries: bool = False, track_importance: bool = True,
                 importance_ema: float = 1.0, skip_append: bool = False,
                 head_gating: bool = False, npj: int = 1, batch: int = 1,
                 vmsb_on: bool = True, sc_blocked: bool = False,
                 mixed_profile: bool = False, has_lsb2: bool = False,
                 imp_dtype=jnp.float32, sc_dtype=jnp.float32,
                 pv_int8: bool = False, has_appmask: bool = False,
                 row_stats: bool = False, bpp: int = 1,
                 probs_bf16: bool = False):
    e_dtype = jnp.bfloat16 if probs_bf16 else jnp.float32
    half = cap // 2
    pblk, num_pblk = _even_blocks(half, PBLK_TARGET)
    num_tblk = 2 * num_pblk
    # 2-bit refinement plane (6-bit profiles): one qblk-row fetch carries
    # the four 2-bit fields of the same 2*pblk-token unit as one msb block
    qblk = max(1, pblk // 2)
    ls = max(2, min(num_pblk, NSLOTS)) if has_lsb2 and num_pblk > 1 else 1
    num_vblk = cap // v_block
    # v_keep: per-layer value budgets (ints).  The kernel enables the
    # V-pruning machinery if ANY layer prunes; the per-layer keep count
    # is read at run time from the scalar-prefetched budget array
    # (the reference's per-request `value_fetch_num`, CSV col 12).
    vk_tuple = (v_keep,) if isinstance(v_keep, int) else tuple(v_keep)
    do_vprune = any(
        0 < vk and max(1, -(-vk // v_block)) < num_vblk for vk in vk_tuple)
    do_requant = quant_enabled and requant_threshold > 0.0
    # integer-MXU dots need an int8-tileable row count; otherwise keep the
    # query-quantization NUMERICS (round-to-int8 + per-row scale) but feed
    # the MXU f32 — bit-identical scores, different datapath
    rows_q = hpp * group
    int_dots = quantize_queries and (rows_q % 8 == 0 or 8 % rows_q == 0)
    d = head_dim
    slab = hpp * d
    rows = hpp * group          # q-head rows per batch member
    R = bpp * rows              # row space of one program (batch group)
    RH = bpp * hpp
    # requant fetch gating granularity: per head when a head's lane chunk
    # is DMA-sliceable (d >= 128), else per lane-aligned head group
    gate_hpg = max(1, -(-128 // d))
    if hpp % gate_hpg:
        gate_hpg = hpp
    ngate = hpp // gate_hpg
    # V fetch granularity: fine gated blocks when pruning (coarser
    # granularity over-fetches more than the saved branch cost — measured
    # on v5e), coarse pblk blocks when dense
    fblk = _fetch_block(cap, v_block) if do_vprune else pblk
    nfb = cap // fblk
    vpf = fblk // v_block if do_vprune else 1
    # rotating-slot stream depths: deep enough to overlap, capped so each
    # stream's VMEM stays ~2 MB even at huge caps (where fetch blocks grow)
    def _slots(nblk, blk):
        if nblk <= 1:
            return 1
        return max(2, min(nblk, NSLOTS,
                          (2 * 1024 * 1024) // (bpp * blk * slab)))

    ps = _slots(num_pblk, pblk)
    # full-plane stream granularity: in quant mode the stream only runs
    # on requant-firing instances (and 8-bit profile layers), so smaller
    # kfblk blocks trade a few extra descriptors there for slot VMEM
    # everywhere; dense mode keeps pblk blocks (it IS the hot pass)
    # half blocks only when the full-plane stream is requant-only: an
    # 8-bit mixed-profile layer streams kfull as its HOT pass-1, where
    # doubling descriptors costs more than the slot VMEM buys
    # (sharing reuses the pblk-sized msb slots, so the halving only
    # applies on the default separate-buffer path)
    kfblk = (pblk // 2 if (quant_enabled and not mixed_profile
                           and _NO_SHARE and pblk % 256 == 0) else pblk)
    nkfb = cap // kfblk
    ts = _slots(nkfb, kfblk)
    vs = _slots(nfb, fblk)
    # length-gated metadata streams (scale/importance planes): legal
    # only when the prefix rungs are lane-aligned DMA slices.  Rung
    # sizes are pblk-aligned so every live-block update falls inside
    # the fetched prefix.
    sc_chunked = (not sc_blocked) and pblk % 128 == 0
    _lad = _os.environ.get("SPATTEN_SC_LADDER", "rw")
    sc_ladder_read = sc_chunked and ("r" in _lad)
    sc_ladder_write = sc_chunked and ("w" in _lad)
    sc_rungs = sorted({-(-num_tblk // 8) * pblk, -(-num_tblk // 4) * pblk,
                       -(-(3 * num_tblk) // 8) * pblk,
                       -(-num_tblk // 2) * pblk,
                       -(-(3 * num_tblk) // 4) * pblk, num_tblk * pblk})

    def kernel(*refs):
        it = iter(refs)
        lengths_ref = next(it)             # SMEM int32 [B]
        layer_ref = next(it)               # SMEM int32 [1] — layer index
        alive_ref = next(it)               # SMEM int32 [B] packed per-gate
                                           #   head-liveness bits
        qbits_ref = next(it)               # SMEM int32 [L] per-layer pass-1
                                           #   bits (QuantProfile as data)
        vkeep_ref = next(it)               # SMEM int32 [L] per-layer value
                                           #   budget (value_fetch_num)
        if has_appmask:
            appm_ref = next(it)            # SMEM int32 [B]: 0 = this
                                           #   sequence does NOT append
                                           #   (split-K non-owner shards)
        qbd_ref = next(it)                 # [1, rows, slab] f32 block-diag
        knew_ref = next(it)                # [1, 1, slab] f32 raw new row
        vnew_ref = next(it)
        kscale_in = next(it)               # [L, B, Hkv, C] f32 (ANY)
        vscale_in = next(it)
        hmask_ref = next(it)               # [1, hpp, G] f32
        imp_in = next(it)                  # [L, B, Hkv, C] f32 (ANY)
        if quant_enabled:                  # dense mode carries no nibble
            kmsb_hbm = next(it)            #   planes at all — neither as
        if has_lsb2:                       #   operands nor in HBM
            klsb2_hbm = next(it)           # [L, B, C//4, Hkv*D] u8 (ANY)
        kfull_hbm = next(it)
        if vmsb_on:                        # [L, B, C//2, Hkv*D] u8 (ANY);
            vmsb_hbm = next(it)            #   V's nibble plane is optional
        vfull_hbm = next(it)               #   [L, B, C, Hkv*D] int8 (ANY)
        out_ref = next(it)                 # [1, rows, d] f32
        maxp_ref = next(it)                # [1, hpp, 128] f32
        need_ref = next(it)                # [1, hpp, 128] int32
        imp_out = next(it)                 # ANY (aliased when accumulating)
        kscale_out = next(it)              # ANY, aliased with kscale_in
        vscale_out = next(it)
        if quant_enabled:
            kmsb_out = next(it)            # aliased STACKED planes (ANY):
        if has_lsb2:
            klsb2_out = next(it)
        kfull_out = next(it)               #   the kernel reads/writes only
        if vmsb_on:                        #   layer `layer_ref[0]`, all
            vmsb_out = next(it)            #   other layers stay in place
        vfull_out = next(it)
        if row_stats:
            mrow_out = next(it)            # [1, rows, 128] f32 row max
            drow_out = next(it)            # [1, rows, 128] f32 denominator
        kapp_scr = next(it)                # (8, slab) int8 (uint8 view
                                           #   when the kfull plane is)
        vapp_scr = next(it)
        if quant_enabled:
            kmapp_scr = next(it)           # (8, slab) uint8
        if has_lsb2:
            kl2app_scr = next(it)          # (8, slab) uint8
        if vmsb_on:
            vmapp_scr = next(it)
        ksc_scr = next(it)                 # (hpp, C) f32 scale slices
        vsc_scr = next(it)
        imp_scr = next(it)                 # (hpp, C or 128) f32
        if quant_enabled:
            kmsb_scr = next(it)            # [S, pblk, slab] uint8 slots
        if has_lsb2:
            klsb2_scr = next(it)           # [ls, qblk, slab] uint8 slots
        if (not quant_enabled) or (_NO_SHARE
                                   and (do_requant or mixed_profile)):
            kfull_scr = next(it)           # [ts, kfblk, slab] int8 slots
        elif do_requant or mixed_profile:
            # the full-plane stream SHARES the msb slot buffer: pass-1
            # (msb) and the requant/8-bit stream (full) are never live
            # at once — the successor's prologue prefetch is issued
            # after the requant section for the same reason.  The kfull
            # HBM plane arrives as a uint8 VIEW (wrapper bitcast), so
            # every copy is uint8->uint8; int8-ness is recovered by a
            # bitcast at the single compute read (kblk_full).
            kfull_scr = kmsb_scr
        scores_scr = next(it)              # [rows, C] f32
        probs_scr = next(it)               # [rows, C] UNNORMALIZED e
                                           #   (f32, or bf16 opt-in)
        mrow_scr = next(it)                # (rows, 128) f32 running max
        den_scr = next(it)                 # (rows, 128) f32 denominator
        if pv_int8:
            emv_scr = next(it)             # (rows, 128) f32 max(e*vscale)
        if do_vprune:
            mass_scr = next(it)            # [rows, nvb] f32 block masses
        v_scr = next(it)                   # [vs, fblk, slab] int8 slots
        pvacc_scr = next(it)               # [rows, slab] f32
        app_sem = next(it)                 # DMA (5,)
        if quant_enabled:
            kmsb_sem = next(it)            # DMA (ps, ngate)
        if has_lsb2:
            klsb2_sem = next(it)           # DMA (ls, ngate)
        kfull_sem = next(it)               # DMA (ts, ngate)
        v_sem = next(it)                   # DMA (vs,)
        sc_sem = next(it)                  # DMA (6,) scale/importance IO
        if sc_chunked:
            scm_sem = next(it)             # DMA (4, nrungs): prefix-rung
                                           #   metadata ladder

        bg = pl.program_id(0)              # batch-GROUP index
        j = pl.program_id(1)
        b0 = bg * bpp                      # first batch row of the group
        lv = layer_ref[0]                  # layer of the stacked planes
        lane0 = j * slab
        # per-member scalars (bpp batch rows share this program; all
        # stream DMAs move the whole group in one descriptor — the
        # per-DMA scalar-core issue cost amortizes over the group)
        len_bi = [lengths_ref[b0 + bi] for bi in range(bpp)]
        len_max = len_bi[0]
        for _l in len_bi[1:]:
            len_max = jnp.maximum(len_max, _l)
        # slot of the appended row, clamped to the last slot: a caller
        # that decodes past capacity without pruning overwrites the final
        # slot instead of issuing an out-of-bounds append DMA (which
        # hard-crashes the chip)
        idx_bi = [jnp.minimum(_l, cap) - 1 for _l in len_bi]
        # runtime append gate (split-K: only the shard owning the tail
        # slot appends; everyone else treats the idx column as a normal
        # stored token).  Helpers fold away when no mask is given.
        do_app_bi = [(appm_ref[b0 + bi] > 0) if has_appmask else True
                     for bi in range(bpp)]

        def app_when(bi, fn):
            if has_appmask:
                pl.when(do_app_bi[bi])(fn)
            else:
                fn()
        # block-local split-token nibble layout (qz.pack_unit): packed
        # fetch block i holds the hi nibbles of tokens [2i*pblk, +pblk)
        # and the lo nibbles of [(2i+1)*pblk, +pblk) — a length-prefix
        # fetch moves 0.5 B per LIVE token at any live length
        ru_bi = [ix % (2 * pblk) for ix in idx_bi]
        ishi_bi = [ru < pblk for ru in ru_bi]
        prow_bi = [(idx_bi[bi] // (2 * pblk)) * pblk
                   + jnp.where(ishi_bi[bi], ru_bi[bi], ru_bi[bi] - pblk)
                   for bi in range(bpp)]
        # lsb2 plane: 2-bit field `qfld` of the token's unit, row `l2row`
        qfld_bi = [ru // qblk for ru in ru_bi]
        l2row_bi = [(idx_bi[bi] // (2 * pblk)) * qblk + (ru_bi[bi] % qblk)
                    for bi in range(bpp)]
        l2start_bi = [(lr // 8) * 8 for lr in l2row_bi]
        fstart_bi = [(ix // 8) * 8 for ix in idx_bi]
        pstart_bi = [(pr // 8) * 8 for pr in prow_bi]

        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        row_bi = rows_iota // rows         # batch member of each row
        hpp_iota = jax.lax.broadcasted_iota(jnp.int32, (hpp, 1), 0)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
        chunk_s = lane_s // d              # [1, slab] head id per lane
        head_of_row = (rows_iota % rows) // group   # [R, 1]
        g_row = rows_iota % group                   # [R, 1]
        # block-diag lane mask: lane l belongs to row r iff chunk==head(r)
        bd_mask = (chunk_s == head_of_row).astype(jnp.float32)  # [R, slab]

        def rows_of(vals, dtype):
            """[R, 1] column holding vals[member] on each member's rows."""
            out = jnp.full((R, 1), vals[0], dtype)
            for bi in range(1, bpp):
                out = jnp.where(row_bi == bi,
                                jnp.asarray(vals[bi], dtype), out)
            return out

        len_rows = rows_of(len_bi, jnp.int32)       # [R, 1]
        idx_rows = rows_of(idx_bi, jnp.int32)       # [R, 1]
        if has_appmask:
            app_rows = rows_of([jnp.where(a, 1, 0) for a in do_app_bi],
                               jnp.int32) > 0        # [R, 1] bool

        def and_app_rows(m):
            """AND a [R, cols] column mask with each row's append gate."""
            return jnp.logical_and(m, app_rows) if has_appmask else m

        def rep_rows(x):
            """[bpp, cols] -> [R, cols]: member bi's row replicated onto
            its `rows` row-space rows."""
            if bpp == 1:
                return jnp.broadcast_to(x, (R, x.shape[-1]))
            out = jnp.broadcast_to(x[0:1, :], (R, x.shape[-1]))
            for bi in range(1, bpp):
                out = jnp.where(row_bi == bi, x[bi:bi + 1, :], out)
            return out

        hmask3 = hmask_ref[...]            # [bpp, hpp, G]
        alive3 = (jnp.max(hmask3, axis=2, keepdims=True) > 0.0
                  ).astype(jnp.float32)    # [bpp, hpp, 1]

        # per-gate head-liveness from the scalar-prefetched bitmask (bit
        # j*ngate+g = any head alive in gate group g of lane chunk j):
        # pruned head groups skip their K/V DMA lane chunks entirely (the
        # reference's head pruning: missing heads never issue fetches,
        # SURVEY.md §2.8).  Scalar-prefetched so one instance can also
        # issue its SUCCESSOR's gated prologue fetches (cross-instance
        # pipelining).
        # all-ones for ngate >= 32: (1 << 32) - 1 overflows int32 (hit in
        # interpret mode, where hpp == hkv can reach 32 on 7B configs)
        gmask_all = -1 if ngate >= 32 else (1 << ngate) - 1

        def gates_of(bb0, jj):
            """(any, [per-gate bool]) liveness gates of the batch GROUP
            starting at row bb0: a gate is live iff any member keeps a
            head in it (merged fetches move the union; per-row head
            masks zero the dead members downstream)."""
            bits = (alive_ref[bb0] >> (jj * ngate)) & gmask_all
            for bi in range(1, bpp):
                bits = bits | ((alive_ref[bb0 + bi] >> (jj * ngate))
                               & gmask_all)
            return bits > 0, [((bits >> g) & 1) > 0 for g in range(ngate)]

        any_alive, agates = gates_of(b0, j)
        alive_gate = agates if head_gating else None

        # per-layer quantization profile (QuantProfile-as-data,
        # SpAtten.scala:71-74): pass-1 reads the msb plane (4-bit), msb +
        # lsb2 (6-bit), or the full plane (8-bit — and never requants)
        if mixed_profile:
            bits = qbits_ref[lv]
            p1_msb = bits < 8              # pass-1 uses the nibble plane
            p1_full8 = bits == 8           # pass-1 reads the full plane
            use6 = (bits == 6) if has_lsb2 else (bits < 0)
        else:
            p1_msb = True
            p1_full8 = False
            use6 = None
        # per-row head mask ([R,1]) from scalar element reads (no reshape
        # of the [bpp, hpp, G] lane layout)
        hmask_rows = jnp.zeros((R, 1), jnp.float32)
        for bi in range(bpp):
            for h in range(hpp):
                for g in range(group):
                    sel = (head_of_row == h) & (g_row == g)
                    if bpp > 1:
                        sel = sel & (row_bi == bi)
                    hmask_rows = hmask_rows + jnp.where(
                        sel, hmask3[bi, h, g], 0.0)

        # ------------------------------------------------------------------
        # LAUNCH: every DMA reading the old planes starts now.
        # ------------------------------------------------------------------
        def app_slice(ref, start, bb):
            return ref.at[lv, bb, pl.ds(start, 8), pl.ds(lane0, slab)]

        # scale / importance slices stream through plain scratch, one
        # [hpp, C] DMA per group member (a merged [bpp, hpp, C] copy into
        # the 2D row-space scratch would need a sublane-offset dest that
        # Mosaic requires 8-aligned).  DMA path when the head count is
        # DMA-sliceable; otherwise (`sc_blocked`: Mosaic rejects copies
        # whose sublane extent isn't 8-aligned, e.g. GPT-2's 12 heads)
        # the operands arrive as layer-indexed VMEM blocks and move to
        # scratch with vector assigns.
        def sc_slice(ref, bb):
            # prefix-sliced on the column dim: under a capacity rung the
            # stored planes carry more columns than the kernel's window
            if npj == 1:
                return ref.at[lv, bb, :, pl.ds(0, cap)]
            return ref.at[lv, bb, pl.ds(j * hpp, hpp), pl.ds(0, cap)]

        # length-gated metadata IO: the [*, hpp, C] scale/importance
        # planes move as ONE descriptor per plane sized to the smallest
        # static prefix rung (cap/8, cap/4, cap/2, cap) covering the
        # group's live window.  Full-capacity metadata DMA rivals the
        # live KV bytes at serving shapes (round-3: ~1/4 of spatten-mode
        # traffic was length-independent metadata), but fine-grained
        # chunking would ADD descriptor issues to an issue-bound
        # instance — the rung ladder bounds over-fetch at 2x live while
        # keeping exactly one issue per plane (rungs are mutually
        # exclusive).  Scratch beyond the fetched rung holds stale bytes
        # that every consumer masks (live-block gating + per-row length
        # masks); columns past `length` are undefined by contract.
        def sc_ladder_io(plane_ref, scr, p, do_wait, write=False):
            prev = 0
            for ri, r in enumerate(sc_rungs):
                cond = (len_max > prev)
                if r < cap:
                    cond = cond & (len_max <= r)
                prev = r

                @pl.when(cond)
                def _(r=r, ri=ri):
                    cds = pl.ds(0, r)
                    if npj == 1:
                        pairs = [(plane_ref.at[lv, pl.ds(b0, bpp),
                                               :, cds],
                                  scr.at[:, :, cds], scm_sem.at[p, ri])]
                    else:
                        pairs = [(plane_ref.at[lv, b0 + bi,
                                               pl.ds(j * hpp, hpp), cds],
                                  scr.at[bi, :, cds], scm_sem.at[p, ri])
                                 for bi in range(bpp)]
                    for big, small, sem in pairs:
                        cp = (pltpu.make_async_copy(small, big, sem)
                              if write
                              else pltpu.make_async_copy(big, small, sem))
                        cp.wait() if do_wait else cp.start()

        if sc_blocked:
            ksc_scr[0] = kscale_in[0, 0]
            vsc_scr[0] = vscale_in[0, 0]
            if accumulate_importance:
                imp_scr[0] = imp_in[0, 0]
        elif sc_ladder_read:
            sc_ladder_io(kscale_in, ksc_scr, 0, do_wait=False)
            sc_ladder_io(vscale_in, vsc_scr, 1, do_wait=False)
            if accumulate_importance:
                sc_ladder_io(imp_in, imp_scr, 2, do_wait=False)
        elif npj == 1:
            # contiguous batch rows: ONE [bpp, hpp, C] descriptor per
            # plane for the whole group (3 issues instead of 3*bpp)
            ksc_reads = [pltpu.make_async_copy(
                kscale_in.at[lv, pl.ds(b0, bpp), :, pl.ds(0, cap)],
                ksc_scr, sc_sem.at[0, 0])]
            vsc_reads = [pltpu.make_async_copy(
                vscale_in.at[lv, pl.ds(b0, bpp), :, pl.ds(0, cap)],
                vsc_scr, sc_sem.at[1, 0])]
            for cpy in ksc_reads + vsc_reads:
                cpy.start()
            if accumulate_importance:
                imp_reads = [pltpu.make_async_copy(
                    imp_in.at[lv, pl.ds(b0, bpp), :, pl.ds(0, cap)],
                    imp_scr, sc_sem.at[2, 0])]
                for cpy in imp_reads:
                    cpy.start()
        else:
            ksc_reads = [pltpu.make_async_copy(
                sc_slice(kscale_in, b0 + bi), ksc_scr.at[bi],
                sc_sem.at[0, bi]) for bi in range(bpp)]
            vsc_reads = [pltpu.make_async_copy(
                sc_slice(vscale_in, b0 + bi), vsc_scr.at[bi],
                sc_sem.at[1, bi]) for bi in range(bpp)]
            for cpy in ksc_reads + vsc_reads:
                cpy.start()
            if accumulate_importance:
                imp_reads = [pltpu.make_async_copy(
                    sc_slice(imp_in, b0 + bi), imp_scr.at[bi],
                    sc_sem.at[2, bi]) for bi in range(bpp)]
                for cpy in imp_reads:
                    cpy.start()

        if not skip_append:
            for bi in range(bpp):
                def _app_reads(bi=bi):
                    bb = b0 + bi
                    pltpu.make_async_copy(
                        app_slice(kfull_out, fstart_bi[bi], bb),
                        kapp_scr.at[bi], app_sem.at[0, bi]).start()
                    pltpu.make_async_copy(
                        app_slice(vfull_out, fstart_bi[bi], bb),
                        vapp_scr.at[bi], app_sem.at[1, bi]).start()
                    if quant_enabled:
                        # dense mode never reads the packed nibble planes,
                        # so their append RMW is skipped entirely
                        pltpu.make_async_copy(
                            app_slice(kmsb_out, pstart_bi[bi], bb),
                            kmapp_scr.at[bi], app_sem.at[2, bi]).start()
                    if vmsb_on:
                        pltpu.make_async_copy(
                            app_slice(vmsb_out, pstart_bi[bi], bb),
                            vmapp_scr.at[bi], app_sem.at[3, bi]).start()
                    if has_lsb2:
                        pltpu.make_async_copy(
                            app_slice(klsb2_out, l2start_bi[bi], bb),
                            kl2app_scr.at[bi], app_sem.at[4, bi]).start()
                app_when(bi, _app_reads)

        # -- rotating-slot DMA streams (manual prefetch pipeline):
        # block i of a plane lands in slot i % nslots; the consumer waits
        # slot i, uses it, then immediately starts block i + nslots into
        # the freed slot.  When `head_gating`, every K fetch splits into
        # per-head-group lane DMAs gated on that group's liveness (the
        # reference's head pruning: pruned heads never issue fetches).
        glanes = gate_hpg * d

        # cross-instance pipelining: grid instances run sequentially on
        # the core, so each instance issues its SUCCESSOR's prologue
        # fetches as soon as its own stream slots fall idle — the next
        # instance starts with its pipeline already filling (the per-
        # instance DMA fill latency otherwise multiplies by B x J x L).
        # Targets are (batch row, lane chunk, length, liveness gates)
        # tuples; `self_tgt` is this instance, `succ_tgt` the next one.
        ngroups = batch // bpp
        flat = bg * npj + j
        # SPATTEN_NO_XINST: debug escape hatch — with cross-instance
        # prefetch disabled every instance fills its own pipeline
        if _XINST:
            is_first = flat == 0
            has_succ = flat + 1 < ngroups * npj
        else:
            is_first = flat >= 0
            has_succ = flat < 0
        nbg = jnp.minimum((flat + 1) // npj, ngroups - 1)
        nb0 = nbg * bpp
        nj_ = (flat + 1) % npj
        any_succ, gates_succ = gates_of(nb0, nj_)
        len_succ = lengths_ref[nb0]
        for bi in range(1, bpp):
            len_succ = jnp.maximum(len_succ, lengths_ref[nb0 + bi])
        # targets are (group start row, lane offset, group max length,
        # group any-alive, group liveness gates)
        self_tgt = (b0, lane0, len_max, any_alive, alive_gate)
        succ_tgt = (nb0, nj_ * slab, len_succ, any_succ,
                    gates_succ if head_gating else None)

        def k_stream_io(plane, scr, sem, i, do_wait, cond, gates, bb0,
                        ll, blk=pblk):
            """Fetch block i (`blk` rows) of `plane` (all bpp group
            members, one descriptor) into slot i%|scr| (or wait it)."""
            slot = i % scr.shape[0]

            def cp(g=None):
                if g is None:
                    return pltpu.make_async_copy(
                        plane.at[lv, pl.ds(bb0, bpp),
                                 pl.ds(i * blk, blk), pl.ds(ll, slab)],
                        scr.at[slot], sem.at[slot, 0])
                return pltpu.make_async_copy(
                    plane.at[lv, pl.ds(bb0, bpp), pl.ds(i * blk, blk),
                             pl.ds(ll + g * glanes, glanes)],
                    scr.at[slot, :, :, pl.ds(g * glanes, glanes)],
                    sem.at[slot, g])

            if gates is None:
                @pl.when(cond)
                def _():
                    cp().wait() if do_wait else cp().start()
            else:
                # all-gates-live fast path: ONE full-slab descriptor when
                # every head group is live (the overwhelmingly common
                # runtime case — per-gate splits exist to skip pruned
                # heads' lanes, but each split costs a scalar-core issue
                # and the instance is descriptor-issue-bound).  Start and
                # wait branch on the same scalar gates, so they pair.
                allg = gates[0]
                for g in range(1, ngate):
                    allg = allg & gates[g]

                @pl.when(cond & allg)
                def _():
                    c = cp()
                    c.wait() if do_wait else c.start()
                for g in range(ngate):
                    @pl.when(cond & gates[g] & jnp.logical_not(allg))
                    def _(g=g):
                        c = cp(g)
                        c.wait() if do_wait else c.start()

        def msb_io(i, do_wait, tgt=None):
            bb0, ll, len_t, any_t, gates = self_tgt if tgt is None else tgt
            cond = (2 * i * pblk < len_t)
            if mixed_profile:
                cond = cond & p1_msb       # 8-bit layers skip the nibble
            if not head_gating:
                cond = cond & any_t
                gates = None
            k_stream_io(kmsb_out, kmsb_scr, kmsb_sem, i, do_wait, cond,
                        gates, bb0, ll)

        def lsb2_io(i, do_wait, tgt=None):
            """2-bit refinement block i (same token unit as msb block i);
            fetched only under a 6-bit profile.  Like the msb/full
            streams, pruned head groups skip their lane chunks (the
            reference's pruned heads never issue any fetch)."""
            bb0, ll, len_t, any_t, gates = self_tgt if tgt is None else tgt
            slot = i % ls
            cond = use6 & (2 * i * pblk < len_t)
            if not head_gating:
                cond = cond & any_t
                gates = None

            def cp(g=None):
                if g is None:
                    return pltpu.make_async_copy(
                        klsb2_out.at[lv, pl.ds(bb0, bpp),
                                     pl.ds(i * qblk, qblk),
                                     pl.ds(ll, slab)],
                        klsb2_scr.at[slot], klsb2_sem.at[slot, 0])
                return pltpu.make_async_copy(
                    klsb2_out.at[lv, pl.ds(bb0, bpp),
                                 pl.ds(i * qblk, qblk),
                                 pl.ds(ll + g * glanes, glanes)],
                    klsb2_scr.at[slot, :, :, pl.ds(g * glanes, glanes)],
                    klsb2_sem.at[slot, g])

            if gates is None:
                @pl.when(cond)
                def _():
                    cp().wait() if do_wait else cp().start()
            else:
                allg = gates[0]
                for g in range(1, ngate):
                    allg = allg & gates[g]

                @pl.when(cond & allg)
                def _():
                    c = cp()
                    c.wait() if do_wait else c.start()
                for g in range(ngate):
                    @pl.when(cond & gates[g] & jnp.logical_not(allg))
                    def _(g=g):
                        c = cp(g)
                        c.wait() if do_wait else c.start()

        def kfull_io(i, do_wait, gates, tgt=None):
            bb0, ll, len_t, any_t, _ = self_tgt if tgt is None else tgt
            cond = (i * kfblk < len_t)
            if gates is None and head_gating is False:
                cond = cond & any_t
            k_stream_io(kfull_out, kfull_scr, kfull_sem, i, do_wait, cond,
                        gates, bb0, ll, blk=kfblk)

        def v_io(f, do_wait, extra_cond=None, tgt=None):
            bb0, ll, len_t, _, _ = self_tgt if tgt is None else tgt
            slot = f % vs
            cond = (f * fblk < len_t)
            if extra_cond is not None:
                cond = cond & extra_cond

            @pl.when(cond)
            def _():
                cp = pltpu.make_async_copy(
                    vfull_out.at[lv, pl.ds(bb0, bpp),
                                 pl.ds(f * fblk, fblk), pl.ds(ll, slab)],
                    v_scr.at[slot], v_sem.at[slot])
                cp.wait() if do_wait else cp.start()

        def prologue(tgt):
            """Issue instance `tgt`'s pipeline-fill DMAs (K stream, and
            the V stream when its gating is static)."""
            _, _, _, any_t, gates_t = tgt
            if quant_enabled:
                for i in range(ps):
                    msb_io(i, do_wait=False, tgt=tgt)
                if has_lsb2:
                    for i in range(ls):
                        lsb2_io(i, do_wait=False, tgt=tgt)
                if mixed_profile:
                    @pl.when(p1_full8)
                    def _():
                        for i in range(ts):
                            kfull_io(i, do_wait=False,
                                     gates=gates_t, tgt=tgt)
            else:
                for i in range(ts):
                    kfull_io(i, do_wait=False, gates=gates_t, tgt=tgt)
            if not do_vprune:
                for f in range(vs):
                    v_io(f, do_wait=False, extra_cond=any_t, tgt=tgt)
            else:
                # speculative: the sink block (block 0) is kept in
                # essentially every step (StreamingLLM attention mass),
                # so fetch it before the keep mask exists — this hides
                # the P·V pipeline-fill latency behind phase A
                v_io(0, do_wait=False, extra_cond=any_t, tgt=tgt)

        # the first instance fills its own pipeline; every other
        # instance's prologue was issued by its predecessor
        @pl.when(is_first)
        def _():
            prologue(self_tgt)

        # ------------------------------------------------------------------
        # Quantize the new K/V rows in registers (all heads in one lane
        # row).  Semantics bit-match qz.update_token.
        # ------------------------------------------------------------------
        h3_iota = jax.lax.broadcasted_iota(jnp.int32, (bpp, hpp, 1), 1)

        def quant_row(rowm):               # [bpp, slab] f32
            """Per-head-chunk symmetric int8 quant of every member's new
            row at once.  Returns (q8 [bpp,slab] f32-valued ints,
            scale_lane [bpp,slab], scale per (member, head) [bpp,hpp,1])."""
            absr = jnp.abs(rowm)
            sc_h = []
            for h in range(hpp):
                amax = jnp.max(jnp.where(chunk_s == h, absr, 0.0),
                               axis=-1, keepdims=True)          # [bpp, 1]
                sc_h.append(jnp.where(amax > 0, amax / 127.0, 1.0))
            sc_lane = jnp.zeros((bpp, slab), jnp.float32)
            sc3 = jnp.zeros((bpp, hpp, 1), jnp.float32)
            for h in range(hpp):
                sc_lane = sc_lane + jnp.where(chunk_s == h, sc_h[h], 0.0)
                sc3 = sc3 + jnp.where(h3_iota == h, sc_h[h][:, None, :],
                                      0.0)
            q8 = jnp.clip(jnp.round(rowm / sc_lane), -127, 127)
            return q8, sc_lane, sc3

        knew = knew_ref[:, 0, :].astype(jnp.float32)    # [bpp, slab]
        vnew = vnew_ref[:, 0, :].astype(jnp.float32)
        kq8, ksc_lane, ksc_col3 = quant_row(knew)
        vq8, vsc_lane, vsc_col3 = quant_row(vnew)
        # ------------------------------------------------------------------
        # Queries: block-diagonal [R, slab] (group members stacked along
        # rows); optional int8 quant for integer MXU dots (the reference
        # quantizes queries too).
        # ------------------------------------------------------------------
        if bpp == 1:
            q_all = qbd_ref[0].astype(jnp.float32)      # [rows, slab]
        else:
            q_all = jnp.concatenate(
                [qbd_ref[bi] for bi in range(bpp)], axis=0
            ).astype(jnp.float32)                       # [R, slab]
        if quantize_queries:
            qamax = jnp.max(jnp.abs(q_all), axis=-1, keepdims=True)
            qscale = jnp.maximum(qamax, 1e-20) / 127.0
            qf = jnp.clip(jnp.round(q_all / qscale), -127, 127)
            q_mat = qf.astype(jnp.int8) if int_dots else qf
            qsum = jnp.sum(qf, axis=-1, keepdims=True)
            rowscale = qscale                           # [rows, 1]
            acc = jnp.int32 if int_dots else jnp.float32
        else:
            q_mat = q_all
            qf = q_all
            qsum = jnp.sum(q_all, axis=-1, keepdims=True)
            rowscale = 1.0
            acc = jnp.float32

        # new-token score patches: the appended row's K may race the
        # fetch, so its column is recomputed from registers (each row
        # against ITS member's new K row)
        # unsigned nibble of the new K row (n = k4 + 8, matching kblk_msb)
        k4new = ((((kq8.astype(jnp.int32)) >> 4) & 0xF) ^ 8
                 ).astype(jnp.float32)                          # [bpp,slab]
        patch1 = jnp.sum(qf * rep_rows(k4new), axis=-1,
                         keepdims=True)                         # [R, 1]
        patch_full = jnp.sum(qf * rep_rows(kq8), axis=-1, keepdims=True)

        # integer dots must pin DEFAULT precision: a global
        # jax_default_matmul_precision=highest stamps fp32 contract
        # precision onto them, which Mosaic rejects ("Bad lhs type")
        _idot_prec = jax.lax.Precision.DEFAULT

        def q_rows(bi):
            return q_mat[bi * rows:(bi + 1) * rows] if bpp > 1 else q_mat

        def qf_rows(bi):
            return qf[bi * rows:(bi + 1) * rows] if bpp > 1 else qf

        def score_block(bi, kblk, target_scr, t, blk=pblk):
            s_blk = jax.lax.dot_general(
                q_rows(bi), kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=acc,
                precision=_idot_prec if int_dots else None)
            target_scr[bi * rows:(bi + 1) * rows, pl.ds(t * blk, blk)] \
                = s_blk.astype(jnp.float32)

        def kblk_msb(i, hi, bi):
            """Unpack the biased nibble n = k4 + 8 (stored biased by
            qz._nibble, so no xor here; int32 vectors — Mosaic lacks
            int16 shifts); the +8 bias folds into the score offset:
            k8 ~ k4*16 + MID == n*16 + (MID - 128)."""
            rows_k = kmsb_scr[i % ps, bi]
            nib = rows_k.astype(jnp.int32)
            n = (nib >> 4) if hi else (nib & 0xF)
            return n.astype(jnp.int8) if int_dots \
                else n.astype(jnp.float32)

        def kblk_full(t, bi):
            rows_k = kfull_scr[t % ts, bi]
            if quant_enabled and not _NO_SHARE:  # uint8 bytes -> int8
                rows_k = jax.lax.bitcast_convert_type(rows_k, jnp.int8)
            return rows_k if int_dots else rows_k.astype(jnp.float32)

        def msb_scores_pipeline():
            """Streamed pass-1 scoring: packed block i carries the hi
            nibbles of tokens [2i*pblk, +pblk) and the lo nibbles of
            [(2i+1)*pblk, +pblk); both halves score as soon as the block
            lands, then the freed slot prefetches block i + ps.  Under a
            6-bit profile the 2-bit plane streams alongside and refines
            the nibble scores in place: scr <- 4*s_n4 + s_l2 == q . n6.

            With integer-valued queries (quantize_queries) the two
            nibble halves score WITHOUT a per-half unpack: the stored
            nibbles are biased non-negative (n = k4 + 8, qz._nibble), so
            byte == 16*n_hi + n_lo and one matmul over the raw packed
            bytes yields s_byte == 16*s_hi + s_lo; one hi-extraction
            (astype, *1/16, floor) and a second matmul give s_hi, and
            s_lo == s_byte - 16*s_hi.  All quantities are integers
            < 2^24, so f32 inputs and accumulation are EXACT —
            bit-identical to the unpacked int path at half the VPU work
            (the kernel's phase-A bottleneck).  This is the TPU form of
            MatrixFetcher's bitwidth-converter (MatrixFetcher.scala:
            333-361): the 'conversion' rides the MXU for free."""
            for i in range(num_pblk):
                msb_io(i, do_wait=True)

                for bi in range(bpp):
                    r0 = bi * rows
                    if quantize_queries:
                        @pl.when(2 * i * pblk < len_bi[bi])
                        def _(i=i, bi=bi, r0=r0):
                            # Mosaic has no direct uint8 -> f32 cast
                            byte_f = kmsb_scr[i % ps, bi].astype(
                                jnp.int32).astype(jnp.float32)
                            a_f = jnp.floor(byte_f * 0.0625)
                            # DEFAULT precision (single-pass bf16 inputs)
                            # is EXACT here: every operand is an integer
                            # < 2^8
                            s_hi = jax.lax.dot_general(
                                qf_rows(bi), a_f, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
                            scores_scr[r0:r0 + rows,
                                       pl.ds(2 * i * pblk, pblk)] = s_hi

                            @pl.when((2 * i + 1) * pblk < len_bi[bi])
                            def _():
                                s_byte = jax.lax.dot_general(
                                    qf_rows(bi), byte_f,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
                                scores_scr[
                                    r0:r0 + rows,
                                    pl.ds((2 * i + 1) * pblk, pblk)
                                ] = s_byte - 16.0 * s_hi
                    else:
                        @pl.when(2 * i * pblk < len_bi[bi])
                        def _(i=i, bi=bi):
                            score_block(bi, kblk_msb(i, True, bi),
                                        scores_scr, 2 * i)

                        @pl.when((2 * i + 1) * pblk < len_bi[bi])
                        def _(i=i, bi=bi):
                            score_block(bi, kblk_msb(i, False, bi),
                                        scores_scr, 2 * i + 1)
                if has_lsb2:
                    lsb2_io(i, do_wait=True)
                    for t_off in (0, 1):
                        t = 2 * i + t_off
                        for bi in range(bpp):
                            @pl.when(use6 & (t * pblk < len_bi[bi]))
                            def _(i=i, t=t, t_off=t_off, bi=bi):
                                pk = klsb2_scr[i % ls, bi].astype(jnp.int32)
                                for qh in (0, 1):
                                    qg = t_off * 2 + qh
                                    l2 = (pk >> (6 - 2 * qg)) & 0x3
                                    l2 = (l2.astype(jnp.int8) if int_dots
                                          else l2.astype(jnp.float32))
                                    s_l2 = jax.lax.dot_general(
                                        q_rows(bi), l2,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=acc,
                                        precision=(_idot_prec if int_dots
                                                   else None)
                                    ).astype(jnp.float32)
                                    cds = pl.ds(t * pblk + qh * qblk, qblk)
                                    r0 = bi * rows
                                    scores_scr[r0:r0 + rows, cds] = \
                                        scores_scr[r0:r0 + rows, cds] \
                                        * 4.0 + s_l2
                    if i + ls < num_pblk:
                        lsb2_io(i + ls, do_wait=False)
                if i + ps < num_pblk:
                    msb_io(i + ps, do_wait=False)

        def kfull_scores_pipeline(target_scr, gates):
            for t in range(nkfb):
                kfull_io(t, do_wait=True, gates=gates)

                for bi in range(bpp):
                    @pl.when(t * kfblk < len_bi[bi])
                    def _(t=t, bi=bi):
                        score_block(bi, kblk_full(t, bi), target_scr, t,
                                    blk=kfblk)
                if t + ts < nkfb:
                    kfull_io(t + ts, do_wait=False, gates=gates)

        # --- pass 1: QK on the profile's plane set (4/6-bit nibble paths
        # or the full plane — statically the full plane when dense) ------
        if quant_enabled and mixed_profile:
            @pl.when(p1_msb)
            def _():
                msb_scores_pipeline()

            @pl.when(p1_full8)
            def _():
                kfull_scores_pipeline(
                    scores_scr, alive_gate if head_gating else None)
        elif quant_enabled:
            msb_scores_pipeline()
        else:
            kfull_scores_pipeline(
                scores_scr, alive_gate if head_gating else None)

        # scale/importance DMAs (started at instance entry) are consumed
        # only now — their latency hid behind the whole score pipeline
        if sc_ladder_read:
            sc_ladder_io(kscale_in, ksc_scr, 0, do_wait=True)
            sc_ladder_io(vscale_in, vsc_scr, 1, do_wait=True)
        elif not sc_blocked:
            for cpy in ksc_reads + vsc_reads:
                cpy.wait()
        # patch each member's appended column with its new-row scales
        col3 = jax.lax.broadcasted_iota(jnp.int32, (bpp, hpp, cap), 2)
        b3_iota = jax.lax.broadcasted_iota(jnp.int32, (bpp, 1, 1), 0)
        idx3 = jnp.full((bpp, 1, 1), idx_bi[0], jnp.int32)
        for bi in range(1, bpp):
            idx3 = jnp.where(b3_iota == bi, idx_bi[bi], idx3)
        app_col3 = col3 == idx3
        if has_appmask:
            app3 = jnp.full((bpp, 1, 1), do_app_bi[0])
            for bi in range(1, bpp):
                app3 = jnp.where(b3_iota == bi, do_app_bi[bi], app3)
            app_col3 = jnp.logical_and(app_col3, app3)
        ksc_scr[...] = jnp.where(app_col3, ksc_col3,
                                 ksc_scr[...].astype(jnp.float32)
                                 ).astype(sc_dtype)
        vsc_scr[...] = jnp.where(app_col3, vsc_col3,
                                 vsc_scr[...].astype(jnp.float32)
                                 ).astype(sc_dtype)
        if sc_blocked:
            # aliased VMEM blocks write back on instance exit
            kscale_out[0, 0] = ksc_scr[0]
            vscale_out[0, 0] = vsc_scr[0]
        else:
            # the scale planes are aliased in place, so HBM already holds
            # every unchanged column — write back only the (lane-aligned)
            # window holding each member's appended column
            scwin = min(128, cap)
            cstart_bi = [(ix // scwin) * scwin for ix in idx_bi]

            def sc_win(ref, bb, cstart):
                if npj == 1:
                    return ref.at[lv, bb, :, pl.ds(cstart, scwin)]
                return ref.at[lv, bb, pl.ds(j * hpp, hpp),
                              pl.ds(cstart, scwin)]

            sc_wbs = []
            for bi in range(bpp):
                sc_wbs.append(pltpu.make_async_copy(
                    ksc_scr.at[bi, :, pl.ds(cstart_bi[bi], scwin)],
                    sc_win(kscale_out, b0 + bi, cstart_bi[bi]),
                    sc_sem.at[3, bi]))
                sc_wbs.append(pltpu.make_async_copy(
                    vsc_scr.at[bi, :, pl.ds(cstart_bi[bi], scwin)],
                    sc_win(vscale_out, b0 + bi, cstart_bi[bi]),
                    sc_sem.at[4, bi]))
            for cpy in sc_wbs:
                cpy.start()

        # per-block scale slices in ROW space (row r uses its member's +
        # head's scales); every consumer below reads a [R, blk] slice of
        # a LIVE block
        def _sc_rows(scr, lo, size):
            parts = []
            for bi in range(bpp):
                pb = scr[bi, :, pl.ds(lo, size)].astype(jnp.float32)
                parts.append(jnp.repeat(pb, group, axis=0)
                             if group > 1 else pb)
            return (jnp.concatenate(parts, axis=0) if bpp > 1
                    else parts[0])

        def ksc_blk(lo, size):
            return _sc_rows(ksc_scr, lo, size)

        def vsc_blk(lo, size):
            return _sc_rows(vsc_scr, lo, size)

        if quant_enabled and mixed_profile:
            # scr-equivalent value per profile: n4 (x16), n6 (x4), or k8
            mid6 = qz.MIDPOINT6 - 128.0
            mid4 = qz.MSB_MIDPOINT - 128.0
            if has_lsb2:
                mult = jnp.where(bits == 8, 1.0,
                                 jnp.where(bits == 6, 4.0, 16.0))
                moff = jnp.where(bits == 8, 0.0,
                                 jnp.where(bits == 6, mid6, mid4))
                k6new = ((kq8.astype(jnp.int32) >> 2) & 0x3F) ^ 32
                patch6 = jnp.sum(
                    qf * rep_rows(k6new.astype(jnp.float32)),
                    axis=-1, keepdims=True)
                patch = jnp.where(bits == 8, patch_full,
                                  jnp.where(bits == 6, patch6, patch1))
            else:
                mult = jnp.where(bits == 8, 1.0, 16.0)
                moff = jnp.where(bits == 8, 0.0, mid4)
                patch = jnp.where(bits == 8, patch_full, patch1)
            mult_sm = mult * sm_scale
            moff_sm = moff * sm_scale
        elif quant_enabled:
            # real score = (q*qscale)·((k4*16 + MID)*kscale)
            mult_sm = 16.0 * sm_scale
            moff_sm = (qz.MSB_MIDPOINT - 128.0) * sm_scale
            patch = patch1
        else:
            mult_sm = sm_scale
            moff_sm = 0.0
            patch = patch_full
        # scaled score of block t == ksc_blk * (s_raw * rs_mult + off2);
        # the requant (full-plane) pass uses rs_full with zero offset
        rs_mult = rowscale * mult_sm               # [rows, 1] (or scalar)
        has_off = quant_enabled                    # dense: moff_sm == 0
        off2 = (rowscale * qsum) * moff_sm if has_off else None  # [rows, 1]
        rs_full = rowscale * sm_scale

        # ------------------------------------------------------------------
        # Live-window epilogue: every column-space pass below runs per
        # LIVE pblk block (gated on `length`), never over the full
        # capacity — the engine's steady state keeps ~0.2-0.5x of the
        # physical capacity live (cascade budgets), and full-capacity VPU
        # passes would otherwise dominate the instance at large caps.
        # Softmax is two block passes (scale + running max, then
        # exp + denominator); the max softmax probability for the requant
        # decision is 1/denominator EXACTLY (the max column's e ==
        # exp(0) == 1), so no third pass is needed.
        # ------------------------------------------------------------------
        col_p = jax.lax.broadcasted_iota(jnp.int32, (R, pblk), 1)

        def scale_pass():
            """scores_scr <- scaled+masked pass-1 scores (patched at the
            appended column), block-gated on the GROUP's max length with
            per-row exact masking; mrow_scr <- running row max.  Blocks a
            short member never scored hold garbage in its rows — masked
            to MASK_VALUE here before anything reads them."""
            mrow_scr[...] = jnp.full((R, 128), MASK_VALUE, jnp.float32)
            for t in range(num_tblk):
                @pl.when(t * pblk < len_max)
                def _(t=t):
                    colt = col_p + t * pblk
                    s = scores_scr[:, pl.ds(t * pblk, pblk)]
                    s = jnp.where(and_app_rows(colt == idx_rows), patch, s)
                    s = s * rs_mult
                    if has_off:
                        s = s + off2
                    s = s * ksc_blk(t * pblk, pblk)
                    s = jnp.where(colt < len_rows, s, MASK_VALUE)
                    scores_scr[:, pl.ds(t * pblk, pblk)] = s
                    mrow_scr[...] = jnp.maximum(
                        mrow_scr[...], jnp.max(s, axis=-1, keepdims=True))

        def kfull_merge_pipeline(gates, fire_rows):
            """Requant recompute FOLDED into the full-plane stream: per
            live block, rescore on the streamed int8 rows and merge the
            firing rows in place — no second [R, cap] score plane, no
            separate merge pass (halves the requant VPU work and frees
            R*cap*4 bytes of VMEM for batch grouping).  Rows of members
            past their own length and rows whose gate did not fire see
            garbage raw scores; both are masked (len mask / fire_rows
            select) exactly as the two-pass version masked its scores2
            garbage."""
            mrow_scr[...] = jnp.full((R, 128), MASK_VALUE, jnp.float32)
            col_k = jax.lax.broadcasted_iota(jnp.int32, (R, kfblk), 1)
            for t in range(nkfb):
                kfull_io(t, do_wait=True, gates=gates)

                @pl.when(t * kfblk < len_max)
                def _(t=t):
                    parts = [jax.lax.dot_general(
                        q_rows(bi), kblk_full(t, bi),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=acc,
                        precision=_idot_prec if int_dots else None
                    ).astype(jnp.float32) for bi in range(bpp)]
                    raw = (jnp.concatenate(parts, axis=0) if bpp > 1
                           else parts[0])                # [R, kfblk]
                    colt = col_k + t * kfblk
                    s2 = jnp.where(and_app_rows(colt == idx_rows),
                                   patch_full, raw)
                    s2 = (s2 * rs_full) * ksc_blk(t * kfblk, kfblk)
                    s2 = jnp.where(colt < len_rows, s2, MASK_VALUE)
                    s = jnp.where(fire_rows, s2,
                                  scores_scr[:, pl.ds(t * kfblk, kfblk)])
                    scores_scr[:, pl.ds(t * kfblk, kfblk)] = s
                    mrow_scr[...] = jnp.maximum(
                        mrow_scr[...], jnp.max(s, axis=-1, keepdims=True))
                if t + ts < nkfb:
                    kfull_io(t + ts, do_wait=False, gates=gates)

        def exp_pass():
            """probs_scr <- UNNORMALIZED e = exp(s - m) per live block
            (masked columns underflow to exactly 0); den_scr <- row sums;
            emv_scr <- running max of e*vscale (integer-P·V weight
            bound)."""
            m = jnp.max(mrow_scr[...], axis=-1, keepdims=True)
            den_scr[...] = jnp.zeros((R, 128), jnp.float32)
            if pv_int8:
                emv_scr[...] = jnp.zeros((R, 128), jnp.float32)
            for t in range(num_tblk):
                @pl.when(t * pblk < len_max)
                def _(t=t):
                    e = jnp.exp(scores_scr[:, pl.ds(t * pblk, pblk)] - m)
                    probs_scr[:, pl.ds(t * pblk, pblk)] = \
                        e.astype(e_dtype)
                    den_scr[...] = den_scr[...] + jnp.sum(
                        e, axis=-1, keepdims=True)
                    if pv_int8:
                        emv_scr[...] = jnp.maximum(
                            emv_scr[...],
                            jnp.max(e * vsc_blk(t * pblk, pblk),
                                    axis=-1, keepdims=True))

        scale_pass()
        exp_pass()

        def row_den():
            return jnp.maximum(
                jnp.max(den_scr[...], axis=-1, keepdims=True), 1e-30)

        # --- requant decision (RequantDecision.scala:69-76) --------------
        # max prob is pre-head-mask (only fully-dead groups zero), matching
        # the reference's RequantDecision placement before head masking
        maxp_rows = 1.0 / row_den()                     # [R, 1]
        mp_bi = []                                      # per member [hpp,1]
        for bi in range(bpp):
            mslice = maxp_rows[bi * rows:(bi + 1) * rows]
            hrow = head_of_row[bi * rows:(bi + 1) * rows]
            mp_h = jnp.zeros((hpp, 1), jnp.float32)
            for h in range(hpp):
                mp = jnp.max(jnp.where(hrow == h, mslice, 0.0))
                mp_h = mp_h + jnp.where(hpp_iota == h, mp, 0.0)
            mp_h = mp_h * alive3[bi]
            mp_bi.append(mp_h)
            maxp_ref[bi] = jnp.broadcast_to(mp_h, (hpp, 128))

        if do_requant:
            need_bi = []
            for bi in range(bpp):
                need_h = (alive3[bi] > 0) & \
                    (mp_bi[bi] < requant_threshold)      # [hpp, 1]
                if mixed_profile:
                    # an 8-bit pass-1 already read the full plane
                    need_h = need_h & p1_msb
                need_bi.append(need_h)
                need_ref[bi] = jnp.broadcast_to(need_h.astype(jnp.int32),
                                                (hpp, 128))
            # concat in f32: Mosaic cannot sublane-concat i1 masks (the
            # lowering bitcasts vregs i1->i32, rejected on v5e)
            fire_parts = [jnp.repeat(nh.astype(jnp.float32), group, axis=0)
                          if group > 1 else nh.astype(jnp.float32)
                          for nh in need_bi]
            fire_rows = (jnp.concatenate(fire_parts, axis=0) if bpp > 1
                         else fire_parts[0]) > 0.5      # [R, 1] bool
            # one packed scalar carries every per-head-group fire count
            # (single vector->scalar transfer); stride leaves room for up
            # to bpp*gate_hpg firing heads per group (union over members:
            # the merged recompute fetch moves the group's bytes).  When
            # the counts don't fit the exact-f32-sum range (many gates,
            # e.g. interpret mode's hpp == hkv == 32), fall back to one
            # vector->scalar reduction per gate — slower issue, same
            # semantics (auto-bpp avoids this regime on the perf path).
            stride = max(1, bpp * gate_hpg).bit_length()
            if ngate * stride <= 22:
                # exact int32 shifts (exp2 is inexact for exponents >=
                # 13 on some backends — see the V-gate packing above)
                gpow = jnp.left_shift(
                    jnp.int32(1), (hpp_iota // gate_hpg) * stride)
                rbits = jnp.zeros((), jnp.int32)
                for bi in range(bpp):
                    rbits = rbits + jnp.sum(
                        jnp.where(need_bi[bi], gpow, jnp.int32(0)))
                any_need = rbits > 0
                gmask = (1 << stride) - 1
                gate_fire = [((rbits >> (g * stride)) & gmask) > 0
                             for g in range(ngate)]
            else:
                need_any = need_bi[0].astype(jnp.float32)
                for bi in range(1, bpp):
                    need_any = need_any + need_bi[bi].astype(jnp.float32)
                any_need = jnp.sum(need_any) > 0.0
                gate_fire = [
                    jnp.sum(jnp.where(
                        (hpp_iota // gate_hpg) == g, need_any, 0.0)) > 0.0
                    for g in range(ngate)]

            @pl.when(any_need)
            def _requant():
                # merged recompute: fetch the full plane for the firing
                # head groups only (streamed through the rotating slots),
                # rescore every row, keep only firing rows.  One gated
                # fetch + one softmax replaces the per-head serialized
                # requant loop; bytes move only for heads that fired.
                for i in range(ts):
                    kfull_io(i, do_wait=False, gates=gate_fire)
                kfull_merge_pipeline(gate_fire, fire_rows)
                exp_pass()
        else:
            need_ref[...] = jnp.zeros((bpp, hpp, 128), jnp.int32)

        # K slots idle from here (pass-1 consumed them; a firing requant
        # has drained its shared-slot stream): fill the successor's K
        # pipeline so it starts computing immediately — overlapping the
        # rest of this instance (importance epilogue, V fetch, P·V) with
        # the next one's fill.  Issued after the requant section because
        # the full-plane stream SHARES the msb slot buffer.
        @pl.when(has_succ)
        def _():
            if quant_enabled:
                for i in range(ps):
                    msb_io(i, do_wait=False, tgt=succ_tgt)
                if has_lsb2:
                    for i in range(ls):
                        lsb2_io(i, do_wait=False, tgt=succ_tgt)
                if mixed_profile:
                    # bits == 8 never requants, so the slots stay free
                    # for the successor's full-plane pass-1
                    @pl.when(p1_full8)
                    def _():
                        for i in range(ts):
                            kfull_io(i, do_wait=False,
                                     gates=succ_tgt[4], tgt=succ_tgt)
            else:
                for i in range(ts):
                    kfull_io(i, do_wait=False,
                             gates=succ_tgt[4], tgt=succ_tgt)

        # final row statistics (the requant pass, when it ran, refreshed
        # the scratch accumulators in place)
        den = row_den()
        inv_den = 1.0 / den                             # [R, 1]
        m_fin = jnp.max(mrow_scr[...], axis=-1, keepdims=True)
        wrow = hmask_rows * inv_den                     # [R, 1]
        # the appended column's probability from registers (its stored K
        # may race the fetch): e_idx = exp(s_idx - m)
        _kc_parts = [jnp.repeat(ksc_col3[bi], group, axis=0)
                     if group > 1 else ksc_col3[bi] for bi in range(bpp)]
        ksc_col_rows = (jnp.concatenate(_kc_parts, axis=0) if bpp > 1
                        else _kc_parts[0])              # [R, 1]
        s_idx = patch * rs_mult
        if has_off:
            s_idx = s_idx + off2
        s_idx = s_idx * ksc_col_rows
        if do_requant:
            s_idx2 = (patch_full * rs_full) * ksc_col_rows
            s_idx = jnp.where(jnp.logical_and(fire_rows, any_need),
                              s_idx2, s_idx)
        e_idx = jnp.exp(s_idx - m_fin)                  # [R, 1]
        if row_stats:
            # per-row softmax partials for split-K recombination: the
            # caller rescales this shard's output by exp(m_i - pmax(m))
            # and renormalizes with psum'd denominators (exact)
            for bi in range(bpp):
                mrow_out[bi] = jnp.broadcast_to(
                    m_fin[bi * rows:(bi + 1) * rows], (rows, 128))
                drow_out[bi] = jnp.broadcast_to(
                    den[bi * rows:(bi + 1) * rows], (rows, 128))

        # --- local V pruning: exact per-row block keep mask + gated
        # coarse-grained fetch ---------------------------------------------
        if do_vprune:
            # block mass per pblk tile: the 0/1 token->v-block pattern is
            # identical in every tile, so one tiny [pblk, pblk//v_block]
            # constant serves all of them; dead tiles (past `length`)
            # skip their matmul and zero their mass slice
            vpt = pblk // v_block
            trow = jax.lax.broadcasted_iota(
                jnp.int32, (pblk, vpt), 0) // v_block
            tcol = jax.lax.broadcasted_iota(jnp.int32, (pblk, vpt), 1)
            agg_t = (trow == tcol).astype(jnp.float32)  # [pblk, vpt]
            mass_scr[...] = jnp.zeros((R, num_vblk), jnp.float32)
            for t in range(num_tblk):
                @pl.when(t * pblk < len_max)
                def _(t=t):
                    mass_scr[:, pl.ds(t * vpt, vpt)] = jax.lax.dot_general(
                        probs_scr[:, t * pblk:(t + 1) * pblk],
                        agg_t.astype(e_dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            # e-scaled mass: the per-row 1/denominator factor changes
            # neither the per-row ranking, the kth threshold, nor mass>0
            mass = mass_scr[...] * hmask_rows           # [R, nvb]
            # per-layer value budget -> keep count (dynamic k: the
            # counting kth compares ranks against a traced scalar)
            keep_blocks = jnp.maximum(
                1, -(-vkeep_ref[lv] // v_block))
            # per-member chunks bound the all-pairs rank intermediate at
            # [rows, nvb, nvb] regardless of the group size
            if bpp == 1:
                kth = _kth_largest(mass, keep_blocks)[..., None]
            else:
                kth = jnp.concatenate(
                    [_kth_largest(mass[bi * rows:(bi + 1) * rows],
                                  keep_blocks)[..., None]
                     for bi in range(bpp)], axis=0)     # [R, 1]
            keep_gb = ((mass >= kth) & (mass > 0.0)
                       ).astype(jnp.float32)            # [R, nvb]
            # fetch block f iff any row keeps a v-block inside it (the
            # keep mask is applied per fired block inside the P·V loop).
            # The nfb gates pack into one int32 word per 24 blocks;
            # per-block tests are then scalar bit ops instead of nfb
            # vector reductions.
            kept_any = jnp.max(keep_gb, axis=0, keepdims=True)   # [1, nvb]
            vrow = jax.lax.broadcasted_iota(jnp.int32, (num_vblk, nfb), 0)
            vcol = jax.lax.broadcasted_iota(jnp.int32, (num_vblk, nfb), 1)
            group_vf = (vrow // vpf == vcol).astype(jnp.float32)
            cnt = jax.lax.dot_general(                   # [1, nfb] counts
                kept_any, group_vf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # EXACT integer packing: jnp.exp2 is a polynomial on some
            # backends and returns e.g. 8192.004 for exp2(13) — summing
            # those drops bits after the int cast.  Integer shifts + an
            # int32 sum are exact by construction.
            gidx = jax.lax.broadcasted_iota(jnp.int32, (1, nfb), 1)
            gb_words = []
            for w in range(-(-nfb // 24)):
                pw = jnp.where(
                    (gidx >= w * 24) & (gidx < (w + 1) * 24),
                    jnp.left_shift(jnp.int32(1), gidx - w * 24),
                    jnp.int32(0))
                gb_words.append(jnp.sum(
                    jnp.where(cnt > 0.0, pw, jnp.int32(0))))

            def vgate(f):
                return (gb_words[f // 24] & (1 << (f % 24))) > 0
            # the appended token's own keep decision (for the register
            # patch below): its v-block's keep bit, per row
            nvb_iota = jax.lax.broadcasted_iota(
                jnp.int32, (R, num_vblk), 1)
            kept_new = jnp.sum(
                jnp.where(nvb_iota == idx_rows // v_block, keep_gb, 0.0),
                axis=-1, keepdims=True)                  # [R, 1]
            # block 0 was fetched speculatively in the prologue
            for f in range(1, vs):
                v_io(f, do_wait=False, extra_cond=vgate(f))
        else:
            keep_gb = None
            vgate = None
            kept_new = 1.0

        # --- importance epilogue (cascade pruning signal) ----------------
        # block-gated: only LIVE columns update; dead columns keep their
        # old accumulator bytes (write-back is a no-op there) or, in
        # delta mode, the zero fill.  Block gating is on the GROUP's
        # len_max: a short member's columns in [len_bi, len_max) see the
        # EMA decay + zero delta.  Importance past `length` is UNDEFINED
        # by contract — every consumer (select_keep_indices_budgeted)
        # masks on layer_lengths, and appended columns reset to zero.
        imp_wbs = []
        irows = rows if imp_per_row else hpp
        if track_importance:
            col_hp = jax.lax.broadcasted_iota(jnp.int32, (hpp, pblk), 1)
            if accumulate_importance and sc_ladder_read:
                sc_ladder_io(imp_in, imp_scr, 2, do_wait=True)
            elif accumulate_importance and not sc_blocked:
                for cpy in imp_reads:
                    cpy.wait()
            if not accumulate_importance:
                imp_scr[...] = jnp.zeros((bpp, irows, cap), imp_dtype)
            drow = wrow if importance_kind == "prob" else hmask_rows
            for t in range(num_tblk):
                @pl.when(t * pblk < len_max)
                def _(t=t):
                    ds_ = pl.ds(t * pblk, pblk)
                    if importance_kind == "prob":
                        dsrc = probs_scr[:, ds_].astype(jnp.float32) \
                            * drow
                    else:
                        colt = col_p + t * pblk
                        dsrc = jnp.where(colt < len_rows,
                                         scores_scr[:, ds_], 0.0) * drow
                    for bi in range(bpp):
                        dsrc_bi = dsrc[bi * rows:(bi + 1) * rows] \
                            if bpp > 1 else dsrc
                        if group > 1 and not imp_per_row:
                            delta = jnp.sum(
                                dsrc_bi.reshape(hpp, group, pblk),
                                axis=1)                 # [hpp, pblk]
                        else:
                            # per-row mode keeps each query head's delta
                            # separate (exact GQA split-K recombination
                            # rescales rows before the group sum)
                            delta = dsrc_bi
                        if accumulate_importance:
                            old = imp_scr[bi, :, ds_].astype(jnp.float32)
                            appm = col_hp + t * pblk == idx_bi[bi]
                            if has_appmask:
                                appm = jnp.logical_and(appm, do_app_bi[bi])
                            prev = jnp.where(appm, 0.0, old)
                            if importance_ema != 1.0:
                                prev = prev * importance_ema
                            imp_scr[bi, :, ds_] = jnp.where(
                                alive3[bi] > 0.0, prev + delta, old
                            ).astype(imp_dtype)
                        else:
                            imp_scr[bi, :, ds_] = delta.astype(imp_dtype)
            if sc_blocked:
                imp_out[0, 0] = imp_scr[0]
            elif sc_ladder_write and accumulate_importance:
                # aliased accumulator: write back only the live prefix
                # rung (HBM already holds every dead column's old bytes)
                sc_ladder_io(imp_out, imp_scr, 3, do_wait=False,
                             write=True)
            else:
                for bi in range(bpp):
                    if accumulate_importance:
                        imp_wbs.append(pltpu.make_async_copy(
                            imp_scr.at[bi], sc_slice(imp_out, b0 + bi),
                            sc_sem.at[5, bi]))
                    else:
                        imp_wbs.append(pltpu.make_async_copy(
                            imp_scr.at[bi],
                            imp_out.at[0, b0 + bi, :, :] if npj == 1 else
                            imp_out.at[0, b0 + bi,
                                       pl.ds(j * irows, irows), :],
                            sc_sem.at[5, bi]))
                for cpy in imp_wbs:
                    cpy.start()
        # when importance tracking is off the wrapper discards the imp
        # output entirely — no zero-fill, no write-back DMA

        # ------------------------------------------------------------------
        # Append modify + write start (RMW reads landed during phase A).
        # ------------------------------------------------------------------
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, slab), 0)

        if not skip_append:
            for bi in range(bpp):
                def _app_modify_write(bi=bi):
                    bb = b0 + bi
                    fmask = sub8 == (idx_bi[bi] - fstart_bi[bi])
                    pmask = sub8 == (prow_bi[bi] - pstart_bi[bi])
                    pltpu.make_async_copy(
                        app_slice(kfull_out, fstart_bi[bi], bb),
                        kapp_scr.at[bi], app_sem.at[0, bi]).wait()
                    pltpu.make_async_copy(
                        app_slice(vfull_out, fstart_bi[bi], bb),
                        vapp_scr.at[bi], app_sem.at[1, bi]).wait()
                    if quant_enabled:
                        pltpu.make_async_copy(
                            app_slice(kmsb_out, pstart_bi[bi], bb),
                            kmapp_scr.at[bi], app_sem.at[2, bi]).wait()
                    if vmsb_on:
                        pltpu.make_async_copy(
                            app_slice(vmsb_out, pstart_bi[bi], bb),
                            vmapp_scr.at[bi], app_sem.at[3, bi]).wait()
                    for scr, q8m in ((kapp_scr, kq8), (vapp_scr, vq8)):
                        row8 = jnp.where(
                            fmask,
                            jnp.broadcast_to(q8m[bi:bi + 1], (8, slab)),
                            (jax.lax.bitcast_convert_type(
                                scr[bi], jnp.int8).astype(jnp.float32)
                             if scr.dtype == jnp.uint8 else scr[bi])
                        ).astype(jnp.int8)
                        scr[bi] = (jax.lax.bitcast_convert_type(
                            row8, jnp.uint8)
                            if scr.dtype == jnp.uint8 else row8)
                    nib_pairs = []
                    if quant_enabled:
                        nib_pairs.append((kmapp_scr, kq8))
                    if vmsb_on:
                        nib_pairs.append((vmapp_scr, vq8))
                    for scr, q8m in nib_pairs:
                        old = scr[bi].astype(jnp.int32)
                        nib = jnp.broadcast_to(
                            ((q8m[bi:bi + 1].astype(jnp.int32) >> 4)
                             & 0xF) ^ 8, (8, slab))
                        newb = jnp.where(ishi_bi[bi],
                                         (nib << 4) | (old & 0x0F),
                                         (old & jnp.int32(0xF0)) | nib)
                        scr[bi] = jnp.where(pmask, newb, old
                                            ).astype(jnp.uint8)
                    if has_lsb2:
                        # 2-bit field RMW (the masked bit-plane write of
                        # SpAttenController.scala:230-232 at 2-bit
                        # granularity)
                        pltpu.make_async_copy(
                            app_slice(klsb2_out, l2start_bi[bi], bb),
                            kl2app_scr.at[bi], app_sem.at[4, bi]).wait()
                        old2 = kl2app_scr[bi].astype(jnp.int32)
                        f2 = jnp.broadcast_to(
                            (kq8[bi:bi + 1].astype(jnp.int32) >> 2) & 0x3,
                            (8, slab))
                        shift = (6 - 2 * qfld_bi[bi]).astype(jnp.int32)
                        m2 = jnp.int32(0x3) << shift
                        new2 = (old2 & ~m2) | (f2 << shift)
                        l2mask = sub8 == (l2row_bi[bi] - l2start_bi[bi])
                        kl2app_scr[bi] = jnp.where(l2mask, new2, old2
                                                   ).astype(jnp.uint8)
                    pltpu.make_async_copy(
                        kapp_scr.at[bi],
                        app_slice(kfull_out, fstart_bi[bi], bb),
                        app_sem.at[0, bi]).start()
                    pltpu.make_async_copy(
                        vapp_scr.at[bi],
                        app_slice(vfull_out, fstart_bi[bi], bb),
                        app_sem.at[1, bi]).start()
                    if quant_enabled:
                        pltpu.make_async_copy(
                            kmapp_scr.at[bi],
                            app_slice(kmsb_out, pstart_bi[bi], bb),
                            app_sem.at[2, bi]).start()
                    if vmsb_on:
                        pltpu.make_async_copy(
                            vmapp_scr.at[bi],
                            app_slice(vmsb_out, pstart_bi[bi], bb),
                            app_sem.at[3, bi]).start()
                    if has_lsb2:
                        pltpu.make_async_copy(
                            kl2app_scr.at[bi],
                            app_slice(klsb2_out, l2start_bi[bi], bb),
                            app_sem.at[4, bi]).start()
                app_when(bi, _app_modify_write)

        # ------------------------------------------------------------------
        # P·V: streamed per-fetch-block matmuls + block-diag extraction.
        # Unfetched (pruned-away) blocks skip both the DMA wait and the
        # matmul; probability weights are built per FIRED block from the
        # unnormalized e plane (w = e * hmask/den * vscale, appended
        # column zeroed — its contribution is patched from registers).
        # ------------------------------------------------------------------
        p_idx = e_idx * wrow * kept_new                 # [R, 1]
        if has_appmask:
            # non-appending shards: the idx column is a normal stored
            # token — its contribution comes from the fetched plane
            p_idx = jnp.where(app_rows, p_idx, 0.0)
        if pv_int8:
            # integer P·V: the stored int8 V rows feed the MXU DIRECTLY
            # (no [blk, slab] astype pass — the VPU cost that made dense
            # P·V compute-bound); the probability*vscale weights quantize
            # to 8 bits per row (the reference's P·V runs on 12-bit
            # fixed-point probs, MultiplyValue.scala:19-66 — same idea,
            # theirs is 12-bit).  w >= 0, so the full int8 range is
            # [0, 127]; a dead row (wmax == 0) contributes exact zeros.
            # wmax is the exp_pass's running max(e*vscale) * hmask/den —
            # an upper bound within one idx-column slack of the true max.
            wmax = jnp.max(emv_scr[...], axis=-1, keepdims=True) * wrow
            wrecip = 127.0 / jnp.maximum(wmax, 1e-30)
        col_f = jax.lax.broadcasted_iota(jnp.int32, (R, fblk), 1)
        if do_vprune:
            # keep-mask lane expansion constant for one fetch block:
            # [vpf, fblk] 0/1, applied per fired block (replaces a whole
            # [rows, C] keep_cols pass)
            erow = jax.lax.broadcasted_iota(jnp.int32, (vpf, fblk), 0)
            ecol = jax.lax.broadcasted_iota(jnp.int32, (vpf, fblk), 1)
            expand_f = (erow == ecol // v_block).astype(jnp.float32)
        pvacc_scr[...] = jnp.zeros(
            (R, slab), jnp.int32 if pv_int8 else jnp.float32)
        if do_vprune:
            # consume the speculative sink-block DMA with ITS start
            # condition (issued before the keep mask existed)
            @pl.when(any_alive & (len_max > 0))
            def _():
                pltpu.make_async_copy(
                    vfull_out.at[lv, pl.ds(b0, bpp), pl.ds(0, fblk),
                                 pl.ds(lane0, slab)],
                    v_scr.at[0], v_sem.at[0]).wait()
        for f in range(nfb):
            if do_vprune:
                gate_f = vgate(f) & (f * fblk < len_max)
            else:
                gate_f = any_alive & (f * fblk < len_max)

            @pl.when(gate_f)
            def _(f=f):
                if not (do_vprune and f == 0):   # spec block: waited above
                    pltpu.make_async_copy(
                        vfull_out.at[lv, pl.ds(b0, bpp),
                                     pl.ds(f * fblk, fblk),
                                     pl.ds(lane0, slab)],
                        v_scr.at[f % vs], v_sem.at[f % vs]).wait()
                eb = probs_scr[:, f * fblk:(f + 1) * fblk
                               ].astype(jnp.float32)
                pb = (eb * wrow) * vsc_blk(f * fblk, fblk)
                # zero the appended column (patched from registers) AND
                # every column at/past each row's length: a fetch block
                # may span never-written (garbage) pblk blocks, and
                # garbage * 0-keep-mask is NaN-unsafe
                colt = col_f + f * fblk
                pb = jnp.where(and_app_rows(colt == idx_rows)
                               | (colt >= len_rows), 0.0, pb)
                if do_vprune:
                    keep_exp = jax.lax.dot_general(
                        keep_gb[:, f * vpf:(f + 1) * vpf], expand_f,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    pb = pb * keep_exp
                if pv_int8:
                    pb8 = jnp.clip(jnp.round(pb * wrecip), 0.0, 127.0
                                   ).astype(jnp.int8)
                    for bi in range(bpp):
                        r0 = bi * rows
                        pvacc_scr[r0:r0 + rows] += jax.lax.dot_general(
                            pb8[r0:r0 + rows], v_scr[f % vs, bi],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                            precision=jax.lax.Precision.DEFAULT)
                else:
                    for bi in range(bpp):
                        r0 = bi * rows
                        pvacc_scr[r0:r0 + rows] += jax.lax.dot_general(
                            pb[r0:r0 + rows],
                            v_scr[f % vs, bi].astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            if f + vs < nfb:
                if do_vprune:
                    v_io(f + vs, do_wait=False, extra_cond=vgate(f + vs))
                else:
                    v_io(f + vs, do_wait=False, extra_cond=any_alive)
        # V slots idle: fill the successor's V pipeline (with V pruning
        # the successor's keep mask doesn't exist yet, so only its
        # speculative sink block prefetches; the rest it issues itself)
        @pl.when(has_succ)
        def _():
            if not do_vprune:
                for f in range(vs):
                    v_io(f, do_wait=False, extra_cond=succ_tgt[3],
                         tgt=succ_tgt)
            else:
                v_io(0, do_wait=False, extra_cond=succ_tgt[3],
                     tgt=succ_tgt)

        if pv_int8:
            out_full = pvacc_scr[...].astype(jnp.float32) * (
                wmax * (1.0 / 127.0))                   # [R, slab]
        else:
            out_full = pvacc_scr[...]                   # [R, slab]
        # block-diag extract: mask off-head chunks, fold chunks onto D
        # with a constant tiled-identity matmul (no lane reshapes)
        li_s = jax.lax.broadcasted_iota(jnp.int32, (slab, d), 0) % d
        li_d = jax.lax.broadcasted_iota(jnp.int32, (slab, d), 1)
        fold = (li_s == li_d).astype(jnp.float32)       # [slab, d]
        out_rows = jax.lax.dot_general(
            out_full * bd_mask, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [R, d]
        vnew_deq = rep_rows(vq8 * vsc_lane) * bd_mask   # [R, slab]
        vnew_rows = jax.lax.dot_general(
            vnew_deq, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [R, d]
        final_rows = out_rows + p_idx * vnew_rows
        if bpp == 1:
            out_ref[0] = final_rows
        else:
            for bi in range(bpp):
                out_ref[bi] = final_rows[bi * rows:(bi + 1) * rows]

        if not sc_blocked:
            for cpy in sc_wbs:
                cpy.wait()
            if (sc_ladder_write and accumulate_importance
                    and track_importance):
                sc_ladder_io(imp_out, imp_scr, 3, do_wait=True,
                             write=True)
            for cpy in imp_wbs:
                cpy.wait()
        if not skip_append:
            for bi in range(bpp):
                def _app_drain(bi=bi):
                    bb = b0 + bi
                    # append writes drain last (latency hidden behind P·V)
                    pltpu.make_async_copy(
                        kapp_scr.at[bi],
                        app_slice(kfull_out, fstart_bi[bi], bb),
                        app_sem.at[0, bi]).wait()
                    pltpu.make_async_copy(
                        vapp_scr.at[bi],
                        app_slice(vfull_out, fstart_bi[bi], bb),
                        app_sem.at[1, bi]).wait()
                    if quant_enabled:
                        pltpu.make_async_copy(
                            kmapp_scr.at[bi],
                            app_slice(kmsb_out, pstart_bi[bi], bb),
                            app_sem.at[2, bi]).wait()
                    if vmsb_on:
                        pltpu.make_async_copy(
                            vmapp_scr.at[bi],
                            app_slice(vmsb_out, pstart_bi[bi], bb),
                            app_sem.at[3, bi]).wait()
                    if has_lsb2:
                        pltpu.make_async_copy(
                            kl2app_scr.at[bi],
                            app_slice(klsb2_out, l2start_bi[bi], bb),
                            app_sem.at[4, bi]).wait()
                app_when(bi, _app_drain)

    return kernel, (pblk, fblk, ps, ts, vs, ngate, kfblk)


def fused_decode_attention(
    q: jax.Array,                  # [B, Hq, 1, D] (rotated queries)
    k_quant: qz.QuantizedKV,       # planes [(L,) B, C(/2), Hkv*D] — ALIASED
    v_quant: qz.QuantizedKV,       # (donate via jit for in-place update)
    k_new: jax.Array,              # [B, Hkv, 1, D] raw new K row (already
                                   #   rotated iff rope_mode == "cached")
    v_new: jax.Array,              # [B, Hkv, 1, D] raw new V row
    lengths: jax.Array,            # [B] int32 valid tokens INCL. new row
    *,
    sm_scale: float = 1.0,
    requant_threshold: float = 0.0,
    quant_enabled: bool = True,
    v_keep=0,                      # int, or per-layer ints [L] — the
                                   #   reference's per-request
                                   #   value_fetch_num (CSV col 12)
    v_block_size: int = 16,
    head_mask: Optional[jax.Array] = None,
    importance_kind: str = "prob",
    quantize_queries: bool = False,
    importance_in: Optional[jax.Array] = None,   # [(L,) B, Hkv, C]
    track_importance: bool = True,
    importance_ema: float = 1.0,    # imp <- ema * imp + delta (CSV col 15
                                    #   `if_rescale_previous_importance`)
    layer: Optional[jax.Array] = None,   # int32 [] — which layer of the
                                   #   STACKED planes to read/update
    quant_bits: Optional[jax.Array] = None,   # int32 [L] per-layer pass-1
                                   #   bits (4/6/8): the reference's
                                   #   per-request QuantProfile as data
                                   #   (SpAtten.scala:71-74).  6-bit
                                   #   layers need k_quant.lsb2.
    pv_int8: bool = False,         # P·V on the integer MXU: stored int8 V
                                   #   rows consumed directly, prob*vscale
                                   #   weights quantized to 8 bits per row
                                   #   (the reference's P·V is 12-bit
                                   #   fixed, MultiplyValue.scala)
    append_mask: Optional[jax.Array] = None,   # bool/int [B]: False = do
                                   #   not append (the idx column is a
                                   #   normal stored token) — split-K
                                   #   non-owner shards
    return_row_stats: bool = False,   # also return (m, den) [B, Hq] per
                                   #   q-head row: the flash partials for
                                   #   exact split-K recombination
    per_row_importance: bool = False,  # delta-only mode (importance_in
                                   #   None): emit [B, Hq, C] per-query-
                                   #   row deltas instead of the group
                                   #   sum — split-K GQA rescales each
                                   #   row by its global flash weight
                                   #   BEFORE summing the group, making
                                   #   the sharded importance exact
                                   #   (kv_cache_token_pruning.py:51
                                   #   semantics)
    probs_bf16: bool = False,      # bf16 e-plane scratch: halves the
                                   #   largest [rows, C] VMEM plane (more
                                   #   batch rows per instance); the e
                                   #   plane only feeds 8-bit P·V
                                   #   weights, mass ranking, and the
                                   #   (bf16) importance accumulator
    cap_override: Optional[int] = None,   # per-layer capacity rung: size
                                   #   the kernel (streams, [R, cap]
                                   #   planes, grid bpp) to this prefix of
                                   #   the stored capacity.  Must be a
                                   #   multiple of the nibble pack unit
                                   #   (2048 at serving caps) so the
                                   #   packed-plane layout is a shared
                                   #   prefix; lengths must stay <= rung
                                   #   (the engine's per-layer prune
                                   #   triggers guarantee it).
    interpret: bool = False,
    _skip_append: bool = False,   # perf-triage only: don't write the cache
    _hpp_override: Optional[int] = None,
    _bpp_override: Optional[int] = None,
) -> Tuple[jax.Array, AttentionStats, qz.QuantizedKV, qz.QuantizedKV]:
    """One fused decode step.  Returns (out [B,Hq,1,D], stats,
    k_quant', v_quant') where the primed caches contain the appended row
    (planes aliased in-place when the caller donates them).

    **Stacked mode** (`layer` given): the cache planes (and the importance
    accumulator, when accumulating) carry a leading layer axis [L, ...];
    the kernel reads and updates only layer `layer` IN PLACE and every
    other layer's bytes never move.  This is how the engine's layer scan
    avoids copying the whole multi-layer cache every step: the stacked planes
    ride the scan carry and this call is their only writer.  Without
    `layer` the planes are single-layer (tests / direct use); the call is
    then identical to stacked mode with L == 1.

    Queries must arrive fully rotated/scaled; the kernel computes no RoPE
    (rope_mode "cached" or absolute-position models — "read" mode uses
    the jnp reference path).
    """
    b, hq, q_len, d = q.shape
    assert q_len == 1
    stacked = layer is not None
    if not stacked:
        layer = jnp.zeros((), jnp.int32)
        k_quant = jax.tree.map(lambda x: x[None], k_quant)
        v_quant = jax.tree.map(lambda x: x[None], v_quant)
        if importance_in is not None:
            importance_in = importance_in[None]
    num_layers = k_quant.full.shape[0]
    hkv = k_quant.heads
    cap_total = k_quant.tokens
    cap = cap_total
    if cap_override is not None and cap_override < cap_total:
        # rung legality: the packed nibble planes use a block-local
        # split-token layout whose unit must be a shared prefix
        assert cap_override % qz.pack_unit(cap_total) == 0, (
            f"cap_override {cap_override} must be a multiple of the "
            f"pack unit {qz.pack_unit(cap_total)}")
        assert qz.pack_unit(cap_override) == qz.pack_unit(cap_total)
        assert cap_override % v_block_size == 0
        cap = cap_override
    group = hq // hkv
    assert cap % v_block_size == 0
    hpp = _heads_per_program(hkv, cap, d, group) if not interpret else hkv
    if _hpp_override is not None:
        hpp = _hpp_override
    rows_p = hpp * group
    if cap < cap_total and not (hpp % 8 == 0 or (hkv // hpp == 1
                                                 and 8 % hpp == 0)):
        # sc_blocked transport slices the scale planes as VMEM blocks of
        # `cap` columns, which must divide the stored capacity — rung
        # prefixes generally don't; fall back to full-capacity sizing
        cap = cap_total
        hpp = _heads_per_program(hkv, cap, d, group) if not interpret \
            else hkv
        if _hpp_override is not None:
            hpp = _hpp_override

    accumulate = importance_in is not None
    imp_per_row = (per_row_importance and track_importance
                   and not accumulate and group > 1)
    head_gating = head_mask is not None
    npj = hkv // hpp
    # V's nibble plane is optional: the P·V pass always reads the full
    # int8 plane (value_bits=8 policy), so an engine that never fetches
    # 4-bit V simply doesn't carry the plane — no storage, no append RMW
    vmsb_on = quant_enabled and v_quant.msb is not None
    sc_blocked = not (hpp % 8 == 0 or (npj == 1 and 8 % hpp == 0))
    mixed_profile = quant_enabled and quant_bits is not None
    has_lsb2 = mixed_profile and k_quant.lsb2 is not None
    imp_dtype = (importance_in.dtype if importance_in is not None
                 else jnp.float32)
    sc_dtype = k_quant.scale.dtype
    # integer P·V needs an int8-tileable row count (same constraint as
    # the int8 QK dots)
    pv_int8 = pv_int8 and (rows_p % 8 == 0 or 8 % rows_p == 0)
    if has_lsb2:
        assert cap >= 32, "6-bit profiles need cap >= 32 (8-row lsb2 RMW)"
    _do_requant = quant_enabled and requant_threshold > 0.0
    _vk = (v_keep,) if isinstance(v_keep, int) else tuple(v_keep)
    _do_vprune = any(
        0 < vk and max(1, -(-vk // v_block_size)) < cap // v_block_size
        for vk in _vk)
    _bpp_max = int(_os.environ.get("SPATTEN_BPP_MAX", "0"))
    if _bpp_override is not None:
        bpp = _bpp_override
    elif interpret or sc_blocked or b == 1:
        bpp = 1
    else:
        bpp = _batches_per_program(
            b, hpp, d, group, cap,
            quant_on=quant_enabled, need_kfull=(
                (not quant_enabled) or _do_requant or mixed_profile),
            need_scores2=_do_requant, has_lsb2=has_lsb2,
            do_vprune=_do_vprune, v_block=v_block_size,
            sc_bytes=jnp.dtype(sc_dtype).itemsize,
            imp_bytes=jnp.dtype(imp_dtype).itemsize,
            track_imp=track_importance,
            e_bytes=2 if probs_bf16 else 4, mixed=mixed_profile)
        while _bpp_max and bpp > _bpp_max:
            bpp = max(d for d in range(1, bpp) if b % d == 0)
    assert b % bpp == 0, f"batch {b} not divisible by group size {bpp}"
    kernel, (pblk, fblk, ps, ts, vs, ngate, kfblk) = _make_kernel(
        cap=cap, group=group, head_dim=d, hpp=hpp, sm_scale=sm_scale,
        requant_threshold=requant_threshold, quant_enabled=quant_enabled,
        v_keep=v_keep, v_block=v_block_size,
        importance_kind=importance_kind,
        accumulate_importance=accumulate,
        quantize_queries=quantize_queries,
        track_importance=track_importance,
        importance_ema=importance_ema, skip_append=_skip_append,
        head_gating=head_gating, npj=npj, batch=b, vmsb_on=vmsb_on,
        sc_blocked=sc_blocked, mixed_profile=mixed_profile,
        imp_per_row=imp_per_row,
        has_lsb2=has_lsb2, imp_dtype=imp_dtype, sc_dtype=sc_dtype,
        pv_int8=pv_int8, has_appmask=append_mask is not None,
        row_stats=return_row_stats, bpp=bpp, probs_bf16=probs_bf16)

    rows_total = hq
    # block-diagonal queries: qbd[b, r, h*D:(h+1)*D] = q[b, r] iff r is in
    # kv-head h's group — built with a tiny einsum (B*Hq*Hkv*D floats)
    qg = q.astype(jnp.float32).reshape(b, hkv, group, d)
    eye = jnp.eye(hkv, dtype=jnp.float32)
    qbd = jnp.einsum("bhgd,hk->bhgkd", qg, eye).reshape(
        b, rows_total, hkv * d)

    if head_mask is None:
        hm = jnp.ones((b, hkv, group), jnp.float32)
    else:
        hmb = head_mask if head_mask.ndim == 2 else \
            jnp.broadcast_to(head_mask[None], (b, hq))
        hm = hmb.astype(jnp.float32).reshape(b, hkv, group)

    imp_cols = cap if track_importance else 128
    imp_heads = hq if imp_per_row else hkv
    if imp_per_row:
        assert not sc_blocked, (
            "per-row importance needs the DMA scale transport")
    if accumulate:
        imp_in = importance_in                       # [L, B, Hkv, C]
        imp_shape = imp_in.shape
    else:
        imp_in = jnp.zeros((1, b, hkv, imp_cols), jnp.float32)
        imp_shape = (1, b, imp_heads, imp_cols)

    quant_on = quant_enabled
    do_requant = quant_enabled and requant_threshold > 0.0
    vk_tuple = (v_keep,) if isinstance(v_keep, int) else tuple(v_keep)
    do_vprune = any(
        0 < vk and max(1, -(-vk // v_block_size)) < cap // v_block_size
        for vk in vk_tuple)
    vkeep_arr = jnp.asarray(
        list(vk_tuple) + [vk_tuple[-1]] * (num_layers - len(vk_tuple)),
        jnp.int32)
    slab = hpp * d

    # scale/importance transport: async DMA of [hpp, C] slices when the
    # sublane extent is DMA-legal, else layer-indexed VMEM blocks (the
    # scalar-prefetched layer id drives the block index map)
    if sc_blocked:
        def _sc_spec(cols):
            return pl.BlockSpec(
                (1, 1, hpp, cols),
                lambda i, j, lens, lay, *_s: (lay[0], i, j, 0),
                memory_space=pltpu.VMEM)

        def _imp_in_spec(cols):
            if accumulate:
                return _sc_spec(cols)
            return pl.BlockSpec(
                (1, 1, hpp, cols), lambda i, j, *_: (0, i, j, 0),
                memory_space=pltpu.VMEM)
        sc_in = _sc_spec(cap)
    else:
        sc_in = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [
        pl.BlockSpec((bpp, rows_p, slab),
                     lambda i, j, *_: (i, j, j),
                     memory_space=pltpu.VMEM),          # qbd
        pl.BlockSpec((bpp, 1, slab), lambda i, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),          # k_new
        pl.BlockSpec((bpp, 1, slab), lambda i, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),          # v_new
        sc_in,                                          # kscale [L,B,H,C]
        sc_in,                                          # vscale
        pl.BlockSpec((bpp, hpp, group), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),          # hmask
        (_imp_in_spec(imp_cols) if sc_blocked
         else pl.BlockSpec(memory_space=pl.ANY)),       # imp_in
    ]
    # plane operands: nibble planes ride along only where they exist —
    # the dense engine carries none, and V may omit its nibble plane
    plane_ops = []                     # (array, dtype) in kernel order
    if quant_on:
        plane_ops.append((k_quant.msb, jnp.uint8))
    if has_lsb2:
        plane_ops.append((k_quant.lsb2, jnp.uint8))
    kfull_shared = quant_on and (_do_requant or mixed_profile) \
        and not _NO_SHARE
    if kfull_shared:
        plane_ops.append((jax.lax.bitcast_convert_type(
            k_quant.full, jnp.uint8), jnp.uint8))
    else:
        plane_ops.append((k_quant.full, jnp.int8))
    if vmsb_on:
        plane_ops.append((v_quant.msb, jnp.uint8))
    plane_ops.append((v_quant.full, jnp.int8))
    n_planes = len(plane_ops)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
    out_specs = [
        pl.BlockSpec((bpp, rows_p, d), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),          # out
        pl.BlockSpec((bpp, hpp, 128), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),          # maxp
        pl.BlockSpec((bpp, hpp, 128), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),          # need
        (_imp_in_spec(imp_cols) if sc_blocked
         else pl.BlockSpec(memory_space=pl.ANY)),    # imp
        sc_in,                                       # kscale'
        sc_in,                                       # vscale'
    ]
    out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
    if return_row_stats:
        out_specs += [pl.BlockSpec((bpp, rows_p, 128),
                                   lambda i, j, *_: (i, j, 0),
                                   memory_space=pltpu.VMEM)] * 2
    out_shape = [
        jax.ShapeDtypeStruct((b, rows_total, d), jnp.float32),
        jax.ShapeDtypeStruct((b, hkv, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, hkv, 128), jnp.int32),
        jax.ShapeDtypeStruct(imp_shape, imp_dtype),
        jax.ShapeDtypeStruct(k_quant.scale.shape, k_quant.scale.dtype),
        jax.ShapeDtypeStruct(v_quant.scale.shape, v_quant.scale.dtype),
    ]
    out_shape += [jax.ShapeDtypeStruct(arr.shape, dt)
                  for arr, dt in plane_ops]
    if return_row_stats:
        out_shape += [jax.ShapeDtypeStruct((b, hq, 128), jnp.float32)] * 2
    # operand index -> output index (the first `spo` operands are the
    # scalar prefetch: lengths, layer, alive bits, quant bits, value
    # budgets [, append mask]): scales then the plane operands in order
    spo = 5 + (1 if append_mask is not None else 0)
    aliases = {spo + 3: 4, spo + 4: 5}
    for p in range(n_planes):
        aliases[spo + 7 + p] = 6 + p
    if accumulate:
        aliases[spo + 6] = 3

    # packed per-(batch, gate-group) head-liveness bits for the kernel's
    # scalar gate tests (bit j*ngate+g = any head alive in gate group g of
    # lane chunk j); scalar-prefetched so an instance can also gate its
    # successor's prologue fetches
    gate_hpg = hpp // ngate
    alive5 = hm.reshape(b, npj, ngate, gate_hpg, group)
    gate_alive = (jnp.max(alive5, axis=(3, 4)) > 0).reshape(
        b, npj * ngate)
    alive_bits = jnp.sum(
        gate_alive.astype(jnp.int32)
        * (1 << jnp.arange(npj * ngate, dtype=jnp.int32))[None, :],
        axis=1).astype(jnp.int32)

    R_p = bpp * rows_p
    scratch = [
        pltpu.VMEM((bpp, 8, slab),
                   jnp.uint8 if (quant_on and (_do_requant
                                               or mixed_profile)
                                 and not _NO_SHARE)
                   else jnp.int8),                # kapp (follows plane)
        pltpu.VMEM((bpp, 8, slab), jnp.int8),     # vapp
    ]
    qblk = max(1, pblk // 2)
    ls = max(2, min(-(-cap // (2 * pblk)), NSLOTS)) \
        if has_lsb2 and cap > 2 * pblk else 1
    if quant_on:
        scratch.append(pltpu.VMEM((bpp, 8, slab), jnp.uint8))     # kmapp
    if has_lsb2:
        scratch.append(pltpu.VMEM((bpp, 8, slab), jnp.uint8))     # kl2app
    if vmsb_on:
        scratch.append(pltpu.VMEM((bpp, 8, slab), jnp.uint8))     # vmapp
    scratch += [
        pltpu.VMEM((bpp, hpp, cap), sc_dtype),           # ksc slices
        pltpu.VMEM((bpp, hpp, cap), sc_dtype),           # vsc slices
        pltpu.VMEM((bpp, rows_p if imp_per_row else hpp, imp_cols),
                   imp_dtype),                           # imp slices
    ]
    if quant_on:
        # shared msb/full stream slots (see _make_kernel kfull_scr)
        _need_full = (do_requant or mixed_profile) and not _NO_SHARE
        scratch.append(pltpu.VMEM((max(ps, ts) if _need_full else ps,
                                   bpp, pblk, slab), jnp.uint8))
    if has_lsb2:
        scratch.append(pltpu.VMEM((ls, bpp, qblk, slab), jnp.uint8))
    if (not quant_on) or (_NO_SHARE and (do_requant or mixed_profile)):
        scratch.append(pltpu.VMEM((ts, bpp, kfblk, slab), jnp.int8))
    scratch += [
        pltpu.VMEM((R_p, cap), jnp.float32),    # scores
        pltpu.VMEM((R_p, cap),
                   jnp.bfloat16 if probs_bf16 else jnp.float32),  # e
        pltpu.VMEM((R_p, 128), jnp.float32),    # running row max
        pltpu.VMEM((R_p, 128), jnp.float32),    # denominator
    ]
    if pv_int8:
        scratch.append(pltpu.VMEM((R_p, 128), jnp.float32))  # emv
    if do_vprune:
        scratch.append(pltpu.VMEM((R_p, cap // v_block_size),
                                  jnp.float32))
    scratch += [
        pltpu.VMEM((vs, bpp, fblk, slab), jnp.int8),    # v slots
        pltpu.VMEM((R_p, slab),
                   jnp.int32 if pv_int8 else jnp.float32),  # pv acc
        pltpu.SemaphoreType.DMA((5, bpp)),
    ]
    if quant_on:
        scratch.append(pltpu.SemaphoreType.DMA((ps, ngate)))  # kmsb
    if has_lsb2:
        scratch.append(pltpu.SemaphoreType.DMA((ls, ngate)))  # klsb2
    scratch += [
        pltpu.SemaphoreType.DMA((ts, ngate)),
        pltpu.SemaphoreType.DMA((vs,)),
        pltpu.SemaphoreType.DMA((6, bpp)),
    ]
    if (not sc_blocked) and pblk % 128 == 0:
        # prefix-rung metadata ladder (ksc/vsc/imp read + imp write)
        num_tblk_w = cap // pblk
        nrungs = len({-(-num_tblk_w // 8), -(-num_tblk_w // 4),
                      -(-(3 * num_tblk_w) // 8), -(-num_tblk_w // 2),
                      -(-(3 * num_tblk_w) // 4), num_tblk_w})
        scratch.append(pltpu.SemaphoreType.DMA((4, nrungs)))

    if quant_bits is None:
        qbits_arr = jnp.full((num_layers,),
                             4 if quant_enabled else 8, jnp.int32)
    else:
        qbits_arr = jnp.asarray(quant_bits, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=spo,
        grid=(b // bpp, hkv // hpp),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        alive_bits,
        qbits_arr,
        vkeep_arr,
        *(() if append_mask is None
          else (jnp.asarray(append_mask).astype(jnp.int32),)),
        qbd,
        k_new.astype(jnp.float32).reshape(b, 1, hkv * d),
        v_new.astype(jnp.float32).reshape(b, 1, hkv * d),
        k_quant.scale, v_quant.scale, hm, imp_in,
        *(arr for arr, _ in plane_ops),
    )
    if return_row_stats:
        m_rows, den_rows = outs[-2][..., 0], outs[-1][..., 0]  # [B, Hq]
        outs = outs[:-2]
    (out, maxp, need, imp, kscale2, vscale2), planes2 = \
        outs[:6], list(outs[6:])
    # planes the kernel doesn't carry pass through untouched (pytree
    # structure must match the input when planes ride a scan carry)
    kmsb2 = planes2.pop(0) if quant_on else k_quant.msb
    klsb2_2 = planes2.pop(0) if has_lsb2 else k_quant.lsb2
    kfull2 = planes2.pop(0)
    if kfull_shared:
        kfull2 = jax.lax.bitcast_convert_type(kfull2, jnp.int8)
    vmsb2 = planes2.pop(0) if vmsb_on else v_quant.msb
    vfull2 = planes2.pop(0)

    k2 = qz.QuantizedKV(full=kfull2, msb=kmsb2, scale=kscale2,
                        lsb2=klsb2_2)
    v2 = qz.QuantizedKV(full=vfull2, msb=vmsb2, scale=vscale2,
                        lsb2=v_quant.lsb2)
    if not stacked:
        k2 = jax.tree.map(lambda x: x[0], k2)
        v2 = jax.tree.map(lambda x: x[0], v2)
        if accumulate:
            imp = imp[0]
    if not accumulate:
        imp = imp[0]          # drop the dummy layer axis of the delta
    stats = AttentionStats(
        max_prob=maxp[..., 0],
        need_requant=need[..., 0].astype(bool),
        importance_delta=(imp if track_importance
                          else jnp.zeros((b, imp_heads, cap),
                                         jnp.float32)),
        probs=None,
    )
    if return_row_stats:
        return out.reshape(b, hq, 1, d), stats, k2, v2, (m_rows, den_rows)
    return out.reshape(b, hq, 1, d), stats, k2, v2
