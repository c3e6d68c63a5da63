"""Fused Pallas TPU decode-attention kernel — the SpAtten pipeline on MXU.

One kernel program = one (sequence, kv_head) attention request, exactly the
granularity of the reference's `SpAttenRequest` (SpAtten.scala:94-120).  The
program walks the same stages as the RTL controller (SURVEY.md §3.3), but
realized as TPU dataflow:

  stage                         reference                     here
  ---------------------------   ---------------------------   -----------------
  MSB K fetch                   MatrixFetcher 4-bit profile   length-gated async
                                + score_buf index walk        DMA of the packed
                                                              nibble plane
                                                              (0.5 B/elem HBM,
                                                              only rows < len)
  QK^T                          DotProduct BMR 512 mults      MXU dot [G,D]x[D,C]
  softmax                       Softmax unit                  VPU, f32
  requant decision              RequantDecision.scala:69-76   max-prob < τ scalar
  LSB refetch + recompute       stageRequantizeOrRelease /    @pl.when-gated DMA
                                masked LSB buffer writes      of the int8 plane +
                                                              recompute in-place
  local V top-k                 TopK/QuickSelect engine       exact k-th order
                                                              statistic by
                                                              all-pairs counting
  V fetch (survivors only)      stageFetchValMat gather       per-block @pl.when-
                                                              gated async DMA
  P·V                           MultiplyValue BMR+acc         MXU dot [G,C]x[C,D]
  importance epilogue           attn-prob accumulation        sum over group ->
                                (workload csv generator)      [C] output
  head pruning                  pruned heads never issue      whole-program early
                                requests (CSV missing rows)   exit: no DMA, no
                                                              compute, zero out

HBM traffic is proportional to the *pruned* cache length, not capacity —
that is the cascade-token-pruning payoff: after a prune, `length` drops to
cache_size and every subsequent decode step fetches only that prefix.
Numerics match `ops.attention_ref.spatten_attention_reference` (tests compare
in interpret mode).
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
    order statistic is max{ mass_i : c_i >= k }.  N is small (num V blocks),
    so the O(N^2) compare is trivial — this replaces the reference's
    QuickSelect FSM (utils/QuickSelect.scala) with a single vector op.

    mass: [..., N] -> [...] (k-th largest per row).
    """
    ge = mass[..., None, :] >= mass[..., :, None]       # [..., N, N]
    count = jnp.sum(ge.astype(jnp.int32), axis=-1)      # c_i over columns
    cand = jnp.where(count >= k, mass, _NEG)
    return jnp.max(cand, axis=-1)


def _even_blocks(total: int, target: int) -> Tuple[int, int]:
    """(block_rows, num_blocks) with num_blocks * block_rows == total and
    block_rows <= ~target."""
    nb = max(1, -(-total // target))
    while total % nb:
        nb += 1
    return total // nb, nb


def _make_kernel(*, cap: int, group: int, head_dim: int, sm_scale: float,
                 requant_threshold: float, quant_enabled: bool,
                 v_keep: int, v_block: int, importance_kind: str,
                 use_rope: bool):
    half = cap // 2
    kblk, num_kblk = _even_blocks(half, 512)       # packed msb plane blocks
    fblk, num_fblk = _even_blocks(cap, 512)        # int8 full plane blocks
    keep_blocks = max(1, -(-v_keep // v_block)) if v_keep > 0 else 0
    num_vprune_blk = cap // v_block
    do_vprune = 0 < v_keep and keep_blocks < num_vprune_blk
    if do_vprune:
        vblk, num_vblk = v_block, num_vprune_blk
    else:
        vblk, num_vblk = _even_blocks(cap, 512)
    do_requant = quant_enabled and requant_threshold > 0.0

    def kernel(
        # scalar prefetch
        lengths_ref,                   # SMEM int32 [B]
        # VMEM-streamed inputs
        q_ref,                         # [1, 1, G, D] f32
        kscale_ref,                    # [1, 1, 1, C] f32
        vscale_ref,                    # [1, 1, 1, C] f32
        cos_ref,                       # [C, D] f32
        sin_ref,                       # [C, D] f32
        hmask_ref,                     # [1, 1, 1, G] f32 (1=alive)
        # HBM (manually DMA'd, length-gated)
        kmsb_hbm,                      # [B, Hkv, C//2, D] uint8 (packed)
        kfull_hbm,                     # [B, Hkv, C, D] int8
        vfull_hbm,                     # [B, Hkv, C, D] int8
        # outputs
        out_ref,                       # [1, 1, G, D] f32
        maxp_ref,                      # [1, 1, 1, 128] f32 (lane-broadcast)
        need_ref,                      # [1, 1, 1, 128] int32
        imp_ref,                       # [1, 1, 1, C] f32
        # scratch
        probs_ref,                     # [G, C] f32
        scores_ref,                    # [G, C] f32
        kmsb_scr,                      # [C//2, D] uint8
        kfull_scr,                     # [C, D] int8
        vfull_scr,                     # [C, D] int8
        kmsb_sem,                      # DMA sems (num_kblk,)
        kfull_sem,                     # DMA sems (num_fblk,)
        vsem,                          # DMA sems (num_vblk,)
    ):
        b = pl.program_id(0)
        h = pl.program_id(1)
        length = lengths_ref[b]
        hmask = hmask_ref[0, 0, 0]                        # [G]
        alive = jnp.max(hmask) > 0.0

        def gated_copy_loop(src, dst, sem, blk, nblk, row_limit, do_wait):
            """Per-block DMA of src[b, h, i*blk:(i+1)*blk] for blocks whose
            first row is < row_limit (start or wait phase)."""
            def body(i, _):
                @pl.when(i * blk < row_limit)
                def _():
                    cp = pltpu.make_async_copy(
                        src.at[b, h, pl.ds(i * blk, blk), :],
                        dst.at[pl.ds(i * blk, blk), :],
                        sem.at[i],
                    )
                    if do_wait:
                        cp.wait()
                    else:
                        cp.start()
                return 0
            jax.lax.fori_loop(0, nblk, body, 0)

        @pl.when(jnp.logical_not(alive))
        def _dead():
            # head-pruned group: never issues requests — zero everything
            out_ref[0, 0] = jnp.zeros((group, head_dim), jnp.float32)
            maxp_ref[0, 0, 0, :] = jnp.zeros((128,), jnp.float32)
            need_ref[0, 0, 0, :] = jnp.zeros((128,), jnp.int32)
            imp_ref[0, 0, 0] = jnp.zeros((cap,), jnp.float32)

        @pl.when(alive)
        def _alive():
            q = q_ref[0, 0]                               # [G, D] f32
            kscale = kscale_ref[0, 0, 0]                  # [C]
            col = jax.lax.broadcasted_iota(jnp.int32, (group, cap), 1)
            valid = col < length                          # [G, C]

            def attn_from_k(k_deq):
                """[C, D] f32 unrotated dequantized K -> (scores, probs)."""
                if use_rope:
                    k_rot = k_deq * cos_ref[:] + \
                        _rotate_half(k_deq) * sin_ref[:]
                else:
                    k_rot = k_deq
                s = jax.lax.dot_general(
                    q, k_rot, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sm_scale                              # [G, C]
                s_masked = jnp.where(valid, s, MASK_VALUE)
                m = jnp.max(s_masked, axis=-1, keepdims=True)
                e = jnp.exp(s_masked - m)
                e = jnp.where(valid, e, 0.0)
                denom = jnp.maximum(
                    jnp.sum(e, axis=-1, keepdims=True), 1e-30)
                return s, e / denom

            def fetch_kfull():
                gated_copy_loop(kfull_hbm, kfull_scr, kfull_sem, fblk,
                                num_fblk, length, do_wait=False)
                gated_copy_loop(kfull_hbm, kfull_scr, kfull_sem, fblk,
                                num_fblk, length, do_wait=True)

            def deq_kfull():
                return kfull_scr[:].astype(jnp.float32) * kscale[:, None]

            # ---- pass 1: 4-bit MSB plane (or full plane if quant off) ----
            if quant_enabled:
                # split-token packing: tokens [0, len) live in packed rows
                # [0, min(len, C/2)) — a contiguous, length-gated prefix
                packed_limit = jnp.minimum(length, half)
                gated_copy_loop(kmsb_hbm, kmsb_scr, kmsb_sem, kblk,
                                num_kblk, packed_limit, do_wait=False)
                gated_copy_loop(kmsb_hbm, kmsb_scr, kmsb_sem, kblk,
                                num_kblk, packed_limit, do_wait=True)
                packed = kmsb_scr[:].astype(jnp.int32)    # [C//2, D]
                hi = ((packed >> 4) ^ 8) - 8
                lo = ((packed & 0xF) ^ 8) - 8
                k4 = jnp.concatenate([hi, lo], axis=0).astype(jnp.float32)
                k_deq1 = (k4 * 16.0 + qz.MSB_MIDPOINT) * kscale[:, None]
            else:
                fetch_kfull()
                k_deq1 = deq_kfull()

            scores1, probs1 = attn_from_k(k_deq1)
            scores_ref[:] = scores1
            probs_ref[:] = probs1

            # ---- requant decision (RequantDecision.scala:69-76) ----------
            max_prob = jnp.max(probs1)
            maxp_ref[0, 0, 0, :] = jnp.full((128,), max_prob, jnp.float32)
            if do_requant:
                need = max_prob < requant_threshold
                need_ref[0, 0, 0, :] = jnp.full((128,),
                                                need.astype(jnp.int32))

                @pl.when(need)
                def _():
                    fetch_kfull()
                    s2, p2 = attn_from_k(deq_kfull())
                    scores_ref[:] = s2
                    probs_ref[:] = p2
            else:
                need_ref[0, 0, 0, :] = jnp.zeros((128,), jnp.int32)

            probs = probs_ref[:] * hmask[:, None]
            scores = scores_ref[:] * hmask[:, None]

            # ---- importance epilogue ---------------------------------
            if importance_kind == "prob":
                imp = jnp.sum(probs, axis=0)
            else:                                         # "presoftmax"
                imp = jnp.sum(jnp.where(valid, scores, 0.0), axis=0)
            imp_ref[0, 0, 0] = imp

            # ---- local V pruning + gated V fetch + P·V ---------------
            if do_vprune:
                # per-QUERY-head block selection (reference: one top-k per
                # (head, query) request).  Mosaic can't reshape across the
                # lane dim, so block aggregation/expansion are 0/1-matmuls.
                col_blk = jax.lax.broadcasted_iota(
                    jnp.int32, (cap, num_vblk), 0) // vblk
                blk_ids_cn = jax.lax.broadcasted_iota(
                    jnp.int32, (cap, num_vblk), 1)
                agg = (col_blk == blk_ids_cn).astype(jnp.float32)  # [C, nb]
                mass = jax.lax.dot_general(
                    probs, agg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [G, nb]
                kth = _kth_largest(mass, keep_blocks)     # [G]
                keep_gb = (mass >= kth[:, None]).astype(jnp.float32)
                keep_gc = jax.lax.dot_general(
                    keep_gb, agg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [G, C]
                probs_pv = probs * keep_gc
                # fetch a block if ANY query head keeps it
                keep_blk = jnp.max(keep_gb, axis=0)       # [nb]
            else:
                probs_pv = probs
                keep_blk = None

            iot = jax.lax.broadcasted_iota(
                jnp.int32, (1, num_vblk), 1).reshape(-1)

            def v_loop(do_wait):
                def body(i, _):
                    in_len = i * vblk < length
                    if keep_blk is not None:
                        kept = jnp.sum(
                            jnp.where(iot == i, keep_blk, 0.0)) > 0.5
                        cond = jnp.logical_and(in_len, kept)
                    else:
                        cond = in_len

                    @pl.when(cond)
                    def _():
                        cp = pltpu.make_async_copy(
                            vfull_hbm.at[b, h, pl.ds(i * vblk, vblk), :],
                            vfull_scr.at[pl.ds(i * vblk, vblk), :],
                            vsem.at[i],
                        )
                        if do_wait:
                            cp.wait()
                        else:
                            cp.start()
                    return 0
                jax.lax.fori_loop(0, num_vblk, body, 0)

            v_loop(do_wait=False)
            v_loop(do_wait=True)

            vscale = vscale_ref[0, 0, 0]                  # [C]
            v_deq = vfull_scr[:].astype(jnp.float32) * vscale[:, None]
            out = jax.lax.dot_general(
                probs_pv, v_deq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # [G, D]
            out_ref[0, 0] = out

    return kernel, (num_kblk, num_fblk, num_vblk)


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
    interpret: bool = False,
) -> Tuple[jax.Array, AttentionStats]:
    """Single-token (decode) SpAtten attention.  Returns (out [B,Hq,1,D],
    stats) matching `spatten_attention_reference` for q_len == 1."""
    b, hq, q_len, d = q.shape
    assert q_len == 1, "decode kernel is single-query; use the reference/" \
        "prefill path for q_len > 1"
    hkv = k_quant.full.shape[1]
    cap = k_quant.full.shape[2]
    group = hq // hkv
    assert cap % v_block_size == 0

    kernel, (num_kblk, num_fblk, num_vblk) = _make_kernel(
        cap=cap, group=group, head_dim=d, sm_scale=sm_scale,
        requant_threshold=requant_threshold, quant_enabled=quant_enabled,
        v_keep=v_keep, v_block=v_block_size,
        importance_kind=importance_kind, use_rope=use_rope,
    )

    qg = q.astype(jnp.float32).reshape(b, hkv, group, d)
    if head_mask is None:
        hm = jnp.ones((b, hkv, 1, group), jnp.float32)
    else:
        hmb = head_mask if head_mask.ndim == 2 else \
            jnp.broadcast_to(head_mask[None], (b, hq))
        hm = hmb.astype(jnp.float32).reshape(b, hkv, 1, group)

    kscale = k_quant.scale.reshape(b, hkv, 1, cap)
    vscale = v_quant.scale.reshape(b, hkv, 1, cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, group, d), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, group), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # k msb (HBM)
            pl.BlockSpec(memory_space=pl.ANY),         # k full (HBM)
            pl.BlockSpec(memory_space=pl.ANY),         # v full (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, group, d), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 128), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 128), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cap), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((group, cap), jnp.float32),     # probs
            pltpu.VMEM((group, cap), jnp.float32),     # scores
            pltpu.VMEM((cap // 2, d), jnp.uint8),      # k msb scratch
            pltpu.VMEM((cap, d), jnp.int8),            # k full scratch
            pltpu.VMEM((cap, d), jnp.int8),            # v full scratch
            pltpu.SemaphoreType.DMA((num_kblk,)),
            pltpu.SemaphoreType.DMA((num_fblk,)),
            pltpu.SemaphoreType.DMA((num_vblk,)),
        ],
    )

    out, maxp, need, imp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, group, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, hkv, 1, cap), jnp.float32),
        ],
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        qg, kscale, vscale,
        cos.astype(jnp.float32), sin.astype(jnp.float32), hm,
        k_quant.msb, k_quant.full, v_quant.full,
    )

    stats = AttentionStats(
        max_prob=maxp[..., 0, 0],
        need_requant=need[..., 0, 0].astype(bool),
        importance_delta=imp.reshape(b, hkv, cap),
        probs=None,
    )
    return out.reshape(b, hq, 1, d), stats
