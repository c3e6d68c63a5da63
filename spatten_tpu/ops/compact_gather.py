"""Pallas row-compaction gather for cascade-prune events.

XLA's per-(batch, head, token) row gather runs at ~5-7 GB/s on v5e (the
round-4 bound on the prune stall).  This kernel inverts the access
pattern: it STREAMS source blocks (contiguous grouped DMAs), compacts
each block's kept rows with an MXU permutation matmul, and flushes
FULL-BLOCK-ALIGNED writes from a ring accumulator — the reference's
ZeroEliminator + cross-fragment realignment
(utils/ZeroEliminator.scala:58-234, ZeroEliminatorFrag:87-129) mapped to
the matrix unit instead of a shift network.

Key design points:

* **One kernel for K and V**: both planes share the keep mask, the
  rank prefix sums, and the per-head permutation matrix; V rides the
  same matmuls for ~40% marginal cost.
* **MXU compaction**: ``P2 @ x`` with ``P2[dst, src] = 1`` iff kept row
  ``src`` of this block lands at ring row ``dst``.  Every destination
  row has at most ONE 0/1 source, so bf16 inputs + f32 accumulation are
  bit-exact for int8 payloads.  A VPU log-shift network measured
  ~8 us/(head·block); the matmul is ~1.4 us.
* **Scalar cursors from prefix sums**: destination offsets/counts per
  (batch, head, source block) are precomputed in XLA and
  scalar-prefetched; accumulator fill and flushed-block counts are pure
  functions of them (``o % blk``, ``o // blk``) — the only SMEM state
  is DMA-pend bookkeeping.
* **In-place safety**: keep indices are sorted ascending and distinct,
  so flush block ``fb <= i`` at source block ``i`` — writes never touch
  source rows later instances read, and flush regions are mutually
  disjoint.  Rows past the kept count hold garbage, dead under the
  engine's layer-length contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blk_of(c: int, target: int = 512) -> int:
    nb = max(1, -(-c // target))
    while c % nb:
        nb += 1
    return c // nb


def _make_kernel(*, blk: int, nblk: int, heads: int, d: int, bg: int,
                 nslots: int, ngroups: int):
    f = heads * d
    blk2 = 2 * blk

    def kernel(lengths_ref, trig_ref, offs_ref, cnts_ref,
               mask_hbm, k_hbm, v_hbm, k_out, v_out,
               kin_scr, vin_scr, m_scr, acck_scr, accv_scr, pend_scr,
               rd_sem, wr_sem):
        g = pl.program_id(0)               # batch group
        i = pl.program_id(1)               # source block
        flat = g * nblk + i
        b0 = g * bg

        # SMEM pend layout per (plane p, member m, head h, parity s):
        # base = ((p*bg + m)*heads + h)*2 + s; three arrays concatenated:
        # [flag | flushed-block pf | batch row pb]
        npend = 2 * bg * heads * 2

        def pidx(p, m, h, s):
            return ((p * bg + m) * heads + h) * 2 + s

        def group_active(gg, ii):
            a = (trig_ref[gg * bg] > 0) & (ii * blk < lengths_ref[gg * bg])
            for m in range(1, bg):
                a = a | ((trig_ref[gg * bg + m] > 0)
                         & (ii * blk < lengths_ref[gg * bg + m]))
            return a

        act = group_active(g, i)
        slot = flat % nslots

        def reads(gg, ii):
            s = (gg * nblk + ii) % nslots
            bb = gg * bg
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(bb, bg), pl.ds(ii * blk, blk), :],
                kin_scr.at[s], rd_sem.at[s, 0]).start()
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(bb, bg), pl.ds(ii * blk, blk), :],
                vin_scr.at[s], rd_sem.at[s, 1]).start()
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(bb, bg), pl.ds(ii * blk, blk), :],
                m_scr.at[s], rd_sem.at[s, 2]).start()

        @pl.when(flat == 0)
        def _():
            for z in range(3 * npend):
                pend_scr[z] = 0
            for k in range(min(nslots, ngroups * nblk)):
                gg, ii = k // nblk, k % nblk

                @pl.when(group_active(gg, ii))
                def _(gg=gg, ii=ii):
                    reads(gg, ii)

        def wait_pend(p, m, h, s):
            acc = acck_scr if p == 0 else accv_scr
            hbm = k_out if p == 0 else v_out

            @pl.when(pend_scr[pidx(p, m, h, s)] > 0)
            def _():
                pf = pend_scr[npend + pidx(p, m, h, s)]
                pb = pend_scr[2 * npend + pidx(p, m, h, s)]
                pltpu.make_async_copy(
                    acc.at[m, h, pl.ds(s * blk, blk), :],
                    hbm.at[pb, pl.ds(pf * blk, blk), pl.ds(h * d, d)],
                    wr_sem.at[p, m, h, s]).wait()
                pend_scr[pidx(p, m, h, s)] = 0

        def flush(p, m, h, fb):
            """DMA the completed ring half (parity fb%2) of accumulator
            (p, m, h) to flushed block fb of batch row b0+m."""
            acc = acck_scr if p == 0 else accv_scr
            hbm = k_out if p == 0 else v_out
            for s in range(2):
                @pl.when(fb % 2 == s)
                def _(s=s):
                    wait_pend(p, m, h, s)
                    pltpu.make_async_copy(
                        acc.at[m, h, pl.ds(s * blk, blk), :],
                        hbm.at[b0 + m, pl.ds(fb * blk, blk),
                               pl.ds(h * d, d)],
                        wr_sem.at[p, m, h, s]).start()
                    pend_scr[pidx(p, m, h, s)] = 1
                    pend_scr[npend + pidx(p, m, h, s)] = fb
                    pend_scr[2 * npend + pidx(p, m, h, s)] = b0 + m

        @pl.when(act)
        def _():
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(b0, bg), pl.ds(i * blk, blk), :],
                kin_scr.at[slot], rd_sem.at[slot, 0]).wait()
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(b0, bg), pl.ds(i * blk, blk), :],
                vin_scr.at[slot], rd_sem.at[slot, 1]).wait()
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(b0, bg), pl.ds(i * blk, blk), :],
                m_scr.at[slot], rd_sem.at[slot, 2]).wait()

            # strictly-lower-triangular matrix for exclusive rank
            # prefix sums along sublanes: kbT[t, h] = #kept among tokens
            # < t of this block (0/1 bf16 inputs, f32 accumulation —
            # exact).  Everything stays sublane-major: [N, 1]-style
            # lane broadcasts are the only broadcast form Mosaic's
            # layout pass handles robustly ([1, N]-row intermediates
            # crash it).
            rowt = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
            colt = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
            tril = (colt < rowt).astype(jnp.bfloat16)
            iota_d = jax.lax.broadcasted_iota(jnp.int32, (blk, blk2), 1)
            row2 = jax.lax.broadcasted_iota(jnp.int32, (blk2, 1), 0)

            for m in range(bg):
                bm = b0 + m
                m_act = (trig_ref[bm] > 0) & (i * blk < lengths_ref[bm])

                @pl.when(m_act)
                def _(m=m, bm=bm):
                    mtt_i = m_scr[slot, m].astype(jnp.int32)
                    kbT = jax.lax.dot_general(
                        tril, mtt_i.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(jnp.int32)              # [blk, 128]
                    mti = mtt_i > 0                  # [blk, 128]
                    last_active = ((i + 1) * blk >= lengths_ref[bm]) \
                        | (i == nblk - 1)
                    for h in range(heads):
                        o = offs_ref[bm, h, i]
                        cnt = cnts_ref[bm, h, i]
                        fill = o - (o // blk) * blk       # o % blk
                        ident = (o == i * blk) & (cnt == blk)
                        work = jnp.logical_not(ident) & (cnt > 0)

                        @pl.when(work)
                        def _(m=m, h=h, o=o, cnt=cnt, fill=fill):
                            # ring destinations of this block's kept
                            # rows: (o + rank) mod 2*blk, via scalar
                            # mod + one vector select (lax.rem on mixed
                            # scalar/vector ranks crashes Mosaic)
                            om = o - (o // blk2) * blk2
                            t = om + kbT[:, h:h + 1]      # [blk, 1]
                            dsthT = t - jnp.where(t >= blk2, blk2, 0)
                            p2t = ((iota_d == dsthT) & mti[:, h:h + 1]
                                   ).astype(jnp.bfloat16)  # [blk, 2blk]
                            # both planes ride one matmul: lanes [K | V];
                            # transposed contraction (src dim 0 x 0)
                            xkv = jnp.concatenate(
                                [kin_scr[slot, m, :, h * d:(h + 1) * d],
                                 vin_scr[slot, m, :, h * d:(h + 1) * d]],
                                axis=1).astype(jnp.bfloat16)
                            res = jax.lax.dot_general(
                                p2t, xkv, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                            ).astype(jnp.int8)           # [2blk, 2d]
                            # merge the cnt consecutive ring rows
                            rr = row2 - om + blk2         # (0, 2*blk2)
                            rrel = rr - jnp.where(rr >= blk2, blk2, 0)
                            inr = rrel < cnt
                            # wait any pending flush DMA before its ring
                            # half is overwritten by this merge
                            # (conservative: both planes, both halves —
                            # the pl.when bodies are no-ops unless a
                            # flush is actually outstanding)
                            fb0 = o // blk
                            for s in range(2):
                                wait_pend(0, m, h, s)
                                wait_pend(1, m, h, s)
                            acck_scr[m, h] = jnp.where(
                                inr, res[:, :d],
                                acck_scr[m, h].astype(jnp.int8))
                            accv_scr[m, h] = jnp.where(
                                inr, res[:, d:],
                                accv_scr[m, h].astype(jnp.int8))
                            # flush any block completed by this merge
                            done = (o + cnt) // blk

                            @pl.when(done > fb0)
                            def _(m=m, h=h, fb0=fb0):
                                flush(0, m, h, fb0)
                                flush(1, m, h, fb0)

                        # end of sequence: flush the partial remainder
                        @pl.when(last_active & (
                            (o + cnt) - ((o + cnt) // blk) * blk > 0))
                        def _(m=m, h=h, o=o, cnt=cnt):
                            fbp = (o + cnt) // blk
                            flush(0, m, h, fbp)
                            flush(1, m, h, fbp)

        # prefetch the read `nslots` instances ahead into the freed slot
        nflat = flat + nslots
        has_succ = nflat < ngroups * nblk
        ng = jnp.minimum(nflat // nblk, ngroups - 1)
        ni = nflat % nblk

        @pl.when(has_succ & group_active(ng, ni))
        def _():
            reads(ng, ni)

        # final instance: drain outstanding flushes
        @pl.when(flat == ngroups * nblk - 1)
        def _():
            for p in range(2):
                for m in range(bg):
                    for h in range(heads):
                        for s in range(2):
                            wait_pend(p, m, h, s)

    return kernel


def gather_compact_rows(
    k_plane: jax.Array,      # [B, C, F] int8 token-major (F = H*D)
    v_plane: jax.Array,      # [B, C, F] int8
    keep_idx: jax.Array,     # [B, H, P] int32; the first keep_count
                             #   entries are sorted ascending + distinct
                             #   (the live keeps); the rest is dead
                             #   padding excluded via keep_count
    lengths: jax.Array,      # [B] int32 — blocks past a sequence's live
                             #   length are skipped entirely
    triggered: jax.Array,    # [B] bool/int — False sequences are
                             #   untouched (identity keep rows)
    *,
    keep_count=None,         # [B] int32 live keep entries per row; None
                             #   = every entry of keep_idx is live
    window=None,             # static bound on lengths/keep positions
                             #   (the layer's capacity rung): the grid
                             #   covers only this prefix's source blocks
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Compact kept rows to the front of both planes, in place (alias
    the operands by donating them).  Rows past each (b, h)'s kept count
    hold garbage — dead under the engine's layer-length contract."""
    b, c, f = k_plane.shape
    h = keep_idx.shape[1]
    d = f // h
    win = c if window is None else min(window, c)
    blk = _blk_of(win)
    if c % blk:
        win, blk = c, _blk_of(c)
    nblk = win // blk
    nslots = 4 if nblk > 3 else (2 if nblk > 1 else 1)
    bg = 2 if b % 2 == 0 else 1
    ngroups = b // bg

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    hidx = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    scat_idx = keep_idx.astype(jnp.int32)
    if keep_count is not None:
        validk = (jnp.arange(keep_idx.shape[-1],
                             dtype=jnp.int32)[None, None, :]
                  < keep_count[:, None, None])
        scat_idx = jnp.where(validk, scat_idx, c)   # dropped (oob)
    mask_bhc = jnp.zeros((b, h, c), jnp.int8).at[
        bidx, hidx, scat_idx].set(1, mode="drop")
    # token-major mask, lane dim padded to 128 for DMA-aligned slices
    mask = jnp.zeros((b, c, 128), jnp.int8).at[:, :, :h].set(
        mask_bhc.transpose(0, 2, 1))

    cnts = jnp.sum(
        mask_bhc[:, :, :win].reshape(b, h, nblk, blk).astype(jnp.int32),
        axis=-1)                                           # [B, H, nblk]
    offs = jnp.cumsum(cnts, axis=-1) - cnts                # exclusive

    kernel = _make_kernel(blk=blk, nblk=nblk, heads=h, d=d, bg=bg,
                          nslots=nslots, ngroups=ngroups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ngroups, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((nslots, bg, blk, f), jnp.int8),    # K in slots
            pltpu.VMEM((nslots, bg, blk, f), jnp.int8),    # V in slots
            pltpu.VMEM((nslots, bg, blk, 128), jnp.int8),  # mask slots
            pltpu.VMEM((bg, h, 2 * blk, d), jnp.int8),     # K ring accs
            pltpu.VMEM((bg, h, 2 * blk, d), jnp.int8),     # V ring accs
            pltpu.SMEM((3 * 2 * bg * h * 2,), jnp.int32),  # pend state
            pltpu.SemaphoreType.DMA((nslots, 3)),
            pltpu.SemaphoreType.DMA((2, bg, h, 2)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k_plane.shape, k_plane.dtype),
                   jax.ShapeDtypeStruct(v_plane.shape, v_plane.dtype)],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(lengths.astype(jnp.int32),
      jnp.asarray(triggered).astype(jnp.int32),
      offs.astype(jnp.int32), cnts.astype(jnp.int32),
      mask, k_plane, v_plane)
    return outs[0], outs[1]
