"""Fused prune compaction: gather + moved-row-only delta re-rotation +
requantization + prefix nibble repack, streamed over pack-unit chunks.

This is the serving-path replacement for the naive
``prune_layer -> rotate_rows_by_delta`` chain, whose whole-layer f32
transient (``[B, Hkv, C, D]`` ~ 1 GB/layer at cap 16384 x batch 32) made
a cascade-prune event cost ~1.7 s in the round-3 bench.  The reference's
compaction is an index-list update that never touches token payloads
(SpAttenController.scala:20-33 — the score_buf only shrinks); on TPU the
payload move is real, so the design goal is the bandwidth floor: touch
each kept token's int8 bytes once in / once out, bound the f32 transient
to one pack-unit chunk, and re-rotate ONLY rows that actually moved
(delta < 0).

Key properties:

* **Bit-exact identity**: rows with delta == 0 (start tokens, the
  relative order-preserved part of the recent window, and — via identity
  ``keep_idx`` — every untriggered sequence) are copied bit-for-bit; no
  dequant/requant round-trip perturbs them.
* **In-place, front-to-back**: kept indices are sorted ascending and
  distinct, so ``keep_idx[i] >= i`` — chunk ``c``'s writes to slots
  ``[c*u, (c+1)*u)`` can never be read by a later chunk (whose gather
  indices are all ``>= (c+1)*u``).  The compaction streams over the
  carried planes without a second buffer.
* **Unit-local repack**: the packed nibble planes use a block-local
  split-token layout (qz.pack_unit), so repacking the kept prefix
  touches exactly the rows of the units it covers; chunk size == one
  pack unit makes the repack a per-chunk epilogue.

Slots in ``[keep_count, keep_max)`` hold garbage gathered from slot 0,
and planes beyond the padded keep region keep their old bytes — both
dead under the engine's ``layer_lengths`` contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spatten_tpu.engine.kv_cache import LayerKVCache
from spatten_tpu.ops import quantize as qz


def _rope_cos_sin(mag: jax.Array, head_dim: int, theta: float
                  ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin of the re-rotation angle for each (row, lane) — computed
    directly from the position magnitude instead of gathering [P, D]
    table rows (the gather would move ~4x the chunk's payload bytes).
    Bit-matches rope_table: same f32 ``pos * inv_freq`` then cos/sin."""
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = mag.astype(jnp.float32)[..., None] * inv_freq   # [..., D//2]
    ang = jnp.concatenate([ang, ang], axis=-1)            # [..., D]
    return jnp.cos(ang), jnp.sin(ang)


def rotate_moved_rows(q8, sc, delta, head_dim: int, rope_theta: float):
    """Re-rotate rows that MOVED (delta < 0) by their slot delta and
    requantize them; unmoved rows return bit-exact.

    q8:    int8 [..., H, D] gathered rows (token-position leading dims)
    sc:    f32-compatible [..., H] their scales
    delta: int32 [..., H] non-positive move distance
    Returns (q8', sc') with the same shapes/dtypes as (q8, sc).
    """
    moved = delta < 0
    scf = sc.astype(jnp.float32)
    x = q8.astype(jnp.float32) * scf[..., None]
    cc, ss = _rope_cos_sin(-delta, head_dim, rope_theta)
    half = head_dim // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], -1)
    y = x * cc - rot * ss
    amax = jnp.max(jnp.abs(y), axis=-1)
    sc_new = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8r = jnp.clip(jnp.round(y / sc_new[..., None]),
                   -127, 127).astype(jnp.int8)
    q8_out = jnp.where(moved[..., None], q8r, q8)
    sc_out = jnp.where(moved, sc_new, scf).astype(sc.dtype)
    return q8_out, sc_out


def compact_layer(
    cache: LayerKVCache,
    imp: Optional[jax.Array],          # [B, Hkv, C] or None
    keep_idx: jax.Array,               # [B, Hkv, keep_max] sorted ascending;
                                       #   identity rows for untriggered seqs
    *,
    rotate_k: bool,                    # cached-rope mode: re-rotate moved K
    rope_theta: float = 10000.0,
    lengths: Optional[jax.Array] = None,    # [B] live tokens (enables the
                                       #   gather kernel's block skipping)
    triggered: Optional[jax.Array] = None,  # [B] — False rows are known
                                       #   identity (kernel skips them)
    keep_count: Optional[jax.Array] = None,  # [B] live keep entries per
                                       #   row: entries beyond it are
                                       #   dead padding (zeros) and MUST
                                       #   be excluded from mask-based
                                       #   compaction (they duplicate
                                       #   position 0)
    window: Optional[int] = None,      # static bound on keep positions
                                       #   and lengths (the layer's
                                       #   capacity rung): metadata
                                       #   sorting/scatter run over this
                                       #   prefix instead of capacity
    use_gather_kernel: Optional[bool] = None,
) -> Tuple[LayerKVCache, Optional[jax.Array]]:
    """Compact one layer's planes to ``keep_idx`` in place.

    Returns (cache', imp') with the kept tokens moved to the front of
    every plane.  See module docstring for the exactness / in-place /
    repack contracts.

    When the Pallas gather kernel applies (TPU backend, 128-aligned head
    lanes), the int8 K/V payload moves through
    ``ops.compact_gather.gather_compact_rows`` (~5x the XLA row-gather
    throughput) and the chunked loop below only re-rotates / repacks /
    gathers metadata over the already-compacted prefix.
    """
    kq, vq = cache.k, cache.v
    b, cap, f = kq.full.shape
    h = kq.heads
    d = f // h
    keep_max = keep_idx.shape[-1]
    u = qz.pack_unit(cap)
    keep_pad = -(-keep_max // u) * u                     # u divides cap
    assert keep_pad <= cap
    nch = keep_pad // u
    win = cap if window is None else min(window, cap)
    if win % u or win < keep_pad:
        win = cap

    if use_gather_kernel is None:
        use_gather_kernel = (jax.default_backend() not in ("cpu",)
                             and d % 128 == 0 and cap % 512 == 0)

    if keep_pad > keep_max:
        # identity padding: slots [keep_max, keep_pad) self-copy (delta
        # == 0 -> bit-exact).  Zero padding would gather slot 0 into
        # them — clobbering live tokens of UNTRIGGERED sequences whose
        # identity rewrite must be a no-op.  keep_idx[i] >= i still
        # holds elementwise, preserving the in-place hazard argument.
        pad = jnp.broadcast_to(
            jnp.arange(keep_max, keep_pad, dtype=jnp.int32),
            (b, h, keep_pad - keep_max))
        kidx = jnp.concatenate([keep_idx.astype(jnp.int32), pad], axis=-1)
    else:
        kidx = keep_idx.astype(jnp.int32)
    new_slot = jnp.arange(keep_pad, dtype=jnp.int32)
    # non-positive move distance; padded slots clamp to 0 (bit-copy of
    # slot 0's garbage — dead under the length contract)
    delta = jnp.minimum(new_slot[None, None, :] - kidx, 0)  # [B, H, kp]

    kf, km, kl2, ksc = kq.full, kq.msb, kq.lsb2, kq.scale
    vf, vm, vl2, vsc = vq.full, vq.msb, vq.lsb2, vq.scale

    if use_gather_kernel:
        from spatten_tpu.ops.compact_gather import gather_compact_rows
        if lengths is None:
            lengths = jnp.full((b,), cap, jnp.int32)
        if triggered is None:
            triggered = jnp.ones((b,), jnp.int32)
        kf, vf = gather_compact_rows(
            kf, vf, keep_idx.astype(jnp.int32), lengths, triggered,
            keep_count=keep_count, window=win,
            interpret=jax.default_backend() == "cpu")

    # metadata compaction via ONE multi-operand sort: XLA's last-axis
    # gather runs ~0.13 GB/s on v5e (43 ms per [B,H,keep] f32 plane);
    # sorting (position-key, ksc, vsc, imp) once is ~3x faster than the
    # three gathers.  The mask covers only the LIVE keep entries
    # (distinct, ascending); rows beyond keep_count and the identity
    # pad tail are restored afterwards so the result matches the
    # gather semantics wherever the engine's length contract makes the
    # bytes live.
    if keep_count is not None:
        validk = (jnp.arange(keep_max, dtype=jnp.int32)[None, None, :]
                  < keep_count[:, None, None])
        scat_idx = jnp.where(validk, keep_idx.astype(jnp.int32), win)
    else:
        scat_idx = keep_idx.astype(jnp.int32)
    pos_c = jnp.broadcast_to(jnp.arange(win, dtype=jnp.int32),
                             (b, h, win))
    keepm = jnp.zeros((b, h, win), bool).at[
        jnp.arange(b, dtype=jnp.int32)[:, None, None],
        jnp.arange(h, dtype=jnp.int32)[None, :, None],
        scat_idx].set(True, mode="drop")
    sort_key = jnp.where(keepm, pos_c, win + pos_c)
    # f32 sort operands: sorting bf16 values makes XLA pick a transposed
    # 32x-padded layout for the carried scale planes (1 GB of copies per
    # plane at serving shapes); widening for the sort keeps the planes'
    # natural layout.  bf16 -> f32 -> bf16 is exact.
    ops = [sort_key, ksc[..., :win].astype(jnp.float32),
           vsc[..., :win].astype(jnp.float32)] \
        + ([imp[..., :win].astype(jnp.float32)]
           if imp is not None else [])
    sorted_ops = jax.lax.sort(tuple(ops), num_keys=1)

    def _pref(sorted_plane, plane):
        prefix = sorted_plane[..., :keep_pad]
        if keep_pad > keep_max:
            # identity pad tail (its positions may interleave with
            # recent-window keeps, so it cannot ride the mask)
            prefix = jnp.concatenate(
                [prefix[..., :keep_max], plane[..., keep_max:keep_pad]],
                axis=-1)
        if triggered is not None:
            prefix = jnp.where(
                jnp.asarray(triggered).astype(bool)[:, None, None],
                prefix, plane[..., :keep_pad])
        return prefix

    ksc_pref = _pref(sorted_ops[1].astype(ksc.dtype), ksc)
    vsc_pref = _pref(sorted_ops[2].astype(vsc.dtype), vsc)
    imp_pref = (_pref(sorted_ops[3].astype(imp.dtype), imp)
                if imp is not None else None)

    # rotation sub-chunking: the dequant/rotate/requant transient is
    # [B, us, H, D] f32 — at serving shapes a full pack-unit chunk is
    # ~134 MB and the per-layer unrolled prune branches would stack
    # several of them in XLA's temp arena; u/4 sub-chunks bound it
    nsub = 4 if u % 4 == 0 and u >= 512 else 1
    us = u // nsub

    for c in range(nch):
        sl = slice(c * u, (c + 1) * u)
        idx_c = kidx[:, :, sl]                           # [B, H, u]
        idx_t = idx_c.transpose(0, 2, 1)                 # [B, u, H]
        g4 = idx_t[..., None]                            # [B, u, H, 1]

        # ---- K: gather -> rotate moved rows -> requant moved rows ----
        ksc_c = ksc_pref[:, :, sl]                       # [B, H, u]
        for sub in range(nsub):
            s0 = c * u + sub * us
            ssl = slice(s0, s0 + us)
            if use_gather_kernel:
                # payload already compacted in place — read the prefix
                kc = kf[:, ssl].reshape(b, us, h, d)
            else:
                kc = jnp.take_along_axis(
                    kf.reshape(b, cap, h, d),
                    g4[:, sub * us:(sub + 1) * us], axis=1)
            if rotate_k:
                d_c = delta[:, :, ssl].transpose(0, 2, 1)  # [B, us, H]
                kc, ksc_t = rotate_moved_rows(
                    kc, ksc_c[:, :, sub * us:(sub + 1) * us
                              ].transpose(0, 2, 1), d_c, d, rope_theta)
                ksc_c = jax.lax.dynamic_update_slice(
                    ksc_c, ksc_t.transpose(0, 2, 1).astype(ksc_c.dtype),
                    (0, 0, sub * us))
            if rotate_k or not use_gather_kernel:
                kf = jax.lax.dynamic_update_slice(
                    kf, kc.reshape(b, us, f), (0, s0, 0))
        ksc = jax.lax.dynamic_update_slice(ksc, ksc_c.astype(ksc.dtype),
                                           (0, 0, c * u))
        # repack from the (post-rotation) written-back prefix chunk
        kc2 = kf[:, c * u:(c + 1) * u]
        if km is not None:
            km = jax.lax.dynamic_update_slice(
                km, _pack_unit_msb(kc2), (0, c * (u // 2), 0))
        if kl2 is not None:
            kl2 = jax.lax.dynamic_update_slice(
                kl2, _pack_unit_lsb2(kc2), (0, c * (u // 4), 0))

        # ---- V: pure gather (values carry no positional encoding) ----
        if use_gather_kernel:
            vc = vf[:, c * u:(c + 1) * u]
        else:
            vc = jnp.take_along_axis(vf.reshape(b, cap, h, d), g4, axis=1
                                     ).reshape(b, u, f)
        vsc_c = vsc_pref[:, :, sl]
        if not use_gather_kernel:
            vf = jax.lax.dynamic_update_slice(vf, vc, (0, c * u, 0))
        vsc = jax.lax.dynamic_update_slice(vsc, vsc_c, (0, 0, c * u))
        if vm is not None:
            vm = jax.lax.dynamic_update_slice(
                vm, _pack_unit_msb(vc), (0, c * (u // 2), 0))
        if vl2 is not None:
            vl2 = jax.lax.dynamic_update_slice(
                vl2, _pack_unit_lsb2(vc), (0, c * (u // 4), 0))

        if imp is not None:
            imp = jax.lax.dynamic_update_slice(
                imp, imp_pref[:, :, sl], (0, 0, c * u))

    k2 = qz.QuantizedKV(full=kf, msb=km, scale=ksc, lsb2=kl2)
    v2 = qz.QuantizedKV(full=vf, msb=vm, scale=vsc, lsb2=vl2)
    return LayerKVCache(k=k2, v=v2), imp


def _pack_unit_msb(q8_unit: jax.Array) -> jax.Array:
    """Pack ONE pack-unit of tokens [..., u, F] -> [..., u//2, F] (the
    split-token nibble layout is unit-local, so per-unit packing equals
    the corresponding row block of qz.pack_msb over the whole plane)."""
    u = q8_unit.shape[-2]
    hi = qz._nibble(q8_unit[..., : u // 2, :])
    lo = qz._nibble(q8_unit[..., u // 2:, :])
    return (hi << 4) | lo


def _pack_unit_lsb2(q8_unit: jax.Array) -> jax.Array:
    """Pack ONE pack-unit of tokens [..., u, F] -> [..., u//4, F]."""
    u = q8_unit.shape[-2]
    qr = u // 4
    f2 = (q8_unit.astype(jnp.int32) >> 2) & 0x3
    out = jnp.zeros(q8_unit.shape[:-2] + (qr, q8_unit.shape[-1]),
                    jnp.int32)
    for qi in range(4):
        out = out | (f2[..., qi * qr:(qi + 1) * qr, :] << (6 - 2 * qi))
    return out.astype(jnp.uint8)
