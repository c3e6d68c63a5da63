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
) -> Tuple[LayerKVCache, Optional[jax.Array]]:
    """Compact one layer's planes to ``keep_idx`` in place.

    Returns (cache', imp') with the kept tokens moved to the front of
    every plane.  See module docstring for the exactness / in-place /
    repack contracts.
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

    for c in range(nch):
        sl = slice(c * u, (c + 1) * u)
        idx_c = kidx[:, :, sl]                           # [B, H, u]
        idx_t = idx_c.transpose(0, 2, 1)                 # [B, u, H]
        g4 = idx_t[..., None]                            # [B, u, H, 1]

        # ---- K: gather -> rotate moved rows -> requant moved rows ----
        kc = jnp.take_along_axis(kf.reshape(b, cap, h, d), g4, axis=1)
        ksc_c = jnp.take_along_axis(ksc, idx_c, axis=-1)  # [B, H, u]
        if rotate_k:
            d_c = delta[:, :, sl].transpose(0, 2, 1)     # [B, u, H]
            kc, ksc_t = rotate_moved_rows(
                kc, ksc_c.transpose(0, 2, 1), d_c, d, rope_theta)
            ksc_c = ksc_t.transpose(0, 2, 1).astype(ksc.dtype)
        kc2 = kc.reshape(b, u, f)
        kf = jax.lax.dynamic_update_slice(kf, kc2, (0, c * u, 0))
        ksc = jax.lax.dynamic_update_slice(ksc, ksc_c.astype(ksc.dtype),
                                           (0, 0, c * u))
        if km is not None:
            km = jax.lax.dynamic_update_slice(
                km, _pack_unit_msb(kc2), (0, c * (u // 2), 0))
        if kl2 is not None:
            kl2 = jax.lax.dynamic_update_slice(
                kl2, _pack_unit_lsb2(kc2), (0, c * (u // 4), 0))

        # ---- V: pure gather (values carry no positional encoding) ----
        vc = jnp.take_along_axis(vf.reshape(b, cap, h, d), g4, axis=1
                                 ).reshape(b, u, f)
        vsc_c = jnp.take_along_axis(vsc, idx_c, axis=-1)
        vf = jax.lax.dynamic_update_slice(vf, vc, (0, c * u, 0))
        vsc = jax.lax.dynamic_update_slice(vsc, vsc_c, (0, 0, c * u))
        if vm is not None:
            vm = jax.lax.dynamic_update_slice(
                vm, _pack_unit_msb(vc), (0, c * (u // 2), 0))
        if vl2 is not None:
            vl2 = jax.lax.dynamic_update_slice(
                vl2, _pack_unit_lsb2(vc), (0, c * (u // 4), 0))

        if imp is not None:
            imp_c = jnp.take_along_axis(imp, idx_c, axis=-1)
            imp = jax.lax.dynamic_update_slice(imp, imp_c, (0, 0, c * u))

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
