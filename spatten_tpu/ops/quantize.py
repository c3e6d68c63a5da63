"""Two-plane progressive KV quantization over the token-major layout.

TPU realization of the reference's bit-sliced buffer + progressive fetch
(Buffer.scala:78-83 one-RAM-per-bit; MatrixFetcher.scala:333-361 MSB/LSB
bit-plane alignment; SpAttenController.scala:214-232 masked LSB writes):

* ``full`` plane: int8 ``[..., T, H*D]`` — **token-major**: one contiguous
  row per token slot holding every head's vector.  This is the layout the
  decode kernel wants: appends are single-row writes, per-block fetches
  are contiguous slabs covering all heads (see ops/fused_decode.py).
* ``msb`` plane: the arithmetic-shift-right-4 nibble of the int8 value,
  packed two-tokens-per-byte into a uint8 ``[..., T//2, H*D]`` — reading
  it moves 0.5 bytes/element over HBM, the true 4-bit bandwidth.
* ``scale``: f32 ``[..., H, T]`` symmetric per-(token, head) scale.

Packing layout ("block-local split-token"): tokens pack in units of
``U = pack_unit(T)`` consecutive tokens — packed row ``u*U/2 + r`` holds
the MSB nibble of token ``u*U + r`` in its high bits and of token
``u*U + U/2 + r`` in its low bits.  Unpacking stays a cheap sublane
concat per unit (no lane shuffles), and — the point of the unit split —
a *length-prefix* fetch of the packed plane moves ~0.5 B per live token
at ANY live length: with a single global split (unit = T) every fetched
byte pairs a live hi nibble with a dead lo nibble whenever
``length < T/2``, silently doubling pass-1 traffic at exactly the pruned
steady state the engine lives in.  ``U`` matches the decode kernel's
packed fetch block (2 x ~1024 rows).

The planes compose exactly: ``int8 == (msb << 4) | lsb`` so a
requantization pass that fetches the full plane refines, never
contradicts, the MSB pass — mirroring how the RTL's LSB fetch completes
the MSB bits in the bit-sliced SRAM rather than recomputing a new
quantization.

Head-major <-> token-major conversion happens only at the (rare)
prefill / prune boundaries; the decode hot path reads and writes the
token-major planes directly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Midpoint correction for MSB-only dequantization: the int8 value lies in
# [msb*16, msb*16 + 15]; using the interval midpoint halves the truncation
# bias (the RTL instead left-aligns MSBs into its 12-bit fixed point,
# MatrixFetcher.scala:352-358 — same idea, different number system).
MSB_MIDPOINT = 7.5
# Same for a 6-bit pass-1 value: int8 in [k6*4, k6*4 + 3].
MIDPOINT6 = 1.5


class QuantizedKV(NamedTuple):
    """A quantized K or V tensor with its bit-sliced planes (token-major).

    full:  int8  [..., T, H*D]
    msb:   uint8 [..., T//2, H*D]   packed nibble plane holding BIASED
                                    nibbles n = (full >> 4) + 8 (see
                                    _nibble), or None when
                                    progressive quantization is off (a
                                    dense engine never reads MSBs, so it
                                    never pays their HBM footprint)
    scale: f32   [..., H, T]        per-(token, head) scale
    lsb2:  uint8 [..., T//4, H*D]   packed 2-bit plane (bits 3:2 of the
                                    int8), or None.  Present only when a
                                    6-bit pass-1 profile is in use:
                                    k6 == (msb << 2) | lsb2 == full >> 2,
                                    so a 6-bit fetch moves 0.75 B/elem.
                                    The RTL's 6-bit profile packs two
                                    fused matrices instead
                                    (MatrixFetcher.scala:48-51) — same
                                    bandwidth, different packing.
    """

    full: jax.Array
    msb: Optional[jax.Array]
    scale: jax.Array
    lsb2: Optional[jax.Array] = None

    @property
    def tokens(self) -> int:
        return self.full.shape[-2]

    @property
    def heads(self) -> int:
        return self.scale.shape[-2]

    @property
    def head_dim(self) -> int:
        return self.full.shape[-1] // self.scale.shape[-2]


def _nibble(q8: jax.Array) -> jax.Array:
    """Biased MSB nibble ``n = k4 + 8`` of an int8 value, uint8 in [0, 15].

    The +8 bias (an XOR of the sign bit) is applied at PACK time so the
    decode kernel can score packed bytes **without unpacking**: with
    ``byte == 16*n_hi + n_lo`` (both halves biased, non-negative),
    ``q . byte == 16*(q . n_hi) + (q . n_lo)`` — one matmul over the raw
    packed plane plus one hi-nibble extraction recovers both token
    halves' scores (see fused_decode.msb_scores_pipeline)."""
    nib = (q8.astype(jnp.int32) >> 4) & 0xF
    return (nib ^ 8).astype(jnp.uint8)


def pack_unit(tokens: int, target: int = 1024) -> int:
    """Token span of one nibble-split unit (== 2 x the decode kernel's
    packed fetch-block rows, fused_decode._even_blocks(T//2, 1024))."""
    half = tokens // 2
    nb = max(1, -(-half // target))
    while half % nb:
        nb += 1
    return 2 * (half // nb)


def pack_msb(q8: jax.Array) -> jax.Array:
    """Pack MSB nibbles of int8 [..., T, F] into uint8 [..., T//2, F]
    (block-local split-token layout, see module docstring)."""
    t, f = q8.shape[-2:]
    assert t % 2 == 0, "token dim must be even for nibble packing"
    u = pack_unit(t)
    units = q8.reshape(q8.shape[:-2] + (t // u, u, f))
    hi = _nibble(units[..., : u // 2, :])
    lo = _nibble(units[..., u // 2:, :])
    packed = (hi << 4) | lo                 # [..., T//U, U//2, F]
    return packed.reshape(q8.shape[:-2] + (t // 2, f))


def unpack_msb(packed: jax.Array) -> jax.Array:
    """Unpack uint8 [..., T//2, F] to signed 4-bit values int8 [..., T, F].

    Values are in [-8, 7]: the arithmetic high nibble of the original int8.
    """
    h, f = packed.shape[-2:]
    u = pack_unit(2 * h)
    p = packed.reshape(packed.shape[:-2] + (2 * h // u, u // 2, f)
                       ).astype(jnp.int32)
    hi = (p >> 4) - 8                # un-bias (nibbles store n = k4 + 8)
    lo = (p & 0xF) - 8
    out = jnp.concatenate([hi, lo], axis=-2)     # [..., T//U, U, F]
    return out.reshape(packed.shape[:-2] + (2 * h, f)).astype(jnp.int8)


def pack_lsb2(q8: jax.Array) -> jax.Array:
    """Pack the 2-bit field (bits 3:2) of int8 [..., T, F] into uint8
    [..., T//4, F] — four tokens per byte, block-local split like the
    msb plane: within each ``U = pack_unit(T)``-token unit, packed row
    ``r`` holds token ``u*U + q*U/4 + r`` in bits ``[7-2q : 6-2q]``.
    One U/4-row fetch therefore carries the 2-bit refinements for the
    SAME token span as one msb fetch block (the 6-bit pass streams both
    side by side)."""
    t, f = q8.shape[-2:]
    assert t % 4 == 0, "token dim must be a multiple of 4 for 2-bit packing"
    u = pack_unit(t)
    assert u % 4 == 0
    qr = u // 4
    units = q8.reshape(q8.shape[:-2] + (t // u, u, f)).astype(jnp.int32)
    f2 = (units >> 2) & 0x3
    out = jnp.zeros(q8.shape[:-2] + (t // u, qr, f), jnp.int32)
    for qi in range(4):
        out = out | (f2[..., qi * qr:(qi + 1) * qr, :] << (6 - 2 * qi))
    return out.astype(jnp.uint8).reshape(q8.shape[:-2] + (t // 4, f))


def unpack_lsb2(packed: jax.Array) -> jax.Array:
    """Unpack uint8 [..., T//4, F] to the unsigned 2-bit values
    (in [0, 3]) as int8 [..., T, F]."""
    h, f = packed.shape[-2:]
    u = pack_unit(4 * h)
    qr = u // 4
    p = packed.reshape(packed.shape[:-2] + (4 * h // u, qr, f)
                       ).astype(jnp.int32)
    parts = [((p >> (6 - 2 * qi)) & 0x3) for qi in range(4)]
    out = jnp.concatenate(parts, axis=-2)        # [..., T//U, U, F]
    return out.reshape(packed.shape[:-2] + (4 * h, f)).astype(jnp.int8)


def _to_token_major(x_hm: jax.Array) -> jax.Array:
    """[..., H, T, D] -> [..., T, H*D]."""
    h, t, d = x_hm.shape[-3:]
    moved = jnp.moveaxis(x_hm, -3, -2)                 # [..., T, H, D]
    return moved.reshape(x_hm.shape[:-3] + (t, h * d))


def _to_head_major(fused: jax.Array, heads: int) -> jax.Array:
    """[..., T, H*D] -> [..., H, T, D]."""
    t, f = fused.shape[-2:]
    d = f // heads
    split = fused.reshape(fused.shape[:-2] + (t, heads, d))
    return jnp.moveaxis(split, -2, -3)                 # [..., H, T, D]


def quantize(x: jax.Array, with_msb: bool = True, with_lsb2: bool = False
             ) -> QuantizedKV:
    """Symmetric int8 quantization of head-major input [..., H, T, D]."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)   # [..., H, T]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    fused = _to_token_major(q8)
    return QuantizedKV(full=fused,
                       msb=pack_msb(fused) if with_msb else None,
                       scale=scale,
                       lsb2=pack_lsb2(fused) if with_lsb2 else None)


def dequantize_full(q: QuantizedKV, dtype=jnp.float32) -> jax.Array:
    """-> head-major [..., H, T, D]."""
    hm = _to_head_major(q.full, q.heads).astype(jnp.float32)
    return (hm * q.scale[..., None]).astype(dtype)


def dequantize_msb(q: QuantizedKV, dtype=jnp.float32) -> jax.Array:
    """Dequantize from the 4-bit plane only (pass-1 approximation).

    -> head-major [..., H, T, D].
    """
    v4 = _to_head_major(unpack_msb(q.msb), q.heads).astype(jnp.float32)
    return ((v4 * 16.0 + MSB_MIDPOINT) * q.scale[..., None]).astype(dtype)


def dequantize_6bit(q: QuantizedKV, dtype=jnp.float32) -> jax.Array:
    """Dequantize the 6-bit value k6 = (msb << 2) | lsb2 == full >> 2
    (pass-1 at a 6-bit profile; 0.75 B/elem moved).

    -> head-major [..., H, T, D].
    """
    assert q.lsb2 is not None, "6-bit profile requires the lsb2 plane"
    v4 = _to_head_major(unpack_msb(q.msb), q.heads).astype(jnp.float32)
    l2 = _to_head_major(unpack_lsb2(q.lsb2), q.heads).astype(jnp.float32)
    v6 = v4 * 4.0 + l2
    return ((v6 * 4.0 + MIDPOINT6) * q.scale[..., None]).astype(dtype)


def pass1_reference_values(q8: jax.Array, bits: int) -> jax.Array:
    """int8 -> the float a `bits`-wide pass-1 sees (tests, no packing)."""
    if bits >= 8:
        return q8.astype(jnp.float32)
    if bits == 6:
        return (q8.astype(jnp.int32) >> 2).astype(jnp.float32) * 4.0 \
            + MIDPOINT6
    return msb_reference_values(q8)


def msb_reference_values(q8: jax.Array) -> jax.Array:
    """int8 -> the float the MSB pass sees (for tests, without packing)."""
    msb = (q8.astype(jnp.int32) >> 4).astype(jnp.float32)
    return msb * 16.0 + MSB_MIDPOINT


def update_token(q: QuantizedKV, x_new: jax.Array, index: jax.Array
                 ) -> QuantizedKV:
    """Write one new token row into slot `index` of both planes.

    x_new: [..., H, D] unquantized; index: scalar int32 slot.
    The packed-plane write is a read-modify-write of one byte row, touching
    only the nibble owned by `index` — the TPU analog of the RTL's per-bit
    write mask (SpAttenController.scala:230-232).
    """
    t = q.tokens
    x32 = x_new.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)                     # [..., H]
    scale_new = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8_new = jnp.clip(jnp.round(x32 / scale_new[..., None]), -127, 127
                      ).astype(jnp.int8)                      # [..., H, D]
    fused_row = q8_new.reshape(q8_new.shape[:-2]
                               + (q8_new.shape[-2] * q8_new.shape[-1],))

    full = _dus(q.full, fused_row[..., None, :], index, axis=-2)
    scale = _dus(q.scale, scale_new[..., None], index, axis=-1)
    if q.msb is None:
        return QuantizedKV(full=full, msb=None, scale=scale, lsb2=q.lsb2)

    u = pack_unit(t)
    r_u = index % u
    is_hi = r_u < u // 2
    row = (index // u) * (u // 2) + (r_u % (u // 2))
    old = jax.lax.dynamic_index_in_dim(q.msb, row, axis=q.msb.ndim - 2,
                                       keepdims=False)        # [..., H*D]
    nib = _nibble(fused_row)
    new_byte = jnp.where(
        is_hi,
        (nib << 4) | (old & jnp.uint8(0x0F)),
        (old & jnp.uint8(0xF0)) | nib,
    )
    msb = _dus(q.msb, new_byte[..., None, :], row, axis=-2)

    lsb2 = q.lsb2
    if lsb2 is not None:
        qr4 = u // 4
        r_in = index % u
        qi = r_in // qr4                       # 2-bit field within the unit
        qrow = (index // u) * qr4 + (r_in % qr4)
        old2 = jax.lax.dynamic_index_in_dim(
            lsb2, qrow, axis=lsb2.ndim - 2, keepdims=False).astype(jnp.int32)
        f2 = (fused_row.astype(jnp.int32) >> 2) & 0x3
        shift = (6 - 2 * qi).astype(jnp.int32)
        mask = jnp.int32(0x3) << shift
        new2 = (old2 & ~mask) | (f2 << shift)
        lsb2 = _dus(lsb2, new2.astype(jnp.uint8)[..., None, :], qrow,
                    axis=-2)
    return QuantizedKV(full=full, msb=msb, scale=scale, lsb2=lsb2)


def gather_tokens(q: QuantizedKV, indices: jax.Array) -> QuantizedKV:
    """Rebuild a QuantizedKV keeping `indices` along the token axis.

    indices: [..., H, T_new] per-head kept slots (leading dims broadcast
    against q's leading dims).  Used by token pruning: each head gathers
    its own survivor set, then the nibble plane re-packs (pruning is
    capacity-triggered and rare, so a full re-pack is cheap relative to
    decode steps).
    """
    heads = q.heads
    full_hm = _to_head_major(q.full, heads)                   # [...,H,T,D]
    full_g = jnp.take_along_axis(full_hm, indices[..., None], axis=-2)
    scale = jnp.take_along_axis(q.scale, indices, axis=-1)
    fused = _to_token_major(full_g)
    return QuantizedKV(
        full=fused,
        msb=pack_msb(fused) if q.msb is not None else None,
        scale=scale,
        lsb2=pack_lsb2(fused) if q.lsb2 is not None else None)


def rotate_rows_by_delta(q: QuantizedKV, delta: jax.Array, cos: jax.Array,
                         sin: jax.Array) -> QuantizedKV:
    """Re-rotate each token row by a (non-positive) position delta.

    Used by the cached-rotated-K cache mode: after a prune moves a kept
    token from slot p to slot p' <= p, its stored rotation must shift by
    Δ = p' - p (rotations compose: R(p') = R(Δ)R(p)).  Dequantizes,
    rotates by Δ (cos is even, sin is odd: cos(Δ)=cos(-Δ),
    sin(Δ)=-sin(-Δ)), and requantizes both planes.

    delta: int32 [..., H, T] with delta <= 0; cos/sin: [P, D] rope tables.
    """
    x = dequantize_full(q, jnp.float32)                  # [..., H, T, D]
    mag = jnp.clip(-delta, 0, cos.shape[0] - 1)
    c = jnp.take(cos, mag, axis=0)                       # [..., H, T, D]
    s = -jnp.take(sin, mag, axis=0)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return quantize(x * c + rot * s, with_msb=q.msb is not None,
                    with_lsb2=q.lsb2 is not None)


def _dus(arr: jax.Array, update: jax.Array, index: jax.Array, axis: int
         ) -> jax.Array:
    """dynamic_update_slice of one row along `axis` (negative ok)."""
    axis = axis % arr.ndim
    starts = [jnp.int32(0)] * arr.ndim
    starts[axis] = index.astype(jnp.int32)
    return jax.lax.dynamic_update_slice(arr, update.astype(arr.dtype), starts)
