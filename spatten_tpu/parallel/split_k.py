"""Split-K (sequence-parallel) flash decode over a sharded KV axis.

SURVEY.md §2.9 (SP/CP row): the reference handles long context purely
algorithmically (rolling pruned cache), but the design must also cover
sharding the *compacted* KV itself over an ICI mesh axis for prompts that
exceed one chip's HBM or latency budget.  This module is that design: the
cache's token axis is sharded over a ``kv`` mesh axis; each shard runs
flash-style partial attention over its local slice (local running max +
denominator), and the partials combine with two ``psum``s — the standard
split-K softmax recombination

    m   = pmax(m_i)
    out = sum_i exp(m_i - m) * o_i  /  sum_i exp(m_i - m) * den_i

which is exact (no approximation) for any shard count.

Composition with SpAtten:
* token pruning happens *before* sharding (the compacted cache is what
  gets sharded), so each shard holds ``keep/n`` live tokens;
* per-token masks ride along: the global slot index of a local column is
  ``shard_index * C_local + col``, compared against the sequence length;
* importance deltas come back per shard and concatenate to the global
  accumulator layout (axis-sharded exactly like K/V), so cascade pruning
  continues to work on the sharded cache.

Two per-shard computes are provided:

* ``split_k_decode`` — jnp flash partials (the recombination-math toy);
* ``split_k_decode_fused`` — the FULL fused Pallas decode kernel per
  shard (``ops.fused_decode`` with ``return_row_stats``): each shard
  runs the SpAtten pipeline (quantized planes, gated fetches, appends)
  over its local arena and exposes its flash partials ``(m, den)``; the
  same two-psum recombination is exact.  Only the shard owning the
  append slot writes the new token (``append_mask``); requant decisions
  and V-pruning budgets apply shard-locally (each shard is its own
  confidence/top-k domain — the distributed analog of the reference's
  per-request decisions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops.fused_decode import fused_decode_attention

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _local_partial(q, k_local, v_local, base, lengths, sm_scale):
    """Partial flash attention over one KV shard.

    q: [B, H, D]; k_local/v_local: [B, H, Cl, D]; base: scalar global slot
    of local column 0; lengths: [B].  Returns (o [B,H,D], m [B,H],
    den [B,H]) — the shard's unnormalized output, running max, and
    denominator."""
    cl = k_local.shape[-2]
    scores = jnp.einsum("bhd,bhcd->bhc", q, k_local) * sm_scale
    gcol = base + jnp.arange(cl)[None, None, :]
    valid = gcol < lengths[:, None, None]
    scores = jnp.where(valid, scores, MASK_VALUE)
    m = jnp.max(scores, axis=-1)                          # [B, H]
    e = jnp.where(valid, jnp.exp(scores - m[..., None]), 0.0)
    den = jnp.sum(e, axis=-1)                             # [B, H]
    o = jnp.einsum("bhc,bhcd->bhd", e, v_local)
    return o, m, den


def split_k_decode(
    q: jax.Array,          # [B, H, D]
    k: jax.Array,          # [B, H, C, D] — token axis sharded over `axis`
    v: jax.Array,          # [B, H, C, D]
    lengths: jax.Array,    # [B]
    mesh: Mesh,
    axis: str = "kv",
    sm_scale: float = 1.0,
) -> jax.Array:
    """Exact decode attention with KV sharded over a mesh axis.

    Each device computes a flash partial over its local token slice; two
    collectives (pmax of the running max, psum of the rescaled numerator
    and denominator) produce the exact softmax-weighted output on every
    device."""
    n = mesh.shape[axis]
    c = k.shape[-2]
    assert c % n == 0, f"token axis {c} must divide over {axis}={n}"
    cl = c // n

    def shard_fn(q, k_local, v_local, lengths):
        idx = jax.lax.axis_index(axis)
        base = idx * cl
        o, m, den = _local_partial(q, k_local, v_local, base, lengths,
                                   sm_scale)
        m_g = jax.lax.pmax(m, axis)                       # [B, H]
        w = jnp.exp(m - m_g)
        num = jax.lax.psum(o * w[..., None], axis)
        den_g = jax.lax.psum(den * w, axis)
        return num / jnp.maximum(den_g, 1e-30)[..., None]

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, None, axis, None),
                  P(None, None, axis, None), P()),
        out_specs=P(),
        check_vma=False,
    ))(q, k, v, lengths)


def _kv_specs(t: qz.QuantizedKV, axis: str) -> qz.QuantizedKV:
    """PartitionSpecs sharding a QuantizedKV's token axis over `axis`."""
    return qz.QuantizedKV(
        full=P(None, axis, None),
        msb=None if t.msb is None else P(None, axis, None),
        scale=P(None, None, axis),
        lsb2=None if t.lsb2 is None else P(None, axis, None))


def split_k_decode_fused(
    q: jax.Array,              # [B, Hq, 1, D] (rotated queries)
    k_quant: qz.QuantizedKV,   # planes [B, n*Cl(/2), Hkv*D]; each shard's
    v_quant: qz.QuantizedKV,   #   Cl-token slice packed SHARD-LOCALLY
                               #   (qz.quantize per slice, then concat)
    k_new: jax.Array,          # [B, Hkv, 1, D] — appended by `owner` only
    v_new: jax.Array,
    local_lengths: jax.Array,  # int32 [n, B] live tokens per shard; the
                               #   owner's count INCLUDES the new token
    mesh: Mesh,
    axis: str = "kv",
    sm_scale: float = 1.0,
    owner: int = -1,           # shard that appends (default: the last)
    interpret: bool = False,
    **spatten_kwargs,          # quant_enabled, v_keep, head_mask, ... —
                               #   applied SHARD-LOCALLY
):
    """Exact split-K decode with the fused SpAtten kernel per shard.

    Each shard runs ``fused_decode_attention`` over its local arena
    (every stage: nibble pass-1, gated fetches, append RMW for the owner)
    and returns its flash partials; the outputs combine with

        m = pmax(m_i);  out = sum_i o_i*den_i*exp(m_i-m)
                              / sum_i den_i*exp(m_i-m)

    which is exact for any shard count.  Every shard must hold >= 1 live
    token.  Returns (out [B,Hq,1,D], k_quant', v_quant') with the owner's
    shard updated in place.
    """
    n = mesh.shape[axis]
    own = owner % n

    def shard_fn(q, kq, vq, k_new, v_new, lens_l):
        sid = jax.lax.axis_index(axis)
        b = lens_l.shape[-1]
        appm = jnp.broadcast_to((sid == own).astype(jnp.int32), (b,))
        out, stats, k2, v2, (m, den) = fused_decode_attention(
            q, kq, vq, k_new, v_new, lens_l[0],
            sm_scale=sm_scale, append_mask=appm, return_row_stats=True,
            interpret=interpret, **spatten_kwargs)
        m_g = jax.lax.pmax(m, axis)                     # [B, Hq]
        w = jnp.exp(m - m_g) * den
        num = jax.lax.psum(out * w[:, :, None, None], axis)
        den_g = jax.lax.psum(w, axis)
        out_g = num / jnp.maximum(den_g, 1e-30)[:, :, None, None]
        return out_g, k2, v2

    ks = _kv_specs(k_quant, axis)
    vs = _kv_specs(v_quant, axis)
    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), ks, vs, P(), P(), P(axis, None)),
        out_specs=(P(), ks, vs),
        check_vma=False,
    ))(q, k_quant, v_quant, k_new, v_new, local_lengths)


def quantize_sharded(x: jax.Array, n: int, with_msb: bool = True
                     ) -> qz.QuantizedKV:
    """Quantize [B, H, n*Cl, D] with SHARD-LOCAL nibble packing: each
    Cl-token slice packs independently (pack_unit(Cl)), so a shard's msb
    plane slice is exactly what a local ``qz.quantize`` would produce.
    full/scale values are identical to global quantization (scales are
    per token)."""
    cap = x.shape[-2]
    assert cap % n == 0
    cl = cap // n
    parts = [qz.quantize(x[..., i * cl:(i + 1) * cl, :], with_msb=with_msb)
             for i in range(n)]
    return qz.QuantizedKV(
        full=jnp.concatenate([p.full for p in parts], axis=-2),
        msb=(jnp.concatenate([p.msb for p in parts], axis=-2)
             if with_msb else None),
        scale=jnp.concatenate([p.scale for p in parts], axis=-1))


def make_kv_mesh(n: int) -> Mesh:
    import numpy as np
    devs = np.asarray(jax.devices()[:n]).reshape(n)
    return Mesh(devs, ("kv",))


def reference_decode(q, k, v, lengths, sm_scale=1.0) -> jax.Array:
    """Unsharded oracle for tests."""
    scores = jnp.einsum("bhd,bhcd->bhc", q, k) * sm_scale
    valid = jnp.arange(k.shape[-2])[None, None, :] < lengths[:, None, None]
    scores = jnp.where(valid, scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(valid, p, 0.0)
    return jnp.einsum("bhc,bhcd->bhd", p, v)
