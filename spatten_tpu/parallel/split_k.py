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
    k_new: jax.Array,          # [B, Hkv, 1, D] — appended by the shard
    v_new: jax.Array,          #   owning the tail slot
    local_lengths: jax.Array,  # int32 [n, B] live tokens per shard; the
                               #   owner's count INCLUDES the new token
    mesh: Mesh,
    axis: str = "kv",
    sm_scale: float = 1.0,
    importance_in=None,        # [B, Hkv, n*Cl] token-axis-sharded cascade
                               #   accumulator, updated EXACTLY (globally-
                               #   normalized probabilities) when group==1
    importance_ema: float = 1.0,
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
    token.  The appending shard is derived per sequence from the global
    length (slot ``glob-1`` lands in shard ``(glob-1)//Cl``), so a decode
    loop crosses shard boundaries without retracing.

    SpAtten telemetry (SURVEY §2.9 SP/CP):
    * ``importance_in`` accumulates the EXACT globally-normalized
      probability mass per token: each shard's kernel returns its local
      delta (e / den_local) and the recombination weight rescales it by
      ``den_local * exp(m_local - m_glob) / den_glob`` before the add.
      Exact for MHA directly; under GQA the kernel emits per-query-row
      deltas (``per_row_importance``) so each group member rescales by
      its own flash weight before the group sum — exact for any group
      size (reference semantics: kv_cache_token_pruning.py:51 sums the
      full softmax probabilities over all query heads of the group).
    * requant telemetry (max_prob / need_requant) returns per shard,
      stacked [n, B, Hkv] — shard-local confidence domains.

    Returns (out [B,Hq,1,D], k', v', imp', maxp [n,B,Hkv],
    need [n,B,Hkv]); imp' is None when importance_in is None.
    """
    n = mesh.shape[axis]
    cl = k_quant.tokens // n
    hq = q.shape[1]
    hkv = k_quant.heads
    group = hq // hkv
    track_imp = importance_in is not None

    def shard_fn(q, kq, vq, k_new, v_new, lens_all, imp_l):
        sid = jax.lax.axis_index(axis)
        glob = jnp.sum(lens_all, axis=0)                # [B] incl. new
        appm = ((glob - 1) // cl) == sid                # [B]
        lens_l = lens_all[sid]                          # [B]
        out, stats, k2, v2, (m, den) = fused_decode_attention(
            q, kq, vq, k_new, v_new, lens_l,
            sm_scale=sm_scale, append_mask=appm, return_row_stats=True,
            track_importance=track_imp, importance_ema=1.0,
            per_row_importance=(group > 1), interpret=interpret,
            **spatten_kwargs)
        m_g = jax.lax.pmax(m, axis)                     # [B, Hq]
        w = jnp.exp(m - m_g) * den
        num = jax.lax.psum(out * w[:, :, None, None], axis)
        den_g = jax.lax.psum(w, axis)
        out_g = num / jnp.maximum(den_g, 1e-30)[:, :, None, None]
        if track_imp:
            # delta_local = e / den_local per token; the exact global
            # probability is e * exp(m - m_g) / den_g — the per-row
            # rescale is delta_local * w / den_g.  Under GQA the kernel
            # emits PER-QUERY-ROW deltas (per_row_importance), so each
            # group member rescales by ITS OWN flash weight before the
            # group sum — exact for any group size
            # (kv_cache_token_pruning.py:51 sums full softmax probs).
            corr = (w / jnp.maximum(den_g, 1e-30))[:, :, None]
            if group == 1:
                delta = stats.importance_delta * corr   # [B, Hkv, Cl]
            else:
                rows = stats.importance_delta * corr    # [B, Hq, Cl]
                delta = rows.reshape(rows.shape[0], hkv, group,
                                     rows.shape[-1]).sum(axis=2)
            prev = imp_l.astype(jnp.float32)
            if importance_ema != 1.0:
                prev = prev * importance_ema
            # the appended column starts a fresh accumulator row
            col = sid * cl + jnp.arange(cl)[None, None, :]
            appcol = (col == (glob - 1)[:, None, None]) \
                & appm[:, None, None]
            prev = jnp.where(appcol, 0.0, prev)
            imp2 = (prev + delta).astype(imp_l.dtype)
        else:
            imp2 = imp_l
        maxp = stats.max_prob[None]                     # [1, B, Hkv]
        need = stats.need_requant[None].astype(jnp.int32)
        return out_g, k2, v2, imp2, maxp, need

    ks = _kv_specs(k_quant, axis)
    vs = _kv_specs(v_quant, axis)
    imp_arg = (importance_in if track_imp
               else jnp.zeros((q.shape[0], hkv, n * cl), jnp.float32))
    out_g, k2, v2, imp2, maxp, need = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), ks, vs, P(), P(), P(), P(None, None, axis)),
        out_specs=(P(), ks, vs, P(None, None, axis),
                   P(axis, None, None), P(axis, None, None)),
        check_vma=False,
    ))(q, k_quant, v_quant, k_new, v_new, local_lengths, imp_arg)
    return out_g, k2, v2, (imp2 if track_imp else None), maxp, need


def split_k_prune(
    k_quant: qz.QuantizedKV,   # planes [B, n*Cl(/2), Hkv*D] token-sharded
    v_quant: qz.QuantizedKV,
    importance: jax.Array,     # [B, Hkv, n*Cl] token-axis sharded
    local_lengths: jax.Array,  # int32 [n, B]
    mesh: Mesh,
    axis: str = "kv",
    *,
    start_size: int,
    important_size: int,
    recent_size: int,
    rotate_k: bool = False,    # cached-rope mode: re-rotate moved keys
    rope_theta: float = 10000.0,
    trigger=None,              # bool [B]: sequences to prune (None =
                               #   all).  Untriggered sequences use
                               #   identity indices (bit-exact rewrite)
                               #   and keep their live lengths.
):
    """Cascade token pruning over a kv-sharded cache (SURVEY §2.9).

    Selection is GLOBAL (per-head top-k over the full token axis — the
    importance plane is the smallest, so GSPMD's implicit all-gather of
    it is cheap); compaction is a gather along the sharded token axis
    (GSPMD inserts the cross-shard collectives), after which the kept
    tokens sit contiguously from global slot 0 — shard i holds slots
    [i*Cl, (i+1)*Cl) as before, so the ``global slot = sid*Cl + col``
    invariant and the owner-derivation in ``split_k_decode_fused`` keep
    working.  The packed nibble planes re-pack SHARD-LOCALLY afterwards
    (each shard's msb layout is pack_unit(Cl)-blocked).

    Returns (k', v', imp', local_lengths') with keep_total =
    start + important + recent live tokens.
    """
    from spatten_tpu.pruning import token_pruning

    n = mesh.shape[axis]
    b, cap, f = k_quant.full.shape
    hkv = k_quant.heads
    d = f // hkv
    cl = cap // n
    glob_lengths = jnp.sum(local_lengths, axis=0)         # [B]
    keep_total = start_size + important_size + recent_size
    if trigger is None:
        trigger = jnp.ones((b,), bool)
    trigger = jnp.asarray(trigger, bool)

    keep_idx = token_pruning.select_keep_indices(
        importance.astype(jnp.float32), glob_lengths[:, None],
        start_size, important_size, recent_size, 0)       # [B, Hkv, keep]
    # untriggered sequences rewrite identically (the selection formula
    # is only meaningful when length + num_coming > keep_total —
    # select_keep_indices' documented caller contract)
    ident = jnp.broadcast_to(
        jnp.arange(keep_total, dtype=jnp.int32), keep_idx.shape)
    keep_idx = jnp.where(trigger[:, None, None], keep_idx, ident)

    def gather_tm(full):
        """Gather kept rows of a token-major plane, zero-pad to cap."""
        full4 = full.reshape(b, cap, hkv, d)
        idx_t = keep_idx.transpose(0, 2, 1)               # [B, keep, Hkv]
        g = jnp.take_along_axis(full4, idx_t[..., None], axis=1)
        g = g.reshape(b, keep_total, f)
        pad = jnp.zeros((b, cap - keep_total, f), full.dtype)
        return jnp.concatenate([g, pad], axis=1), g

    kf_new, kg = gather_tm(k_quant.full)
    ksc_g = jnp.take_along_axis(k_quant.scale, keep_idx, axis=-1)
    if rotate_k:
        # moved rows (delta < 0) re-rotate by their slot delta and
        # requantize; unmoved rows stay bit-exact (shared helper with
        # the unsharded fused compaction — pruning/compact.py)
        from spatten_tpu.pruning.compact import rotate_moved_rows
        new_slot = jnp.arange(keep_total, dtype=jnp.int32)
        delta = jnp.minimum(new_slot[None, None, :] - keep_idx, 0)
        d_t = delta.transpose(0, 2, 1)                    # [B, keep, Hkv]
        kg4, sc_t = rotate_moved_rows(
            kg.reshape(b, keep_total, hkv, d),
            ksc_g.transpose(0, 2, 1), d_t, d, rope_theta)
        kg = kg4.reshape(b, keep_total, f)
        ksc_g = sc_t.transpose(0, 2, 1).astype(ksc_g.dtype)
        pad = jnp.zeros((b, cap - keep_total, f), jnp.int8)
        kf_new = jnp.concatenate([kg, pad], axis=1)
    vf_new, _ = gather_tm(v_quant.full)
    vsc_g = jnp.take_along_axis(v_quant.scale, keep_idx, axis=-1)

    def pad_sc(g, dtype):
        pad = jnp.ones((b, hkv, cap - keep_total), dtype)
        return jnp.concatenate([g.astype(dtype), pad], axis=-1)

    ksc_new = pad_sc(ksc_g, k_quant.scale.dtype)
    vsc_new = pad_sc(vsc_g, v_quant.scale.dtype)
    imp_g = jnp.take_along_axis(importance, keep_idx, axis=-1)
    imp_new = jnp.concatenate(
        [imp_g, jnp.zeros((b, hkv, cap - keep_total), importance.dtype)],
        axis=-1)

    # shard-local nibble repack (pack_unit(Cl) layout per shard)
    def repack(full_local):
        return qz.pack_msb(full_local)

    def repack2(full_local):
        return qz.pack_lsb2(full_local)

    tok_spec = P(None, axis, None)
    kmsb_new = None if k_quant.msb is None else jax.jit(jax.shard_map(
        repack, mesh=mesh, in_specs=(tok_spec,), out_specs=tok_spec,
        check_vma=False))(kf_new)
    klsb2_new = None if k_quant.lsb2 is None else jax.jit(jax.shard_map(
        repack2, mesh=mesh, in_specs=(tok_spec,), out_specs=tok_spec,
        check_vma=False))(kf_new)
    vmsb_new = None if v_quant.msb is None else jax.jit(jax.shard_map(
        repack, mesh=mesh, in_specs=(tok_spec,), out_specs=tok_spec,
        check_vma=False))(vf_new)

    k2 = qz.QuantizedKV(full=kf_new, msb=kmsb_new, scale=ksc_new,
                        lsb2=klsb2_new)
    v2 = qz.QuantizedKV(full=vf_new, msb=vmsb_new, scale=vsc_new,
                        lsb2=None)
    # per-sequence merge: untriggered sequences keep their ORIGINAL
    # plane bytes beyond the (identity-rewritten) prefix and their live
    # lengths.  (The full-plane where costs one pass of traffic — fine
    # at CP scale; a triggered-only gather is a future optimization.)
    def merge(new, old):
        t = trigger.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(t, new, old).astype(old.dtype)

    k2 = qz.QuantizedKV(
        full=merge(k2.full, k_quant.full),
        msb=None if k2.msb is None else merge(k2.msb, k_quant.msb),
        scale=merge(k2.scale, k_quant.scale),
        lsb2=None if k2.lsb2 is None else merge(k2.lsb2, k_quant.lsb2))
    v2 = qz.QuantizedKV(
        full=merge(v2.full, v_quant.full),
        msb=None if v2.msb is None else merge(v2.msb, v_quant.msb),
        scale=merge(v2.scale, v_quant.scale), lsb2=None)
    imp_new = merge(imp_new, importance)

    shard_base = jnp.arange(n, dtype=jnp.int32)[:, None] * cl
    local2 = jnp.clip(keep_total - shard_base, 0, cl)     # [n, 1]
    local2 = jnp.broadcast_to(local2, (n, b))
    local2 = jnp.where(trigger[None, :], local2, local_lengths)
    return k2, v2, imp_new, local2


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
