"""Fused prune compaction (pruning/compact.py) vs the naive
gather + rotate_rows_by_delta path.

Contract under test (compact.py module docstring):
* moved rows (delta < 0) match the dequant->rotate->requant reference;
* unmoved rows (delta == 0) — start tokens and identity (untriggered)
  sequences — are BIT-EXACT copies (no requant round-trip);
* packed nibble planes equal a fresh pack of the compacted full plane;
* importance gathers alongside.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.engine import kv_cache as kvc
from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops import rope as rope_ops
from spatten_tpu.pruning import compact, token_pruning


def make_cache(key, b=2, h=2, cap=256, d=32, with_lsb2=False,
               v_msb=False):
    ks = jax.random.split(key, 2)
    k = jax.random.normal(ks[0], (b, h, cap, d), jnp.float32)
    v = jax.random.normal(ks[1], (b, h, cap, d), jnp.float32)
    kq = qz.quantize(k, with_lsb2=with_lsb2)
    vq = qz.quantize(v, with_msb=v_msb)
    return kvc.LayerKVCache(k=kq, v=vq)


def ref_keep(cache, imp, keep_idx, cos_t, sin_t, rotate_k):
    """Round-3 reference: gather whole planes, re-rotate EVERY kept K row
    by its clamped delta (identity rotation for unmoved rows)."""
    cap = cache.capacity
    keep = keep_idx.shape[-1]
    pruned = kvc.prune_layer(cache, jnp.concatenate(
        [keep_idx, jnp.zeros(keep_idx.shape[:-1] + (cap - keep,),
                             jnp.int32)], axis=-1))
    if rotate_k:
        new_slot = jnp.arange(keep, dtype=jnp.int32)
        zpad = jnp.zeros((cap - keep,), jnp.int32)
        delta = jnp.concatenate([new_slot, zpad]) - jnp.concatenate(
            [keep_idx, jnp.zeros(keep_idx.shape[:-1] + (cap - keep,),
                                 jnp.int32)], axis=-1)
        delta = jnp.minimum(delta, 0)
        pruned = pruned._replace(
            k=qz.rotate_rows_by_delta(pruned.k, delta, cos_t, sin_t))
    (imp_g,) = token_pruning.prune_arrays(keep_idx, imp)
    return pruned, imp_g


def run_case(key, *, rotate_k, with_lsb2=False, v_msb=False, b=2, h=2,
             cap=256, d=32, keep=96):
    cache = make_cache(key, b=b, h=h, cap=cap, d=d, with_lsb2=with_lsb2,
                       v_msb=v_msb)
    imp = jax.random.uniform(jax.random.fold_in(key, 1), (b, h, cap))
    # keep: starts + random sorted middles + a recent tail (per head)
    rng = np.random.default_rng(0)
    idx = np.zeros((b, h, keep), np.int32)
    length = cap - 10
    for bi in range(b):
        for hi in range(h):
            mid = rng.choice(np.arange(4, length - 32), keep - 4 - 32,
                             replace=False)
            idx[bi, hi] = np.concatenate(
                [np.arange(4), np.sort(mid), np.arange(length - 32, length)])
    keep_idx = jnp.asarray(idx)
    cos_t, sin_t = rope_ops.rope_table(cap, d)

    got_cache, got_imp = compact.compact_layer(
        cache, imp, keep_idx, rotate_k=rotate_k)
    want_cache, want_imp = ref_keep(cache, imp, keep_idx, cos_t, sin_t,
                                    rotate_k)
    return cache, keep_idx, (got_cache, got_imp), (want_cache, want_imp)


def check_kept(cache, keep_idx, got, want, rotate_k):
    got_cache, got_imp = got
    want_cache, want_imp = want
    keep = keep_idx.shape[-1]
    b, h = keep_idx.shape[:2]
    d = cache.k.full.shape[-1] // h
    new_slot = np.arange(keep)
    delta = new_slot[None, None] - np.asarray(keep_idx)
    moved = delta < 0                                     # [B, H, keep]

    gk = np.asarray(qz._to_head_major(got_cache.k.full, h))[:, :, :keep]
    wk = np.asarray(qz._to_head_major(want_cache.k.full, h))[:, :, :keep]
    ok = np.asarray(qz._to_head_major(cache.k.full, h))
    gsc = np.asarray(got_cache.k.scale)[:, :, :keep]
    wsc = np.asarray(want_cache.k.scale)[:, :, :keep]
    osc = np.asarray(cache.k.scale)
    oidx = np.asarray(keep_idx)
    for bi in range(b):
        for hi in range(h):
            m = moved[bi, hi]
            if rotate_k:
                # moved rows: match the rotate+requant reference
                np.testing.assert_array_equal(gk[bi, hi][m], wk[bi, hi][m])
                np.testing.assert_allclose(gsc[bi, hi][m], wsc[bi, hi][m],
                                           rtol=1e-6)
            # unmoved rows: BIT-EXACT original bytes and scales
            um = ~m
            np.testing.assert_array_equal(
                gk[bi, hi][um], ok[bi, hi][oidx[bi, hi][um]])
            np.testing.assert_array_equal(
                gsc[bi, hi][um], osc[bi, hi][oidx[bi, hi][um]])
    # V: pure gather, bit-exact everywhere
    gv = np.asarray(qz._to_head_major(got_cache.v.full, h))[:, :, :keep]
    wv = np.asarray(qz._to_head_major(want_cache.v.full, h))[:, :, :keep]
    np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(np.asarray(got_cache.v.scale)[:, :, :keep],
                                  np.asarray(want_cache.v.scale)[:, :, :keep])
    np.testing.assert_allclose(np.asarray(got_imp)[:, :, :keep],
                               np.asarray(want_imp), rtol=1e-6)
    # packed planes must equal a fresh pack of the compacted full plane
    cap = cache.capacity
    u = qz.pack_unit(cap)
    keep_pad = -(-keep // u) * u
    if got_cache.k.msb is not None:
        np.testing.assert_array_equal(
            np.asarray(got_cache.k.msb)[:, : keep_pad // 2],
            np.asarray(qz.pack_msb(got_cache.k.full))[:, : keep_pad // 2])
    if got_cache.k.lsb2 is not None:
        np.testing.assert_array_equal(
            np.asarray(got_cache.k.lsb2)[:, : keep_pad // 4],
            np.asarray(qz.pack_lsb2(got_cache.k.full))[:, : keep_pad // 4])
    if got_cache.v.msb is not None:
        np.testing.assert_array_equal(
            np.asarray(got_cache.v.msb)[:, : keep_pad // 2],
            np.asarray(qz.pack_msb(got_cache.v.full))[:, : keep_pad // 2])


def test_compact_rotated_matches_reference():
    cache, keep_idx, got, want = run_case(jax.random.PRNGKey(0),
                                          rotate_k=True)
    check_kept(cache, keep_idx, got, want, rotate_k=True)


def test_compact_no_rotation_pure_gather():
    cache, keep_idx, got, want = run_case(jax.random.PRNGKey(1),
                                          rotate_k=False)
    check_kept(cache, keep_idx, got, want, rotate_k=False)


def test_compact_lsb2_and_vmsb_planes():
    cache, keep_idx, got, want = run_case(jax.random.PRNGKey(2),
                                          rotate_k=True, with_lsb2=True,
                                          v_msb=True)
    check_kept(cache, keep_idx, got, want, rotate_k=True)


def test_compact_identity_is_bit_exact():
    """Untriggered sequences pass identity keep_idx: every plane byte in
    the rewritten prefix must be IDENTICAL (the round-3 path perturbed
    them through a dequant/requant round-trip)."""
    cache = make_cache(jax.random.PRNGKey(3))
    b, h, cap = 2, 2, cache.capacity
    imp = jax.random.uniform(jax.random.PRNGKey(4), (b, h, cap))
    keep = 96
    ident = jnp.broadcast_to(jnp.arange(keep, dtype=jnp.int32),
                             (b, h, keep))
    got_cache, got_imp = compact.compact_layer(
        cache, imp, ident, rotate_k=True)
    for name in ("full", "msb", "scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got_cache.k, name)),
            np.asarray(getattr(cache.k, name)))
        if getattr(cache.v, name) is not None:
            np.testing.assert_array_equal(
                np.asarray(getattr(got_cache.v, name)),
                np.asarray(getattr(cache.v, name)))
    np.testing.assert_array_equal(np.asarray(got_imp), np.asarray(imp))


def test_rope_cos_sin_matches_table():
    """The direct cos/sin computation must match rope_table rows to well
    under the int8 requant step (~4e-3); XLA's transcendental lowering
    may differ by ~1e-5 between fusion contexts, so not bit-exact."""
    d = 64
    cos_t, sin_t = rope_ops.rope_table(512, d)
    mag = jnp.asarray([[0, 1, 17, 300, 511]], jnp.int32)
    cc, ss = compact._rope_cos_sin(mag, d, 10000.0)
    np.testing.assert_allclose(np.asarray(cc[0]),
                               np.asarray(cos_t)[np.asarray(mag[0])],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ss[0]),
                               np.asarray(sin_t)[np.asarray(mag[0])],
                               atol=1e-4)
