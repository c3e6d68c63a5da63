"""Fused decode kernel (append + attention + P·V) vs the jnp reference.

The fused kernel appends the new token's K/V row in-kernel, so the
reference computation is: `append_tokens` (the XLA path) followed by
`spatten_attention_reference` over the appended cache.  Cache planes must
match the XLA append bit-exactly (same quantize semantics).

The kernel computes no RoPE (queries arrive rotated; keys cached-rotated
or abs-pos), so every comparison runs the reference with use_rope=False —
cached-mode end-to-end rotation correctness is covered by
test_rope_cached_mode.py and the engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.engine import kv_cache as kvc
from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops import rope as rope_ops
from spatten_tpu.ops.attention_ref import spatten_attention_reference
from spatten_tpu.ops.fused_decode import _kth_largest, fused_decode_attention


def make_inputs(key, b=2, hq=4, hkv=2, cap=64, d=32, length=50):
    """`length` counts the valid tokens INCLUDING the row to append."""
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, cap, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, cap, d), jnp.float32)
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d), jnp.float32)
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d), jnp.float32)
    kq, vq = qz.quantize(k), qz.quantize(v)
    cos, sin = rope_ops.rope_table(cap, d)
    if np.ndim(length) == 0:
        lengths = jnp.full((b,), length, jnp.int32)
    else:
        lengths = jnp.asarray(length, jnp.int32)
    return q, kq, vq, k_new, v_new, cos, sin, lengths


def run_both(key, *, sm_scale=0.18, requant_threshold=0.0,
             quant_enabled=True, v_keep=0, v_block_size=16,
             head_mask=None, importance_kind="prob",
             quantize_queries=False, importance_in=None,
             track_importance=True, _bpp_override=None, **mk):
    q, kq, vq, k_new, v_new, cos, sin, lengths = make_inputs(key, **mk)
    kwargs = dict(
        sm_scale=sm_scale, requant_threshold=requant_threshold,
        quant_enabled=quant_enabled, v_keep=v_keep,
        v_block_size=v_block_size, head_mask=head_mask,
        importance_kind=importance_kind,
    )
    # reference: XLA append, then attend over the appended cache
    cache = kvc.LayerKVCache(k=kq, v=vq)
    cache_ref = kvc.append_tokens(cache, k_new, v_new, lengths - 1)
    q_pos = lengths[:, None] - 1
    ref_out, ref_stats = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, lengths, q_pos,
        use_rope=False, **kwargs)

    ker_out, ker_stats, k2, v2 = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths,
        quantize_queries=quantize_queries, importance_in=importance_in,
        track_importance=track_importance, interpret=True,
        _bpp_override=_bpp_override, **kwargs)
    return (ref_out, ref_stats, cache_ref), (ker_out, ker_stats,
                                             kvc.LayerKVCache(k=k2, v=v2))


def assert_planes_match(cache_ref, cache_ker, lengths, check_msb=True):
    """Valid rows (and scales) of every plane must match the XLA append.

    `check_msb=False` for dense mode: the kernel documents the packed
    nibble planes as unmaintained when quantization is off (they are
    never read, so their append RMW is skipped)."""
    ln = np.asarray(lengths)
    for name in ("k", "v"):
        qref = getattr(cache_ref, name)
        qker = getattr(cache_ker, name)
        for b in range(ln.shape[0]):
            L = int(ln[b])
            np.testing.assert_array_equal(
                np.asarray(qker.full)[b, :L], np.asarray(qref.full)[b, :L],
                err_msg=f"{name}.full row mismatch (b={b})")
            np.testing.assert_allclose(
                np.asarray(qker.scale)[b, :, :L],
                np.asarray(qref.scale)[b, :, :L], rtol=1e-6,
                err_msg=f"{name}.scale mismatch (b={b})")
            if not check_msb:
                continue
            # packed plane: check the nibbles of all valid tokens
            ref4 = np.asarray(qz.unpack_msb(qref.msb))[b, :L]
            ker4 = np.asarray(qz.unpack_msb(qker.msb))[b, :L]
            np.testing.assert_array_equal(ker4, ref4,
                                          err_msg=f"{name}.msb (b={b})")


def assert_match(ref, ker, lengths=None, atol=2e-5, check_msb=True):
    (ref_out, ref_stats, cache_ref) = ref
    (ker_out, ker_stats, cache_ker) = ker
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=atol, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ker_stats.max_prob),
                               np.asarray(ref_stats.max_prob),
                               atol=atol, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ker_stats.need_requant),
                                  np.asarray(ref_stats.need_requant))
    if lengths is not None:
        assert_planes_match(cache_ref, cache_ker, lengths,
                            check_msb=check_msb)


def test_kth_largest_matches_topk():
    for k in (1, 3, 7):
        x = jax.random.normal(jax.random.PRNGKey(k), (16,))
        got = _kth_largest(x, k)
        want = jax.lax.top_k(x, k)[0][-1]
        assert float(got) == pytest.approx(float(want))
    # duplicates
    x = jnp.array([3.0, 1.0, 3.0, 2.0])
    assert float(_kth_largest(x, 2)) == 3.0
    assert float(_kth_largest(x, 3)) == 2.0


def test_fused_basic_and_planes():
    lengths = jnp.array([50, 31], jnp.int32)
    r, k = run_both(jax.random.PRNGKey(0), length=np.array([50, 31]))
    assert_match(r, k, lengths=lengths)
    np.testing.assert_allclose(np.asarray(k[1].importance_delta),
                               np.asarray(r[1].importance_delta),
                               atol=2e-5, rtol=1e-4)


def test_fused_quant_disabled_dense_mode():
    lengths = jnp.array([50, 64], jnp.int32)   # incl. a full cache
    r, k = run_both(jax.random.PRNGKey(1), quant_enabled=False,
                    length=np.array([50, 64]))
    assert_match(r, k, lengths=lengths, check_msb=False)


def test_fused_requant_fire():
    r, k = run_both(jax.random.PRNGKey(2), requant_threshold=1.1)
    assert np.asarray(k[1].need_requant).all()
    assert_match(r, k)


def test_fused_requant_mixed_vprune():
    r, k = run_both(jax.random.PRNGKey(3), requant_threshold=0.12,
                    v_keep=24, v_block_size=16, length=60)
    assert_match(r, k)


def test_fused_v_pruning_exact():
    r, k = run_both(jax.random.PRNGKey(4), v_keep=24, v_block_size=16)
    assert_match(r, k)
    np.testing.assert_allclose(np.asarray(k[0]), np.asarray(r[0]),
                               atol=2e-5, rtol=1e-4)


def test_fused_gqa_vprune():
    # group = 2: per-query-head keep decisions, union fetch
    r, k = run_both(jax.random.PRNGKey(5), hq=4, hkv=2,
                    v_keep=16, v_block_size=8)
    assert_match(r, k)


def test_fused_mha_group1():
    # MHA case: hq == hkv
    r, k = run_both(jax.random.PRNGKey(15), hq=2, hkv=2)
    assert_match(r, k)


def test_fused_head_dim_64_pair_packing():
    # two 64-dim heads share one 128-lane tile in the token-major layout
    # (the reference chip's native sizeD=64, SpAtten.scala:10-35)
    r, k = run_both(jax.random.PRNGKey(16), hq=4, hkv=4, d=64,
                    v_keep=24, v_block_size=16)
    assert_match(r, k)


def test_fused_presoftmax_importance():
    r, k = run_both(jax.random.PRNGKey(17), importance_kind="presoftmax")
    assert_match(r, k)
    np.testing.assert_allclose(np.asarray(k[1].importance_delta),
                               np.asarray(r[1].importance_delta),
                               atol=2e-4, rtol=1e-4)


def test_fused_head_mask_dead_head():
    hm = jnp.array([True, False, True, True])
    lengths = jnp.array([50, 50], jnp.int32)
    r, k = run_both(jax.random.PRNGKey(6), head_mask=hm,
                    length=np.array([50, 50]))
    # dead heads still append (cache must stay correct for later revival)
    assert_match(r, k, lengths=lengths)


def test_fused_full_pipeline():
    r, k = run_both(jax.random.PRNGKey(18), requant_threshold=0.15,
                    v_keep=24, v_block_size=16,
                    head_mask=jnp.array([True, True, False, True]))
    assert_match(r, k)


def test_fused_int8_queries():
    q, kq, vq, k_new, v_new, cos, sin, lengths = make_inputs(
        jax.random.PRNGKey(7))
    kwargs = dict(sm_scale=0.18, requant_threshold=0.0, quant_enabled=True,
                  v_keep=0, v_block_size=16)
    cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                  k_new, v_new, lengths - 1)
    ref_out, _ = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, lengths,
        lengths[:, None] - 1, use_rope=False, **kwargs)
    got_out, _, _, _ = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths,
        quantize_queries=True, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=0.03, rtol=0.05)


def test_fused_int8_queries_full_pipeline():
    q, kq, vq, k_new, v_new, cos, sin, lengths = make_inputs(
        jax.random.PRNGKey(12))
    kwargs = dict(sm_scale=0.18, requant_threshold=0.3, quant_enabled=True,
                  v_keep=24, v_block_size=16)
    cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                  k_new, v_new, lengths - 1)
    ref_out, _ = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, lengths,
        lengths[:, None] - 1, use_rope=False, **kwargs)
    got_out, _, _, _ = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths,
        quantize_queries=True, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=0.05, rtol=0.1)


def test_fused_per_layer_v_keep():
    """Per-layer value budgets (the reference's per-request
    value_fetch_num, CSV col 12): the stacked kernel with a budget tuple
    must match the reference evaluated with each layer's scalar."""
    L = 2
    vks = (24, 8)
    keys = jax.random.split(jax.random.PRNGKey(31), L)
    per_layer = [make_inputs(k, b=1, hq=4, hkv=2, cap=64, d=32,
                             length=[60]) for k in keys]
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    kq_all = stack([p[1] for p in per_layer])
    vq_all = stack([p[2] for p in per_layer])
    for li in range(L):
        q, kq, vq, k_new, v_new, cos, sin, lengths = per_layer[li]
        cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                      k_new, v_new, lengths - 1)
        ref_out, _ = spatten_attention_reference(
            q, cache_ref.k, cache_ref.v, cos, sin, lengths,
            lengths[:, None] - 1, use_rope=False, sm_scale=0.18,
            v_keep=vks[li], v_block_size=16)
        # traced-scalar jnp path must agree with the static-int path
        ref_out_t, _ = spatten_attention_reference(
            q, cache_ref.k, cache_ref.v, cos, sin, lengths,
            lengths[:, None] - 1, use_rope=False, sm_scale=0.18,
            v_keep=jnp.int32(vks[li]), v_block_size=16)
        np.testing.assert_allclose(np.asarray(ref_out_t),
                                   np.asarray(ref_out), atol=1e-6)
        out, _, kq_all, vq_all = fused_decode_attention(
            q, kq_all, vq_all, k_new, v_new, lengths, sm_scale=0.18,
            v_keep=vks, v_block_size=16, layer=jnp.int32(li),
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("quant", [True, False])
def test_fused_pv_int8_close_to_f32(quant):
    """Integer-MXU P·V (8-bit prob*vscale weights on stored int8 V) must
    track the f32-accumulation kernel within the 8-bit weight step."""
    q, kq, vq, k_new, v_new, cos, sin, lengths = make_inputs(
        jax.random.PRNGKey(21))
    kwargs = dict(sm_scale=0.18,
                  requant_threshold=0.15 if quant else 0.0,
                  quant_enabled=quant, v_keep=24, v_block_size=16,
                  quantize_queries=True, interpret=True)
    out_f, _, _, _ = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths, **kwargs)
    out_i, _, _, _ = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths, pv_int8=True, **kwargs)
    f = np.asarray(out_f)
    err = np.abs(np.asarray(out_i) - f)
    # error budget: one 8-bit weight step per live token, |v8| <= 127
    assert float(err.max()) <= 0.08 * max(1.0, float(np.abs(f).max())), \
        (err.max(), np.abs(f).max())


def test_fused_importance_accumulate_in_place():
    b, hkv, cap = 2, 2, 64
    imp0 = jax.random.uniform(jax.random.PRNGKey(8), (b, hkv, cap))
    r, k = run_both(jax.random.PRNGKey(9), importance_in=imp0, length=50)
    # the kernel resets the appended slot then accumulates
    lengths = np.full((b,), 50)
    want = np.asarray(imp0).copy()
    for bb in range(b):
        want[bb, :, lengths[bb] - 1] = 0.0
    want = want + np.asarray(r[1].importance_delta)
    np.testing.assert_allclose(np.asarray(k[1].importance_delta), want,
                               atol=2e-5, rtol=1e-4)


def test_fused_accumulate_dead_head_carries_through():
    b, hkv, cap = 2, 2, 64
    imp0 = jax.random.uniform(jax.random.PRNGKey(13), (b, hkv, cap))
    hm = jnp.array([False, False, True, True])   # kv head 0 fully dead
    _, k = run_both(jax.random.PRNGKey(14), importance_in=imp0,
                    head_mask=hm, length=50)
    got = np.asarray(k[1].importance_delta)
    # dead group: accumulator unchanged
    np.testing.assert_allclose(got[:, 0], np.asarray(imp0)[:, 0],
                               atol=1e-6)
    # live group: changed (delta added)
    assert not np.allclose(got[:, 1], np.asarray(imp0)[:, 1])


def test_fused_track_importance_off():
    r, k = run_both(jax.random.PRNGKey(10), track_importance=False,
                    quant_enabled=False)
    (ref_out, _, _), (ker_out, ker_stats, _) = r, k
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-4)
    assert not np.asarray(ker_stats.importance_delta).any()


def test_fused_tiny_length():
    # appending into a nearly-empty cache (idx = 0 / low slots)
    lengths = jnp.array([1, 2], jnp.int32)
    r, k = run_both(jax.random.PRNGKey(11), length=np.array([1, 2]))
    assert_match(r, k, lengths=lengths)


def test_stacked_layer_mode_matches_per_layer_calls():
    """Stacked mode (layer scalar + [L, ...] planes updated in place) must
    equal independent per-layer calls, and must not touch other layers."""
    L = 3
    keys = jax.random.split(jax.random.PRNGKey(11), L)
    per_layer = [make_inputs(k, b=2, hq=4, hkv=2, cap=64, d=32,
                             length=[40, 50]) for k in keys]

    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    kq_all = stack([p[1] for p in per_layer])     # leaves [L, ...]
    vq_all = stack([p[2] for p in per_layer])
    imp_all = jnp.zeros((L, 2, 2, 64), jnp.float32)

    kwargs = dict(sm_scale=0.18, requant_threshold=0.3,
                  quant_enabled=True, v_keep=24, v_block_size=16,
                  quantize_queries=True, track_importance=True,
                  interpret=True)

    # reference: unstacked per-layer calls
    refs = []
    for li, (q, kq, vq, k_new, v_new, _, _, lengths) in enumerate(per_layer):
        refs.append(fused_decode_attention(
            q, kq, vq, k_new, v_new, lengths,
            importance_in=imp_all[li], **kwargs))

    # stacked: only layer 1 updated
    li = 1
    q, _, _, k_new, v_new, _, _, lengths = per_layer[li]
    out, stats, k2, v2 = fused_decode_attention(
        q, kq_all, vq_all, k_new, v_new, lengths,
        importance_in=imp_all, layer=jnp.int32(li), **kwargs)

    ref_out, ref_stats, ref_k2, ref_v2 = refs[li]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.max_prob),
                               np.asarray(ref_stats.max_prob),
                               atol=2e-5, rtol=1e-4)
    # layer li's planes match the per-layer call; other layers untouched
    for name in ("full", "msb", "scale"):
        got_k = np.asarray(getattr(k2, name))
        got_v = np.asarray(getattr(v2, name))
        np.testing.assert_array_equal(
            got_k[li], np.asarray(getattr(ref_k2, name)))
        np.testing.assert_array_equal(
            got_v[li], np.asarray(getattr(ref_v2, name)))
        for other in (0, 2):
            np.testing.assert_array_equal(
                got_k[other], np.asarray(getattr(kq_all, name))[other])
            np.testing.assert_array_equal(
                got_v[other], np.asarray(getattr(vq_all, name))[other])
    # importance: layer li updated, others untouched
    imp = np.asarray(stats.importance_delta)
    np.testing.assert_allclose(imp[li],
                               np.asarray(refs[li][1].importance_delta),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(imp[0], np.zeros_like(imp[0]))


# ---------------------------------------------------------------------------
# Batch-grouped programs (bpp > 1): one grid instance serves bpp batch
# rows; every stream DMA moves the whole group in one descriptor.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bpp", [2, 4])
def test_fused_batch_group_full_pipeline(bpp):
    """bpp members with DIFFERENT lengths through the full pipeline
    (requant + V-prune) must match the reference; rows of short members
    past their own length must not leak.  The quantized-query variant is
    compared against its own bpp=1 kernel run instead (the jnp reference
    keeps f32 queries, so only loose comparisons are meaningful there —
    see test_fused_int8_queries)."""
    lengths = np.array([50, 31, 64, 7])
    r, k = run_both(jax.random.PRNGKey(21), b=4, length=lengths,
                    requant_threshold=0.6, v_keep=24, v_block_size=16,
                    _bpp_override=bpp)
    assert_match(r, k, lengths=jnp.asarray(lengths, jnp.int32))
    # int8-query path: batch grouping must not change the numerics
    qq = dict(requant_threshold=0.6, v_keep=24, v_block_size=16,
              quantize_queries=True)
    _, k1 = run_both(jax.random.PRNGKey(21), b=4, length=lengths,
                     _bpp_override=1, **qq)
    _, kb = run_both(jax.random.PRNGKey(21), b=4, length=lengths,
                     _bpp_override=bpp, **qq)
    np.testing.assert_allclose(np.asarray(kb[0]), np.asarray(k1[0]),
                               atol=1e-6, rtol=1e-6)


def test_fused_batch_group_gqa_head_mask():
    hm = jnp.asarray([1.0, 1.0, 0.0, 1.0])          # head 1 of hkv=2 dead
    lengths = np.array([40, 12])
    r, k = run_both(jax.random.PRNGKey(22), b=2, hq=4, hkv=2,
                    length=lengths, head_mask=hm, v_keep=16,
                    _bpp_override=2)
    assert_match(r, k, lengths=jnp.asarray(lengths, jnp.int32))


def test_fused_batch_group_dense_mode():
    lengths = np.array([60, 3])
    r, k = run_both(jax.random.PRNGKey(23), b=2, length=lengths,
                    quant_enabled=False, _bpp_override=2)
    assert_match(r, k, lengths=jnp.asarray(lengths, jnp.int32),
                 check_msb=False)


def test_fused_batch_group_importance_accumulate():
    import spatten_tpu.engine.kv_cache as kvc_mod
    b, hkv, cap = 4, 2, 64
    imp0 = jax.random.uniform(jax.random.PRNGKey(3), (b, hkv, cap))
    lengths = np.array([50, 31, 20, 44])
    r, k = run_both(jax.random.PRNGKey(24), b=b, hkv=hkv, cap=cap,
                    length=lengths, importance_in=imp0,
                    _bpp_override=4)
    # reference accumulates: imp' = imp0 (appended col zeroed) + delta
    (ref_out, ref_stats, _), (ker_out, ker_stats, _) = r, k
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-4)
    idxs = lengths - 1
    imp0_np = np.asarray(imp0).copy()
    for bi in range(b):
        imp0_np[bi, :, idxs[bi]] = 0.0
    want = imp0_np + np.asarray(ref_stats.importance_delta)
    np.testing.assert_allclose(np.asarray(ker_stats.importance_delta),
                               want, atol=2e-5, rtol=1e-4)


def test_fused_batch_group_auto_selection():
    """_batches_per_program picks >1 for small caps and divides batch."""
    from spatten_tpu.ops.fused_decode import _batches_per_program
    bpp = _batches_per_program(
        16, 4, 128, 1, 4096, quant_on=True, need_kfull=True,
        need_scores2=True, has_lsb2=False, do_vprune=True, v_block=64,
        sc_bytes=4, imp_bytes=4, track_imp=True)
    assert bpp > 1 and 16 % bpp == 0
    # huge cap still returns a valid (possibly 1) group size
    bpp2 = _batches_per_program(
        32, 4, 128, 1, 32768, quant_on=True, need_kfull=True,
        need_scores2=True, has_lsb2=False, do_vprune=True, v_block=256,
        sc_bytes=4, imp_bytes=2, track_imp=True)
    assert bpp2 >= 1 and 32 % bpp2 == 0


def test_fused_batch_group_respects_requant_bit_budget():
    """Auto bpp selection must honor the requant fire-count packing
    constraint (ngate * bit_length(bpp*gate_hpg) <= 22) — regression:
    hkv=8, d=128, cap=512, batch=8 with requant auto-picked bpp=4
    (8 gates * 3 bits = 24 > 22) and crashed the kernel assert."""
    from spatten_tpu.ops.fused_decode import _batches_per_program
    bpp = _batches_per_program(
        8, 8, 128, 1, 512, quant_on=True, need_kfull=True,
        need_scores2=True, has_lsb2=False, do_vprune=False, v_block=16,
        sc_bytes=4, imp_bytes=4, track_imp=True)
    assert 8 * (bpp * 1).bit_length() <= 22
    # and the end-to-end call no longer crashes
    q, kq, vq, k_new, v_new, cos, sin, lengths = make_inputs(
        jax.random.PRNGKey(33), b=8, hq=8, hkv=8, cap=512, d=128,
        length=[100, 31, 64, 7, 400, 12, 256, 1])
    out, _, _, _ = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths, sm_scale=0.1,
        requant_threshold=0.5, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_chunked_metadata_path():
    """cap >= 256 makes pblk a lane-aligned DMA slice, activating the
    chunked + length-gated scale/importance streams (round 4).  Varied
    lengths leave dead chunks unfetched; numerics must be unchanged and
    the importance accumulator's live prefix must still round-trip."""
    b, hkv, cap = 2, 2, 256
    imp0 = jax.random.uniform(jax.random.PRNGKey(40), (b, hkv, cap))
    lengths = np.array([200, 37])
    r, k = run_both(jax.random.PRNGKey(41), b=b, hkv=hkv, cap=cap,
                    length=lengths, importance_in=imp0,
                    requant_threshold=0.3, v_keep=64, v_block_size=16,
                    _bpp_override=2)
    (ref_out, ref_stats, cache_ref), (ker_out, ker_stats, cache_ker) = r, k
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-4)
    assert_planes_match(cache_ref, cache_ker,
                        jnp.asarray(lengths, jnp.int32))
    # live prefix of the accumulator: imp0 (appended col zeroed) + delta
    got = np.asarray(ker_stats.importance_delta)
    want = np.asarray(imp0).copy()
    for bi in range(b):
        want[bi, :, lengths[bi] - 1] = 0.0
    want = want + np.asarray(ref_stats.importance_delta)
    for bi in range(b):
        L = int(lengths[bi])
        np.testing.assert_allclose(got[bi, :, :L], want[bi, :, :L],
                                   atol=2e-5, rtol=1e-4)


def test_fused_v_gate_two_word_bitmask():
    """nfb > 24 V fetch blocks (cap 8192, fblk 256 -> 32 gates) pack
    into TWO bitmask words; gating must stay exact (round 4)."""
    from spatten_tpu.ops.fused_decode import _fetch_block
    assert _fetch_block(8192, 64) == 256           # 32 blocks > 24
    r, k = run_both(jax.random.PRNGKey(50), b=1, hq=2, hkv=2, cap=8192,
                    d=32, length=[7000], v_keep=1024, v_block_size=64)
    assert_match(r, k)


def test_fused_probs_bf16_close_to_f32():
    """bf16 e-plane: tracks the f32 kernel within the bf16 mantissa step
    (the e plane only feeds P·V weights / mass ranking / importance)."""
    q, kq, vq, k_new, v_new, cos, sin, lengths = make_inputs(
        jax.random.PRNGKey(60))
    kwargs = dict(sm_scale=0.18, requant_threshold=0.15,
                  quant_enabled=True, v_keep=24, v_block_size=16,
                  interpret=True)
    out_f, sf, _, _ = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths, **kwargs)
    out_b, sb, _, _ = fused_decode_attention(
        q, kq, vq, k_new, v_new, lengths, probs_bf16=True, **kwargs)
    f = np.asarray(out_f)
    err = np.abs(np.asarray(out_b) - f)
    assert float(err.max()) <= 0.02 * max(1.0, float(np.abs(f).max()))
    np.testing.assert_array_equal(np.asarray(sb.need_requant),
                                  np.asarray(sf.need_requant))
