"""Pallas decode-attention kernel vs the jnp reference (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops import rope as rope_ops
from spatten_tpu.ops.attention_ref import spatten_attention_reference
from spatten_tpu.ops.decode_attention import decode_attention, _kth_largest


def make_inputs(key, b=2, hq=4, hkv=2, cap=64, d=32, length=50):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, cap, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, cap, d), jnp.float32)
    kq, vq = qz.quantize(k), qz.quantize(v)
    cos, sin = rope_ops.rope_table(cap, d)
    lengths = jnp.full((b,), length, jnp.int32)
    q_positions = lengths[:, None] - 1
    return q, kq, vq, cos, sin, lengths, q_positions


def run_both(key, *, sm_scale=0.18, requant_threshold=0.0,
             quant_enabled=True, v_keep=0, v_block_size=16,
             head_mask=None, importance_kind="prob", use_rope=True, **mk):
    q, kq, vq, cos, sin, lengths, q_pos = make_inputs(key, **mk)
    kwargs = dict(
        sm_scale=sm_scale, requant_threshold=requant_threshold,
        quant_enabled=quant_enabled, v_keep=v_keep,
        v_block_size=v_block_size, head_mask=head_mask,
        importance_kind=importance_kind, use_rope=use_rope,
    )
    ref_out, ref_stats = spatten_attention_reference(
        q, kq, vq, cos, sin, lengths, q_pos, **kwargs)
    ker_out, ker_stats = decode_attention(
        q, kq, vq, cos, sin, lengths, interpret=True, **kwargs)
    return (ref_out, ref_stats), (ker_out, ker_stats)


def assert_match(ref, ker, atol=2e-5):
    (ref_out, ref_stats), (ker_out, ker_stats) = ref, ker
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=atol, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ker_stats.max_prob),
                               np.asarray(ref_stats.max_prob),
                               atol=atol, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ker_stats.need_requant),
                                  np.asarray(ref_stats.need_requant))
    np.testing.assert_allclose(np.asarray(ker_stats.importance_delta),
                               np.asarray(ref_stats.importance_delta),
                               atol=atol, rtol=1e-4)


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


def test_kernel_msb_plane_basic():
    r, k = run_both(jax.random.PRNGKey(0))
    assert_match(r, k)


def test_kernel_quant_disabled():
    r, k = run_both(jax.random.PRNGKey(1), quant_enabled=False)
    assert_match(r, k)


def test_kernel_requant_path():
    # high threshold => every program requantizes (full-plane recompute)
    r, k = run_both(jax.random.PRNGKey(2), requant_threshold=1.1)
    (_, ref_stats), (_, ker_stats) = r, k
    assert np.asarray(ker_stats.need_requant).all()
    assert_match(r, k)


def test_kernel_requant_mixed():
    # mid threshold => some programs requantize, some don't
    r, k = run_both(jax.random.PRNGKey(3), requant_threshold=0.12, length=60)
    need = np.asarray(k[1].need_requant)
    assert_match(r, k)


def test_kernel_v_pruning():
    r, k = run_both(jax.random.PRNGKey(4), v_keep=24, v_block_size=16)
    assert_match(r, k)


def test_kernel_head_mask():
    hm = jnp.array([True, False, True, True])
    r, k = run_both(jax.random.PRNGKey(5), head_mask=hm)
    assert_match(r, k)


def test_kernel_presoftmax_importance():
    r, k = run_both(jax.random.PRNGKey(6), importance_kind="presoftmax")
    assert_match(r, k)


def test_kernel_full_pipeline():
    r, k = run_both(jax.random.PRNGKey(7), requant_threshold=0.15,
                    v_keep=24, v_block_size=16,
                    head_mask=jnp.array([True, True, False, True]))
    assert_match(r, k)


def test_kernel_gqa_group1():
    # MHA case: hq == hkv
    r, k = run_both(jax.random.PRNGKey(8), hq=2, hkv=2)
    assert_match(r, k)


def test_kernel_no_rope_folded_epilogue():
    # use_rope=False exercises the folded dequant epilogue (cached-rotated
    # K mode and the GPT-2 family)
    r, k = run_both(jax.random.PRNGKey(9), use_rope=False,
                    requant_threshold=0.12, v_keep=24, v_block_size=16)
    assert_match(r, k, atol=5e-5)


def test_kernel_no_rope_quant_off():
    r, k = run_both(jax.random.PRNGKey(10), use_rope=False,
                    quant_enabled=False)
    assert_match(r, k, atol=5e-5)


def test_kernel_int8_queries_close():
    """quantize_queries: int8 queries + integer MXU dots — approximates
    the f32-query reference within query-quantization noise (the HW
    computes on fixed-point queries, SpAtten.scala:94-120)."""
    q, kq, vq, cos, sin, lengths, q_pos = make_inputs(jax.random.PRNGKey(11))
    kwargs = dict(sm_scale=0.18, requant_threshold=0.0, quant_enabled=True,
                  v_keep=0, v_block_size=16, use_rope=False)
    ref_out, _ = spatten_attention_reference(
        q, kq, vq, cos, sin, lengths, q_pos, **kwargs)
    got_out, _ = decode_attention(
        q, kq, vq, cos, sin, lengths, quantize_queries=True,
        interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=0.03, rtol=0.05)


def test_kernel_int8_queries_full_pipeline():
    q, kq, vq, cos, sin, lengths, q_pos = make_inputs(jax.random.PRNGKey(12))
    kwargs = dict(sm_scale=0.18, requant_threshold=0.3, quant_enabled=True,
                  v_keep=24, v_block_size=16, use_rope=False)
    ref_out, _ = spatten_attention_reference(
        q, kq, vq, cos, sin, lengths, q_pos, **kwargs)
    got_out, _ = decode_attention(
        q, kq, vq, cos, sin, lengths, quantize_queries=True,
        interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=0.05, rtol=0.1)
