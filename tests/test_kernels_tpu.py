"""Real-TPU (Mosaic-lowered) parity for the fused decode kernel.

Interpret-mode tests (test_fused_decode.py) validate semantics; these run
the ACTUAL hardware lowering — DMA streams, cross-instance prefetch,
semaphores — against the jnp reference.  Opt-in because they need the real
chip:

    SPATTEN_TPU_TESTS=1 python -m pytest tests/test_kernels_tpu.py -q

Covers the reference's native head size d=64 (SpAtten.scala:10-35 — GPT-2
family: two 64-dim heads pack into one 128-lane tile) as well as the
Llama-class d=128 shard shape.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if not os.environ.get("SPATTEN_TPU_TESTS"):
    pytest.skip("real-TPU kernel tests (SPATTEN_TPU_TESTS=1)",
                allow_module_level=True)

from spatten_tpu.engine import kv_cache as kvc
from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops import rope as rope_ops
from spatten_tpu.ops.attention_ref import spatten_attention_reference
from spatten_tpu.ops.fused_decode import fused_decode_attention


def run_hw(key, *, b=2, hq=4, hkv=4, cap=2048, d=128, length=1500,
           sm_scale=0.12, requant_threshold=0.0, quant_enabled=True,
           v_keep=0, v_block_size=64, head_mask=None,
           quantize_queries=False, v_msb=False, pv_int8=False):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, cap, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, cap, d), jnp.float32)
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d), jnp.float32)
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d), jnp.float32)
    kq = qz.quantize(k, with_msb=quant_enabled)
    vq = qz.quantize(v, with_msb=v_msb and quant_enabled)
    cos, sin = rope_ops.rope_table(cap, d)
    lengths = jnp.asarray(
        np.linspace(length // 3, length, b).astype(np.int32))

    kwargs = dict(sm_scale=sm_scale, requant_threshold=requant_threshold,
                  quant_enabled=quant_enabled, v_keep=v_keep,
                  v_block_size=v_block_size, head_mask=head_mask)

    cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                  k_new, v_new, lengths - 1)
    ref_out, ref_stats = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, lengths,
        lengths[:, None] - 1, use_rope=False, **kwargs)

    step = jax.jit(lambda *a: fused_decode_attention(
        *a, quantize_queries=quantize_queries, pv_int8=pv_int8, **kwargs),
        donate_argnums=(1, 2))
    ker_out, ker_stats, k2, v2 = step(q, kq, vq, k_new, v_new, lengths)
    return (ref_out, ref_stats), (ker_out, ker_stats), lengths


def check(ref, ker, atol=3e-2):
    """Hardware tolerance: int8/int4 dequant chains accumulate in f32 on
    the MXU, but the jnp reference on CPU-side jit differs in summation
    order; probabilities are O(1) so 3e-2 absolute is tight enough to
    catch any plane/indexing bug (those produce O(1) errors)."""
    (ref_out, ref_stats), (ker_out, ker_stats) = ref, ker
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=atol, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(ker_stats.max_prob),
                               np.asarray(ref_stats.max_prob),
                               atol=1e-3, rtol=5e-2)
    np.testing.assert_array_equal(np.asarray(ker_stats.need_requant),
                                  np.asarray(ref_stats.need_requant))


def test_hw_llama_shard_full_pipeline():
    """d=128 serving shape: quant + requant + V pruning + head mask."""
    hm = jnp.array([True, True, True, False] * 1).repeat(1)
    hm = jnp.ones((4,), bool).at[3].set(False)
    ref, ker, _ = run_hw(jax.random.PRNGKey(0), requant_threshold=0.02,
                         v_keep=512, head_mask=hm)
    check(ref, ker)


def test_hw_llama_shard_dense():
    ref, ker, _ = run_hw(jax.random.PRNGKey(1), quant_enabled=False)
    check(ref, ker)


def test_hw_gpt2_d64_kernel_path():
    """GPT-2-small decode shape (12 x d=64 heads, MHA): the reference
    chip's native geometry runs the fused kernel on hardware (VERDICT
    item 2) — head pairs pack into 128-lane tiles."""
    ref, ker, _ = run_hw(jax.random.PRNGKey(2), b=2, hq=12, hkv=12,
                         cap=1024, d=64, length=900,
                         requant_threshold=0.02, v_keep=192,
                         v_block_size=32)
    check(ref, ker)


def test_hw_gpt2_d64_int8_queries():
    ref, ker, _ = run_hw(jax.random.PRNGKey(3), b=1, hq=12, hkv=12,
                         cap=1024, d=64, length=700,
                         quantize_queries=True)
    check(ref, ker)


def test_hw_gqa_vmsb_roundtrip():
    """GQA (hq=8, hkv=4) with V carrying a nibble plane (back-compat)."""
    ref, ker, _ = run_hw(jax.random.PRNGKey(4), hq=8, hkv=4,
                         requant_threshold=0.02, v_msb=True)
    check(ref, ker)


def test_hw_gpt2_d64_dense():
    """Dense mode (no quant planes) at the GPT-2 geometry."""
    ref, ker, _ = run_hw(jax.random.PRNGKey(5), b=2, hq=12, hkv=12,
                         cap=2048, d=64, length=1800,
                         quant_enabled=False, quantize_queries=True)
    check(ref, ker)


def test_hw_pv_int8_bench_path():
    """The headline bench numerics on hardware: int8 queries (algebra
    nibble scoring) + integer-MXU P·V + requant + V pruning."""
    ref, ker, _ = run_hw(jax.random.PRNGKey(7), requant_threshold=0.02,
                         v_keep=512, quantize_queries=True, pv_int8=True)
    check(ref, ker, atol=6e-2)


def test_hw_6bit_profile():
    """Per-layer quant profile on hardware: 6-bit pass-1 (msb + lsb2
    streams) at the llama shard shape."""
    b, hq, hkv, cap, d = 2, 4, 4, 2048, 128
    ks = jax.random.split(jax.random.PRNGKey(6), 5)
    q = jax.random.normal(ks[0], (b, hq, 1, d))
    k = jax.random.normal(ks[1], (b, hkv, cap, d))
    v = jax.random.normal(ks[2], (b, hkv, cap, d))
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d))
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d))
    kq = qz.quantize(k, with_lsb2=True)
    vq = qz.quantize(v)
    cos, sin = rope_ops.rope_table(cap, d)
    lengths = jnp.array([700, 1500], jnp.int32)

    kwargs = dict(sm_scale=0.12, requant_threshold=0.02,
                  quant_enabled=True)
    cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                  k_new, v_new, lengths - 1)
    ref_out, ref_stats = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, lengths,
        lengths[:, None] - 1, use_rope=False,
        pass1_bits=jnp.int32(6), **kwargs)
    step = jax.jit(lambda *a: fused_decode_attention(
        *a, quant_bits=jnp.array([6], jnp.int32), **kwargs),
        donate_argnums=(1, 2))
    ker_out, ker_stats, k2, v2 = step(q, kq, vq, k_new, v_new, lengths)
    check((ref_out, ref_stats), (ker_out, ker_stats))


def test_hw_batch_group_bpp2():
    """Batch-grouped programs (bpp=2) on hardware: merged [bpp, ...] DMA
    descriptors, group-level gating, chunked metadata streams."""
    ks = jax.random.split(jax.random.PRNGKey(8), 6)
    b, hq, hkv, cap, d = 4, 4, 4, 2048, 128
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, cap, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, cap, d), jnp.float32)
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d), jnp.float32)
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d), jnp.float32)
    kq, vq = qz.quantize(k), qz.quantize(v, with_msb=False)
    cos, sin = rope_ops.rope_table(cap, d)
    lengths = jnp.array([1500, 500, 2000, 64], jnp.int32)
    imp0 = jax.random.uniform(ks[5], (b, hkv, cap), jnp.float32)
    kwargs = dict(sm_scale=0.12, requant_threshold=0.02,
                  quant_enabled=True, v_keep=512, v_block_size=64)
    cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                  k_new, v_new, lengths - 1)
    ref_out, ref_stats = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, lengths,
        lengths[:, None] - 1, use_rope=False, **kwargs)
    step = jax.jit(lambda *a: fused_decode_attention(
        *a, importance_in=imp0, _bpp_override=2, **kwargs),
        donate_argnums=(1, 2))
    ker_out, ker_stats, k2, v2 = step(q, kq, vq, k_new, v_new, lengths)
    check((ref_out, ref_stats), (ker_out, ker_stats))
    # chunked in-place accumulate: live prefix = imp0 (app col 0) + delta
    got = np.asarray(ker_stats.importance_delta)
    want = np.asarray(imp0).copy()
    ln = np.asarray(lengths)
    for bi in range(b):
        want[bi, :, ln[bi] - 1] = 0.0
    want = want + np.asarray(ref_stats.importance_delta)
    for bi in range(b):
        L = int(ln[bi])
        np.testing.assert_allclose(got[bi, :, :L], want[bi, :, :L],
                                   atol=1e-2, rtol=5e-2)


def test_hw_batch_group_rows_not_8_aligned():
    """bpp=2 with hkv=12, d=64, group=1 (rows=12, rows%8 != 0): the
    grouped score-scratch row slices are not sublane-aligned — Mosaic
    must still lower them (ADVICE round 3)."""
    ref, ker, _ = run_hw(jax.random.PRNGKey(9), b=2, hq=12, hkv=12,
                         cap=1024, d=64, length=900,
                         requant_threshold=0.02, v_keep=192,
                         v_block_size=32)
    check(ref, ker)
