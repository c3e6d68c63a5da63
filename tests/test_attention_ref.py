"""Tests for the reference SpAtten attention pipeline (pure jnp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops import rope as rope_ops
from spatten_tpu.ops.attention_ref import (
    spatten_attention_reference,
    v_block_keep_mask,
)


def make_inputs(B=2, Hq=4, Hkv=2, C=32, D=16, q_len=1, length=24, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (B, Hq, q_len, D))
    k = jax.random.normal(keys[1], (B, Hkv, C, D))
    v = jax.random.normal(keys[2], (B, Hkv, C, D))
    cos, sin = rope_ops.rope_table(C, D)
    q_positions = jnp.arange(length - q_len, length)
    q_rot = rope_ops.apply_rope(q, cos, sin, q_positions)
    return q_rot, qz.quantize(k), qz.quantize(v), k, v, cos, sin, q_positions


def dense_softmax_attention(q, k_deq, v_deq, cos, sin, length, q_positions,
                            sm_scale):
    """Vanilla masked attention over the dequantized cache (oracle)."""
    B, Hq = q.shape[:2]
    Hkv, C = k_deq.shape[1], k_deq.shape[2]
    group = Hq // Hkv
    k_rot = rope_ops.apply_rope_at_cache_positions(k_deq, cos, sin)
    k_rep = jnp.repeat(k_rot, group, axis=1)
    v_rep = jnp.repeat(v_deq, group, axis=1)
    s = jnp.einsum("bhqd,bhcd->bhqc", q, k_rep) * sm_scale
    pos = jnp.arange(C)
    mask = (pos[None, :] < length) & (pos[None, :] <= q_positions[:, None])
    s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqc,bhcd->bhqd", p, v_rep)


def test_full_plane_matches_vanilla_attention():
    q, kq, vq, k, v, cos, sin, qpos = make_inputs()
    length = jnp.int32(24)
    sm_scale = 1.0 / np.sqrt(q.shape[-1])
    out, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=sm_scale,
        quant_enabled=False, requant_threshold=0.0, v_keep=0,
    )
    expect = dense_softmax_attention(
        q, qz.dequantize_full(kq), qz.dequantize_full(vq),
        cos, sin, length, qpos, sm_scale,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-4, rtol=1e-4)


def test_msb_plane_is_approximate_not_equal():
    q, kq, vq, k, v, cos, sin, qpos = make_inputs(seed=1)
    length = jnp.int32(24)
    sm_scale = 1.0 / np.sqrt(q.shape[-1])
    out4, _ = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=sm_scale,
        quant_enabled=True, requant_threshold=0.0, v_keep=0,
    )
    out8, _ = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=sm_scale,
        quant_enabled=False, requant_threshold=0.0, v_keep=0,
    )
    err = np.abs(np.asarray(out4) - np.asarray(out8)).max()
    assert 0 < err < 1.0, f"msb plane error {err} out of expected band"


def test_requant_selects_full_plane_for_low_confidence():
    q, kq, vq, k, v, cos, sin, qpos = make_inputs(seed=2)
    length = jnp.int32(24)
    sm_scale = 1.0 / np.sqrt(q.shape[-1])
    # threshold 1.0 => every head is low-confidence => everything requants
    out_req, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=sm_scale,
        quant_enabled=True, requant_threshold=1.0, v_keep=0,
    )
    out_full, _ = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=sm_scale,
        quant_enabled=False, v_keep=0,
    )
    assert bool(stats.need_requant.all())
    np.testing.assert_allclose(np.asarray(out_req), np.asarray(out_full),
                               atol=1e-5)


def test_requant_threshold_zero_keeps_msb():
    q, kq, vq, *_rest = make_inputs(seed=3)
    _, _, _, _, _, cos, sin, qpos = make_inputs(seed=3)
    length = jnp.int32(24)
    out_a, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=0.25,
        quant_enabled=True, requant_threshold=1e-9, v_keep=0,
    )
    assert not bool(stats.need_requant.any())


def test_v_block_keep_mask_budget_and_mass():
    probs = jax.random.uniform(jax.random.PRNGKey(5), (2, 3, 1, 64))
    probs = probs / probs.sum(-1, keepdims=True)
    mask = v_block_keep_mask(probs, v_keep=16, block_size=8)
    kept = np.asarray(mask).sum(axis=-1)
    assert (kept == 16).all()
    # kept blocks must carry at least their fair share of mass
    mass = np.asarray(jnp.where(mask, probs, 0).sum(-1))
    assert (mass >= 16 / 64).all()


def test_head_mask_zeroes_output_and_importance():
    q, kq, vq, k, v, cos, sin, qpos = make_inputs(seed=6)
    length = jnp.int32(24)
    head_mask = jnp.array([True, False, True, False])
    out, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=0.25,
        quant_enabled=False, v_keep=0, head_mask=head_mask,
    )
    assert np.abs(np.asarray(out[:, 1])).max() == 0
    assert np.abs(np.asarray(out[:, 3])).max() == 0
    assert np.abs(np.asarray(out[:, 0])).max() > 0


def test_importance_epilogue_matches_manual():
    q, kq, vq, k, v, cos, sin, qpos = make_inputs(seed=7)
    length = jnp.int32(24)
    out, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=0.25,
        quant_enabled=False, v_keep=0, importance_kind="prob",
    )
    # prob importance sums to (#queries * group) per kv head over valid region
    tot = np.asarray(stats.importance_delta).sum(-1)
    group = q.shape[1] // kq.heads
    np.testing.assert_allclose(tot, q.shape[2] * group, rtol=1e-5)
    # nothing attributed past `length`
    assert np.abs(np.asarray(stats.importance_delta)[..., 24:]).max() == 0


def test_presoftmax_importance_kind():
    q, kq, vq, k, v, cos, sin, qpos = make_inputs(seed=8)
    length = jnp.int32(24)
    _, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=0.25,
        quant_enabled=False, v_keep=0, importance_kind="presoftmax",
    )
    # raw-logit importance can be negative — distinguishes it from probs
    assert np.asarray(stats.importance_delta).min() < 0


def test_prefill_causal_masking():
    """With q_len > 1, query i must not see cache slots beyond its own."""
    q, kq, vq, k, v, cos, sin, _ = make_inputs(q_len=4, seed=9)
    length = jnp.int32(24)
    qpos = jnp.arange(20, 24)
    _, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, qpos, sm_scale=0.25,
        quant_enabled=False, v_keep=0,
    )
    probs = np.asarray(stats.probs)     # [B, Hq, 4, C]
    for i, p in enumerate(range(20, 24)):
        assert probs[:, :, i, p + 1 :].max() == 0
