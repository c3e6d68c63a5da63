"""Unit tests for two-plane KV quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.ops import quantize as qz


def _rand(shape, seed=0, scale=3.0):
    return scale * jax.random.normal(jax.random.PRNGKey(seed), shape)


def test_full_roundtrip_error_bound():
    x = _rand((2, 3, 16, 32))
    q = qz.quantize(x)
    deq = qz.dequantize_full(q)
    # symmetric int8: max error is half a step = amax/127/2 per token
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    step = amax / 127.0
    assert jnp.all(jnp.abs(deq - x) <= step * 0.51 + 1e-6)


def test_pack_unpack_msb_identity():
    x = _rand((2, 2, 8, 16), seed=1)
    q = qz.quantize(x)
    unpacked = qz.unpack_msb(q.msb)
    expect = (q.full.astype(jnp.int32) >> 4).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(expect))


def test_planes_compose():
    """int8 == (msb << 4) | lsb — the plane-composition invariant."""
    x = _rand((1, 4, 32), seed=2)        # [H=1, T, D]
    q = qz.quantize(x)
    msb = qz.unpack_msb(q.msb).astype(jnp.int32)
    lsb = q.full.astype(jnp.int32) & 0xF
    np.testing.assert_array_equal(
        np.asarray(msb * 16 + lsb), np.asarray(q.full, dtype=np.int32)
    )


def test_msb_dequant_is_coarse_but_bounded():
    x = _rand((1, 8, 64), seed=3)        # [H=1, T, D]
    q = qz.quantize(x)
    deq4 = qz.dequantize_msb(q)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    # 4-bit plane: error bounded by ~8.5 int8 steps (truncation + rounding)
    step = amax / 127.0
    assert jnp.all(jnp.abs(deq4 - x) <= step * 9.0 + 1e-6)
    # and it must be strictly coarser info than full on average
    deq8 = qz.dequantize_full(q)
    assert jnp.mean(jnp.abs(deq4 - x)) > jnp.mean(jnp.abs(deq8 - x))


def test_update_token_matches_requantize():
    x = _rand((2, 2, 8, 16), seed=4)
    q = qz.quantize(x)
    new_row = _rand((2, 2, 16), seed=5)
    for slot in [0, 3, 4, 7]:   # both halves of the packed plane
        q2 = qz.update_token(q, new_row, jnp.int32(slot))
        x_new = x.at[:, :, slot, :].set(new_row)
        q_ref = qz.quantize(x_new)
        np.testing.assert_array_equal(np.asarray(q2.full),
                                      np.asarray(q_ref.full))
        np.testing.assert_array_equal(np.asarray(q2.msb),
                                      np.asarray(q_ref.msb))
        np.testing.assert_allclose(np.asarray(q2.scale),
                                   np.asarray(q_ref.scale), rtol=1e-6)


def test_gather_tokens_matches_dense_gather():
    x = _rand((2, 2, 8, 16), seed=6)
    q = qz.quantize(x)
    idx = jnp.array([[[0, 2, 5, 7], [1, 2, 3, 4]],
                     [[4, 5, 6, 7], [0, 1, 6, 7]]], dtype=jnp.int32)
    q2 = qz.gather_tokens(q, idx)
    x_g = jnp.take_along_axis(x, idx[..., None], axis=-2)
    q_ref = qz.quantize(x_g)
    np.testing.assert_array_equal(np.asarray(q2.full), np.asarray(q_ref.full))
    np.testing.assert_array_equal(np.asarray(q2.msb), np.asarray(q_ref.msb))


def test_update_token_jits():
    x = _rand((1, 2, 8, 16), seed=7)
    q = qz.quantize(x)
    f = jax.jit(qz.update_token)
    out = f(q, _rand((1, 2, 16), seed=8), jnp.int32(5))
    assert out.full.shape == q.full.shape
