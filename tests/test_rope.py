"""Pos-shift RoPE tests, including parity with the HF/torch convention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.ops import rope as rope_ops


def test_rope_zero_position_is_identity():
    cos, sin = rope_ops.rope_table(16, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
    out = rope_ops.apply_rope(x, cos, sin, jnp.zeros(4, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_rope_preserves_norm():
    cos, sin = rope_ops.rope_table(64, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 16))
    out = rope_ops.apply_rope(x, cos, sin, jnp.arange(10))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_relative_property():
    """q(m)·k(n) depends only on m-n — the defining RoPE property."""
    d = 32
    cos, sin = rope_ops.rope_table(128, d)
    q = jax.random.normal(jax.random.PRNGKey(2), (d,))
    k = jax.random.normal(jax.random.PRNGKey(3), (d,))

    def dot_at(m, n):
        qr = rope_ops.apply_rope(q[None], cos, sin, jnp.array([m]))
        kr = rope_ops.apply_rope(k[None], cos, sin, jnp.array([n]))
        return float(jnp.dot(qr[0], kr[0]))

    assert abs(dot_at(10, 3) - dot_at(57, 50)) < 1e-3
    assert abs(dot_at(5, 5) - dot_at(90, 90)) < 1e-3


def test_rope_matches_torch_hf_convention():
    """Parity with the HF rotate_half formulation used by the reference
    (spatten_llm/pos_shift/modify_llama.py:21-28)."""
    torch = pytest.importorskip("torch")
    d, seq, theta = 16, 12, 10000.0

    inv_freq = 1.0 / (theta ** (torch.arange(0, d, 2).float() / d))
    t = torch.arange(seq).float()
    freqs = torch.outer(t, inv_freq)
    emb = torch.cat((freqs, freqs), dim=-1)
    tcos, tsin = emb.cos(), emb.sin()

    x_t = torch.randn(seq, d)
    x1, x2 = x_t[..., : d // 2], x_t[..., d // 2 :]
    rot = torch.cat((-x2, x1), dim=-1)
    pos = torch.arange(seq)
    expected = x_t * tcos[pos] + rot * tsin[pos]

    cos, sin = rope_ops.rope_table(seq, d, theta)
    got = rope_ops.apply_rope(
        jnp.asarray(x_t.numpy()), cos, sin, jnp.arange(seq)
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=5e-5)


def test_cache_position_rotation():
    """apply_rope_at_cache_positions == apply_rope at arange — the
    pos-shift key path (keys rotated at their cache slot, not their
    original position)."""
    cos, sin = rope_ops.rope_table(32, 8)
    k = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 16, 8))
    a = rope_ops.apply_rope_at_cache_positions(k, cos, sin)
    b = rope_ops.apply_rope(k, cos, sin, jnp.arange(16))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
