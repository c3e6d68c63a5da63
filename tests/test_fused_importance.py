"""Fused (in-kernel, aliased) importance accumulation parity."""

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.ops import quantize as qz, rope as rope_ops
from spatten_tpu.ops.decode_attention import decode_attention


def test_fused_accumulate_matches_manual():
    b, hq, hkv, cap, d = 2, 4, 2, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    kq = qz.quantize(jax.random.normal(ks[1], (b, hkv, cap, d)))
    vq = qz.quantize(jax.random.normal(ks[2], (b, hkv, cap, d)))
    cos, sin = rope_ops.rope_table(cap, d)
    lengths = jnp.full((b,), 50, jnp.int32)
    imp0 = jax.random.uniform(ks[3], (b, hkv, cap))
    kwargs = dict(sm_scale=0.2, requant_threshold=0.1, quant_enabled=True,
                  v_keep=24, v_block_size=16)

    # unfused: bare delta
    out1, stats1 = decode_attention(q, kq, vq, cos, sin, lengths,
                                    interpret=True, **kwargs)
    # manual accumulate with new-slot (length-1 = 49) reset
    slot = jnp.arange(cap)[None, None, :]
    manual = jnp.where(slot == 49, 0.0, imp0) + stats1.importance_delta

    # fused
    out2, stats2 = decode_attention(q, kq, vq, cos, sin, lengths,
                                    importance_in=imp0, interpret=True,
                                    **kwargs)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats2.importance_delta),
                               np.asarray(manual), atol=1e-5, rtol=1e-5)


def test_fused_accumulate_dead_head_carries_through():
    b, hq, hkv, cap, d = 1, 4, 2, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    kq = qz.quantize(jax.random.normal(ks[1], (b, hkv, cap, d)))
    vq = qz.quantize(jax.random.normal(ks[2], (b, hkv, cap, d)))
    cos, sin = rope_ops.rope_table(cap, d)
    lengths = jnp.full((b,), 20, jnp.int32)
    imp0 = jax.random.uniform(ks[3], (b, hkv, cap))
    hm = jnp.array([False, False, True, True])   # kv head 0 fully dead

    _, stats = decode_attention(q, kq, vq, cos, sin, lengths,
                                sm_scale=0.3, head_mask=hm,
                                importance_in=imp0, interpret=True)
    got = np.asarray(stats.importance_delta)
    # dead group: accumulator unchanged
    np.testing.assert_allclose(got[:, 0], np.asarray(imp0)[:, 0],
                               atol=1e-6)
    # live group: changed (delta added)
    assert not np.allclose(got[:, 1], np.asarray(imp0)[:, 1])
