"""Split-K sharded-KV flash decode vs the unsharded oracle (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.engine import kv_cache as kvc
from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops.attention_ref import spatten_attention_reference
from spatten_tpu.ops.rope import rope_table
from spatten_tpu.parallel.split_k import (
    make_kv_mesh, quantize_sharded, reference_decode, split_k_decode,
    split_k_decode_fused,
)


@pytest.mark.parametrize("n", [2, 8])
def test_split_k_matches_reference(n):
    if jax.device_count() < n:
        pytest.skip("needs virtual device mesh")
    b, h, c, d = 2, 4, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, h, c, d))
    v = jax.random.normal(ks[2], (b, h, c, d))
    lengths = jnp.array([50, 23], jnp.int32)

    mesh = make_kv_mesh(n)
    got = split_k_decode(q, k, v, lengths, mesh, sm_scale=0.25)
    want = reference_decode(q, k, v, lengths, sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_split_k_shard_boundary_lengths():
    """Lengths landing exactly on and inside shard boundaries."""
    if jax.device_count() < 4:
        pytest.skip("needs virtual device mesh")
    b, h, c, d = 3, 2, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, h, c, d))
    v = jax.random.normal(ks[2], (b, h, c, d))
    # 8 = one full shard; 9 = one row into shard 1; 32 = everything
    lengths = jnp.array([8, 9, 32], jnp.int32)
    mesh = make_kv_mesh(4)
    got = split_k_decode(q, k, v, lengths, mesh, sm_scale=0.3)
    want = reference_decode(q, k, v, lengths, sm_scale=0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n", [2, 4])
def test_split_k_fused_kernel_matches_reference(n):
    """The FUSED SpAtten kernel as the per-shard compute: quantized
    planes sharded over the kv axis, owner-only append, exact two-psum
    recombination — must match the jnp reference over the concatenated
    cache (shards 0..n-2 full, the owner shard partially live, so the
    global valid set is a prefix the reference can express)."""
    if jax.device_count() < n:
        pytest.skip("needs virtual device mesh")
    b, hq, hkv, d = 2, 4, 2, 32
    cl = 64                       # tokens per shard arena
    cap = n * cl
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(ks[0], (b, hq, 1, d))
    k = jax.random.normal(ks[1], (b, hkv, cap, d))
    v = jax.random.normal(ks[2], (b, hkv, cap, d))
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d))
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d))

    kq = quantize_sharded(k, n, with_msb=True)
    vq = quantize_sharded(v, n, with_msb=False)

    # shards 0..n-2 full; owner (last) holds 20 and 41 live INCL. new
    own_live = jnp.array([20, 41], jnp.int32)
    local_lengths = jnp.concatenate(
        [jnp.full((n - 1, b), cl, jnp.int32), own_live[None]], axis=0)
    glob_lengths = (n - 1) * cl + own_live                  # [B]

    mesh = make_kv_mesh(n)
    out, k2, v2 = split_k_decode_fused(
        q, kq, vq, k_new, v_new, local_lengths, mesh, sm_scale=0.18,
        quant_enabled=True, interpret=True)

    # reference: GLOBALLY-packed planes (same full/scale values — scales
    # are per token; only the msb packing layout differs), XLA append at
    # the global slot, full-prefix valid set
    kq_g = qz.quantize(k, with_msb=True)
    vq_g = qz.quantize(v, with_msb=False)
    cache_ref = kvc.append_tokens(
        kvc.LayerKVCache(k=kq_g, v=vq_g), k_new, v_new, glob_lengths - 1)
    cos, sin = rope_table(cap, d)
    want, _ = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, glob_lengths,
        glob_lengths[:, None] - 1, use_rope=False, sm_scale=0.18,
        quant_enabled=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=3e-5, rtol=1e-4)
    # owner's shard appended in place; full shards untouched
    got_full = np.asarray(k2.full)
    want_full = np.asarray(cache_ref.k.full)
    for bb in range(b):
        L = int(glob_lengths[bb])
        np.testing.assert_array_equal(got_full[bb, :L], want_full[bb, :L])
