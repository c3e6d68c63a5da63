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
    out, k2, v2, _, _, _ = split_k_decode_fused(
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


def test_split_k_importance_telemetry_exact_mha():
    """SpAtten telemetry on the sharded cache (VERDICT r3 item 4): with
    group == 1 the per-shard importance deltas rescale to EXACT global
    probabilities — the accumulated sharded importance must match the
    unsharded fused kernel's accumulator on the live prefix."""
    if jax.device_count() < 4:
        pytest.skip("needs virtual device mesh")
    from spatten_tpu.ops.fused_decode import fused_decode_attention
    n, b, h, d, cl = 4, 2, 2, 32, 64
    cap = n * cl
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    q = jax.random.normal(ks[0], (b, h, 1, d))
    k = jax.random.normal(ks[1], (b, h, cap, d))
    v = jax.random.normal(ks[2], (b, h, cap, d))
    k_new = jax.random.normal(ks[3], (b, h, 1, d))
    v_new = jax.random.normal(ks[4], (b, h, 1, d))
    kq = quantize_sharded(k, n)
    vq = quantize_sharded(v, n, with_msb=False)
    imp0 = jax.random.uniform(jax.random.PRNGKey(12), (b, h, cap))
    own_live = jnp.array([20, 41], jnp.int32)
    local_lengths = jnp.concatenate(
        [jnp.full((n - 1, b), cl, jnp.int32), own_live[None]], axis=0)
    glob = (n - 1) * cl + own_live

    mesh = make_kv_mesh(n)
    out, k2, v2, imp2, maxp, need = split_k_decode_fused(
        q, kq, vq, k_new, v_new, local_lengths, mesh, sm_scale=0.18,
        quant_enabled=True, importance_in=imp0, interpret=True)
    assert maxp.shape == (n, b, h) and need.shape == (n, b, h)

    # unsharded oracle: globally-packed planes, in-place accumulate
    kq_g = qz.quantize(k)
    vq_g = qz.quantize(v, with_msb=False)
    _, stats_g, _, _ = fused_decode_attention(
        q, kq_g, vq_g, k_new, v_new, glob, sm_scale=0.18,
        quant_enabled=True, importance_in=imp0, interpret=True)
    want = np.asarray(stats_g.importance_delta)
    got = np.asarray(imp2)
    for bb in range(b):
        L = int(glob[bb])
        np.testing.assert_allclose(got[bb, :, :L], want[bb, :, :L],
                                   atol=3e-5, rtol=1e-4)


def test_split_k_importance_telemetry_exact_gqa():
    """GQA split-K importance exactness (VERDICT r4 item 5): with
    group > 1 the kernel emits per-query-row deltas and the shard map
    rescales each row by its own flash weight before the group sum —
    the accumulated sharded importance must match the unsharded fused
    kernel's accumulator on the live prefix (the reference sums full
    softmax probs over every query head of the group,
    kv_cache_token_pruning.py:51)."""
    if jax.device_count() < 4:
        pytest.skip("needs virtual device mesh")
    from spatten_tpu.ops.fused_decode import fused_decode_attention
    n, b, hq, hkv, d, cl = 4, 2, 4, 2, 32, 64
    cap = n * cl
    ks = jax.random.split(jax.random.PRNGKey(21), 5)
    q = jax.random.normal(ks[0], (b, hq, 1, d))
    k = jax.random.normal(ks[1], (b, hkv, cap, d))
    v = jax.random.normal(ks[2], (b, hkv, cap, d))
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d))
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d))
    kq = quantize_sharded(k, n)
    vq = quantize_sharded(v, n, with_msb=False)
    imp0 = jax.random.uniform(jax.random.PRNGKey(22), (b, hkv, cap))
    own_live = jnp.array([20, 41], jnp.int32)
    local_lengths = jnp.concatenate(
        [jnp.full((n - 1, b), cl, jnp.int32), own_live[None]], axis=0)
    glob = (n - 1) * cl + own_live

    mesh = make_kv_mesh(n)
    out, k2, v2, imp2, maxp, need = split_k_decode_fused(
        q, kq, vq, k_new, v_new, local_lengths, mesh, sm_scale=0.18,
        quant_enabled=True, importance_in=imp0, interpret=True)

    kq_g = qz.quantize(k)
    vq_g = qz.quantize(v, with_msb=False)
    _, stats_g, _, _ = fused_decode_attention(
        q, kq_g, vq_g, k_new, v_new, glob, sm_scale=0.18,
        quant_enabled=True, importance_in=imp0, interpret=True)
    want = np.asarray(stats_g.importance_delta)
    got = np.asarray(imp2)
    for bb in range(b):
        L = int(glob[bb])
        np.testing.assert_allclose(got[bb, :, :L], want[bb, :, :L],
                                   atol=3e-5, rtol=1e-4)


def test_split_k_prune_event_and_continue():
    """Cascade pruning on the kv-sharded cache: decode, prune (global
    selection + cross-shard gather + shard-local repack), decode again —
    every step matches the unsharded reference over the same kept set."""
    if jax.device_count() < 4:
        pytest.skip("needs virtual device mesh")
    from spatten_tpu.parallel.split_k import split_k_prune
    n, b, h, d, cl = 4, 2, 2, 32, 64
    cap = n * cl
    ks = jax.random.split(jax.random.PRNGKey(21), 5)
    q = jax.random.normal(ks[0], (b, h, 1, d))
    k = jax.random.normal(ks[1], (b, h, cap, d))
    v = jax.random.normal(ks[2], (b, h, cap, d))
    kq = quantize_sharded(k, n)
    vq = quantize_sharded(v, n, with_msb=False)
    imp = jax.random.uniform(jax.random.PRNGKey(22), (b, h, cap))
    # cache nearly full everywhere
    glob0 = jnp.full((b,), cap - 2, jnp.int32)
    start, important, recent = 4, 96, 28
    keep_total = start + important + recent

    k2, v2, imp2, local2 = split_k_prune(
        kq, vq, imp, jnp.stack([jnp.clip(glob0 - i * cl, 0, cl)
                                for i in range(n)]), make_kv_mesh(n),
        start_size=start, important_size=important, recent_size=recent)
    # expected: plain gather of the same keep set
    from spatten_tpu.pruning.token_pruning import select_keep_indices
    keep_idx = select_keep_indices(imp, glob0[:, None], start, important,
                                   recent, 0)
    kf4 = np.asarray(kq.full).reshape(b, cap, h, d)
    got = np.asarray(k2.full).reshape(b, cap, h, d)
    ki = np.asarray(keep_idx)
    for bb in range(b):
        for hh in range(h):
            np.testing.assert_array_equal(
                got[bb, :keep_total, hh], kf4[bb, ki[bb, hh], hh])
    # shard-local msb layout: each shard's slice equals a local pack
    kmsb = np.asarray(k2.msb)
    for i in range(n):
        want_local = np.asarray(qz.pack_msb(
            k2.full[:, i * cl:(i + 1) * cl]))
        np.testing.assert_array_equal(
            kmsb[:, i * (cl // 2):(i + 1) * (cl // 2)], want_local)
    np.testing.assert_array_equal(
        np.asarray(local2),
        np.stack([np.clip(keep_total - i * cl, 0, cl) * np.ones(b, np.int32)
                  for i in range(n)]))

    # decode over the pruned sharded cache still matches the reference
    k_new = jax.random.normal(ks[3], (b, h, 1, d))
    v_new = jax.random.normal(ks[4], (b, h, 1, d))
    local3 = np.asarray(local2).copy()
    owner = keep_total // cl
    local3[owner] += 1                       # append slot
    out, k3, v3, _, _, _ = split_k_decode_fused(
        q, k2, v2, k_new, v_new, jnp.asarray(local3), make_kv_mesh(n),
        sm_scale=0.18, quant_enabled=True, interpret=True)
    glob1 = jnp.full((b,), keep_total + 1, jnp.int32)
    cache_ref = kvc.append_tokens(
        kvc.LayerKVCache(
            k=qz.QuantizedKV(full=k2.full, msb=qz.pack_msb(k2.full),
                             scale=k2.scale),
            v=qz.QuantizedKV(full=v2.full, msb=None, scale=v2.scale)),
        k_new, v_new, glob1 - 1)
    cos, sin = rope_table(cap, d)
    want_out, _ = spatten_attention_reference(
        q, cache_ref.k, cache_ref.v, cos, sin, glob1,
        glob1[:, None] - 1, use_rope=False, sm_scale=0.18,
        quant_enabled=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=3e-5, rtol=1e-4)


def test_split_k_prune_trigger_gating():
    """Per-sequence trigger: untriggered sequences must be BIT-EXACT
    no-ops (planes, importance, local lengths) while triggered ones
    compact — the sharded analog of maybe_prune's identity protection."""
    if jax.device_count() < 4:
        pytest.skip("needs virtual device mesh")
    from spatten_tpu.parallel.split_k import split_k_prune
    n, b, h, d, cl = 4, 2, 2, 32, 64
    cap = n * cl
    ks = jax.random.split(jax.random.PRNGKey(31), 3)
    k = jax.random.normal(ks[0], (b, h, cap, d))
    kq = quantize_sharded(k, n)
    vq = quantize_sharded(k, n, with_msb=False)
    imp = jax.random.uniform(ks[1], (b, h, cap))
    # seq 0 near-full (triggered); seq 1 short (must not be touched)
    glob0 = jnp.array([cap - 2, 40], jnp.int32)
    local = jnp.stack([jnp.clip(glob0 - i * cl, 0, cl) for i in range(n)])
    start, important, recent = 4, 96, 28

    k2, v2, imp2, local2 = split_k_prune(
        kq, vq, imp, local, make_kv_mesh(n),
        start_size=start, important_size=important, recent_size=recent,
        trigger=jnp.array([True, False]))
    # untriggered sequence: everything bit-exact
    np.testing.assert_array_equal(np.asarray(k2.full)[1],
                                  np.asarray(kq.full)[1])
    np.testing.assert_array_equal(np.asarray(k2.msb)[1],
                                  np.asarray(kq.msb)[1])
    np.testing.assert_array_equal(np.asarray(imp2)[1], np.asarray(imp)[1])
    np.testing.assert_array_equal(np.asarray(local2)[:, 1],
                                  np.asarray(local)[:, 1])
    # triggered sequence: compacted to keep_total
    keep_total = start + important + recent
    np.testing.assert_array_equal(
        np.asarray(local2)[:, 0],
        np.clip(keep_total - np.arange(n) * cl, 0, cl))
