"""Split-K sharded-KV flash decode vs the unsharded oracle (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.parallel.split_k import (
    make_kv_mesh, reference_decode, split_k_decode,
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
