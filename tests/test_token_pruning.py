"""Cascade token pruning: parity against the reference semantics.

The torch oracle below independently implements the documented behavior of
`SpAttenKVCache.apply_token_pruning` (reference
spatten_llm/kv_cache_token_pruning.py:42-96): keep [0, start), keep the
per-head top-`important` of the middle region sorted chronologically, keep
the trailing `recent - num_coming` window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import PruningConfig
from spatten_tpu.pruning import (
    select_keep_indices,
    prune_arrays,
    pruned_length,
)


def torch_oracle_keep_indices(importance, length, start, important, recent,
                              num_coming):
    """Per-head kept indices, the reference way (torch, loops allowed)."""
    import torch

    imp = torch.as_tensor(np.asarray(importance))   # [B, H, C]
    recent_keep = recent - num_coming
    out = []
    for b in range(imp.shape[0]):
        heads = []
        for h in range(imp.shape[1]):
            middle = imp[b, h, start : length - recent_keep]
            _, top = torch.topk(middle, important, dim=-1)
            top = top.sort().values + start
            idx = torch.cat(
                [
                    torch.arange(start),
                    top,
                    torch.arange(length - recent_keep, length),
                ]
            )
            heads.append(idx)
        out.append(torch.stack(heads))
    return torch.stack(out).numpy()


@pytest.mark.parametrize("num_coming", [1, 8])
@pytest.mark.parametrize("start", [0, 4])
def test_keep_indices_match_torch_oracle(num_coming, start):
    pytest.importorskip("torch")
    B, H, C = 2, 3, 64
    important, recent = 10, 16
    length = 50
    imp = jax.random.uniform(jax.random.PRNGKey(0), (B, H, C))
    # invalidate past-length region to make sure it can't be selected
    imp = imp.at[:, :, length:].set(100.0)

    got = select_keep_indices(
        imp, jnp.int32(length), start, important, recent, num_coming
    )
    expect = torch_oracle_keep_indices(
        imp, length, start, important, recent, num_coming
    )
    np.testing.assert_array_equal(np.asarray(got), expect)
    assert got.shape[-1] == start + important + (recent - num_coming)


def test_keep_indices_sorted_and_in_range():
    B, H, C = 1, 2, 128
    imp = jax.random.uniform(jax.random.PRNGKey(1), (B, H, C))
    length, start, important, recent, num_coming = 100, 4, 20, 30, 5
    idx = select_keep_indices(
        imp, jnp.int32(length), start, important, recent, num_coming
    )
    arr = np.asarray(idx)
    assert (np.diff(arr, axis=-1) > 0).all(), "indices must be strictly sorted"
    assert arr.min() >= 0 and arr.max() < length


def test_prune_arrays_gathers_tokens():
    B, H, C, D = 2, 2, 32, 8
    k = jax.random.normal(jax.random.PRNGKey(2), (B, H, C, D))
    imp = jax.random.uniform(jax.random.PRNGKey(3), (B, H, C))
    idx = select_keep_indices(imp, jnp.int32(30), 2, 6, 8, 2)
    (k2, imp2) = prune_arrays(idx, k, imp)
    assert k2.shape == (B, H, idx.shape[-1], D)
    assert imp2.shape == (B, H, idx.shape[-1])
    # spot check one gather
    b, h = 1, 0
    np.testing.assert_allclose(
        np.asarray(k2[b, h, 3]), np.asarray(k[b, h, int(idx[b, h, 3])])
    )


def test_cascade_pruned_stays_pruned():
    """Once a token is evicted it can never come back: two successive prunes
    only ever shrink the set of original positions retained."""
    B, H, C = 1, 1, 128
    cfg = PruningConfig(start_size=2, important_size=8, recent_size=16)
    imp = jax.random.uniform(jax.random.PRNGKey(4), (B, H, C))
    positions = jnp.broadcast_to(jnp.arange(C), (B, H, C))  # original ids

    length1 = 60
    idx1 = select_keep_indices(imp, jnp.int32(length1), cfg.start_size,
                               cfg.important_size, cfg.recent_size, 4)
    (imp, positions) = prune_arrays(idx1, imp, positions)
    kept1 = set(np.asarray(positions).ravel().tolist())

    length2 = pruned_length(cfg, 4)
    idx2 = select_keep_indices(imp, jnp.int32(length2), cfg.start_size,
                               cfg.important_size, cfg.recent_size, 12)
    (positions,) = prune_arrays(idx2, positions)
    kept2 = set(np.asarray(positions).ravel().tolist())
    assert kept2 <= kept1


def test_pruned_length():
    cfg = PruningConfig(start_size=4, important_size=150, recent_size=150)
    assert pruned_length(cfg, 10) == 4 + 150 + 140
    with pytest.raises(ValueError):
        pruned_length(cfg, 151)
