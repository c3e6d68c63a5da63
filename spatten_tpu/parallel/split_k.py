"""Split-K (sequence-parallel) flash decode over a sharded KV axis.

SURVEY.md §2.9 (SP/CP row): the reference handles long context purely
algorithmically (rolling pruned cache), but the design must also cover
sharding the *compacted* KV itself over an ICI mesh axis for prompts that
exceed one chip's HBM or latency budget.  This module is that design: the
cache's token axis is sharded over a ``kv`` mesh axis; each shard runs
flash-style partial attention over its local slice (local running max +
denominator), and the partials combine with two ``psum``s — the standard
split-K softmax recombination

    m   = pmax(m_i)
    out = sum_i exp(m_i - m) * o_i  /  sum_i exp(m_i - m) * den_i

which is exact (no approximation) for any shard count.

Composition with SpAtten:
* token pruning happens *before* sharding (the compacted cache is what
  gets sharded), so each shard holds ``keep/n`` live tokens;
* per-token masks ride along: the global slot index of a local column is
  ``shard_index * C_local + col``, compared against the sequence length;
* importance deltas come back per shard and concatenate to the global
  accumulator layout (axis-sharded exactly like K/V), so cascade pruning
  continues to work on the sharded cache.

The kernelized single-chip path (``ops.fused_decode``) remains the
per-shard compute; this module supplies the cross-shard recombination.
The toy here uses the jnp reference attention per shard — the
recombination math is identical either way.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _local_partial(q, k_local, v_local, base, lengths, sm_scale):
    """Partial flash attention over one KV shard.

    q: [B, H, D]; k_local/v_local: [B, H, Cl, D]; base: scalar global slot
    of local column 0; lengths: [B].  Returns (o [B,H,D], m [B,H],
    den [B,H]) — the shard's unnormalized output, running max, and
    denominator."""
    cl = k_local.shape[-2]
    scores = jnp.einsum("bhd,bhcd->bhc", q, k_local) * sm_scale
    gcol = base + jnp.arange(cl)[None, None, :]
    valid = gcol < lengths[:, None, None]
    scores = jnp.where(valid, scores, MASK_VALUE)
    m = jnp.max(scores, axis=-1)                          # [B, H]
    e = jnp.where(valid, jnp.exp(scores - m[..., None]), 0.0)
    den = jnp.sum(e, axis=-1)                             # [B, H]
    o = jnp.einsum("bhc,bhcd->bhd", e, v_local)
    return o, m, den


def split_k_decode(
    q: jax.Array,          # [B, H, D]
    k: jax.Array,          # [B, H, C, D] — token axis sharded over `axis`
    v: jax.Array,          # [B, H, C, D]
    lengths: jax.Array,    # [B]
    mesh: Mesh,
    axis: str = "kv",
    sm_scale: float = 1.0,
) -> jax.Array:
    """Exact decode attention with KV sharded over a mesh axis.

    Each device computes a flash partial over its local token slice; two
    collectives (pmax of the running max, psum of the rescaled numerator
    and denominator) produce the exact softmax-weighted output on every
    device."""
    n = mesh.shape[axis]
    c = k.shape[-2]
    assert c % n == 0, f"token axis {c} must divide over {axis}={n}"
    cl = c // n

    def shard_fn(q, k_local, v_local, lengths):
        idx = jax.lax.axis_index(axis)
        base = idx * cl
        o, m, den = _local_partial(q, k_local, v_local, base, lengths,
                                   sm_scale)
        m_g = jax.lax.pmax(m, axis)                       # [B, H]
        w = jnp.exp(m - m_g)
        num = jax.lax.psum(o * w[..., None], axis)
        den_g = jax.lax.psum(den * w, axis)
        return num / jnp.maximum(den_g, 1e-30)[..., None]

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, None, axis, None),
                  P(None, None, axis, None), P()),
        out_specs=P(),
        check_vma=False,
    ))(q, k, v, lengths)


def make_kv_mesh(n: int) -> Mesh:
    import numpy as np
    devs = np.asarray(jax.devices()[:n]).reshape(n)
    return Mesh(devs, ("kv",))


def reference_decode(q, k, v, lengths, sm_scale=1.0) -> jax.Array:
    """Unsharded oracle for tests."""
    scores = jnp.einsum("bhd,bhcd->bhc", q, k) * sm_scale
    valid = jnp.arange(k.shape[-2])[None, None, :] < lengths[:, None, None]
    scores = jnp.where(valid, scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(valid, p, 0.0)
    return jnp.einsum("bhc,bhcd->bhd", p, v)
