"""Token sampling: greedy / temperature / top-k / top-p (nucleus).

The reference demo is greedy-only (run_spatten_llama.py:18-57); a serving
engine needs the standard sampler family.  All jittable, static shapes."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0      # 0 => greedy
    top_k: int = 0                # 0 => disabled
    top_p: float = 1.0            # 1.0 => disabled

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def sample_token(logits: jax.Array, key: jax.Array,
                 params: SamplingParams) -> jax.Array:
    """logits [B, V] -> int32 [B]."""
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits.astype(jnp.float32) / params.temperature
    if params.top_k > 0 and params.top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p
        cutoff_idx = jnp.sum((cum < params.top_p).astype(jnp.int32),
                             axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits >= cutoff, logits, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
