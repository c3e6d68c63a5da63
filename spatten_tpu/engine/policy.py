"""Runtime pruning-policy generation: head masks + quant profiles.

The reference's head pruning appears only as *outputs* of its unreleased
profiler (workload CSVs with missing head rows — GPT-2-medium keeps
10-13/16 heads in layers 16-23, SURVEY.md §2.8); the policy that produced
them is re-created here: accumulate each head's attention-probability mass
(= the sum of its token importance, HPCA'21 §head pruning) and keep the
top-`head_keep` heads per layer.

Under GQA the KV cache is shared across a query-head group, so pruning is
decided at kv-head (group) granularity — pruning a group removes its K/V
fetches entirely (the kernel's whole-program early exit)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spatten_tpu.config import SpAttenConfig
from spatten_tpu.engine.state import DecodeState
from spatten_tpu.pruning.head_pruning import select_heads


def head_importance_from_state(state: DecodeState) -> jax.Array:
    """Per-(layer, kv_head) importance: the accumulated probability mass
    of the group's valid tokens, summed over the batch.  -> [L, Hkv]."""
    cap = state.importance.shape[-1]
    valid = (jnp.arange(cap)[None, :] <
             state.lengths[:, None])[None, :, None, :]    # [1, B, 1, C]
    imp = jnp.where(valid, state.importance.astype(jnp.float32), 0.0)
    return imp.sum(axis=(1, 3))                           # [L, Hkv]


def update_head_mask(cfg: SpAttenConfig, state: DecodeState) -> DecodeState:
    """Recompute the per-layer head mask from accumulated importance.

    Keeps the top `cfg.pruning.head_keep` kv-head groups per layer (0 = keep
    all).  The q-head mask expands each kept group to its query heads."""
    p, m = cfg.pruning, cfg.model
    if not p.enable_head_pruning or p.head_keep <= 0:
        return state
    keep_groups = min(p.head_keep, m.num_kv_heads)
    imp = head_importance_from_state(state)               # [L, Hkv]
    group_mask = select_heads(imp, keep_groups)           # [L, Hkv] bool
    q_mask = jnp.repeat(group_mask, m.num_heads // m.num_kv_heads, axis=-1)
    return state._replace(head_mask=q_mask)


def quant_profile(cfg: SpAttenConfig) -> dict:
    """The quantization profile as data (the reference carries it in
    per-request metadata, SpAtten.scala:94-111 with per-request
    QuantProfile bit counts, SpAtten.scala:71-74): per-layer pass-1 plane
    widths and the requant threshold the kernels will apply.  The live
    copy rides DecodeState.quant_bits so a serving layer can override it
    per request."""
    q = cfg.quant
    if not q.enabled:
        return {"key_bits": -1, "value_bits": -1, "requant": False,
                "threshold": -1.0}
    layer_bits = q.resolved_layer_bits(cfg.model.num_layers)
    return {
        "key_bits": layer_bits[0],         # pass-1 plane of layer 0
        "key_bits_per_layer": layer_bits,  # full per-layer profile
        "key_bits_requant": 8,             # full plane on low confidence
        "value_bits": 8,
        "requant": q.enable_requant,
        "threshold": q.requant_threshold,
    }
