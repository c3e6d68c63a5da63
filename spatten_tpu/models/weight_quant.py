"""Weight-only int8 quantization for serving.

Decode is HBM-bandwidth bound; streaming bf16 weights costs 2 bytes/param
per step.  Symmetric per-output-channel int8 halves that (the standard
"weight-only int8" serving recipe — the BASELINE.md north star is framed
against a dense-INT8 baseline, so both the dense and SpAtten engines run
on the same quantized weights).

A quantized matrix is a dict ``{"qw": int8, "ws": f32 scale}`` where the
scale is per output channel (exact under matmul: ``x @ (qw * ws) ==
(x @ qw) * ws``).  The embedding table quantizes per row (exact for both
the row lookup and the tied lm_head, whose output channels are the vocab
rows).  Norm weights and biases stay in bf16 — they are O(D) per layer.

This is a pure params-tree transform: `transformer.forward` consumes
either representation (the matmul helper dispatches on the leaf type),
so quantization composes with sharding, checkpointing, and the HF loader
without config plumbing.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

# weights quantized per output channel: every layer matrix is stacked
# [L, in, out], so the contracting axis is 1
_LAYER_CONTRACT_AXIS = {
    "wq": 1, "wk": 1, "wv": 1, "wo": 1,
    "w_gate": 1, "w_up": 1, "w_down": 1,
}


def _quant_matrix(w, axis: int) -> Dict[str, Any]:
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    qw = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"qw": qw, "ws": jnp.squeeze(scale, axis=axis)}


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every matmul weight of a transformer.init_params tree."""
    out = dict(params)
    layers = dict(params["layers"])
    for name, axis in _LAYER_CONTRACT_AXIS.items():
        if name in layers:
            layers[name] = _quant_matrix(layers[name], axis)
    out["layers"] = layers
    # embedding: per-row scales (exact for lookup AND tied lm_head)
    out["embed"] = _quant_matrix(params["embed"], axis=1)
    if "lm_head" in params:           # [D, V]: per-vocab-column scales
        out["lm_head"] = _quant_matrix(params["lm_head"], axis=0)
    if "wpe" in params:
        out["wpe"] = _quant_matrix(params["wpe"], axis=1)
    return out


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "qw" in w


def matmul(x, w):
    """x @ w for a plain array or a quantized {"qw","ws"} matrix."""
    if is_quantized(w):
        y = jnp.matmul(x, w["qw"].astype(x.dtype))
        return (y.astype(jnp.float32) * w["ws"]).astype(x.dtype)
    return jnp.matmul(x, w)


def matmul_t(x, w):
    """x @ w.T (tied lm_head): output channels are w's rows."""
    if is_quantized(w):
        y = jnp.matmul(x, w["qw"].T.astype(x.dtype))
        return (y.astype(jnp.float32) * w["ws"]).astype(x.dtype)
    return jnp.matmul(x, w.T)


def take_rows(w, idx):
    """Row lookup (embedding / positional tables)."""
    if is_quantized(w):
        rows = jnp.take(w["qw"], idx, axis=0).astype(jnp.float32)
        return rows * jnp.take(w["ws"], idx, axis=0)[..., None]
    return jnp.take(w, idx, axis=0)
