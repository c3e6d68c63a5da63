"""Checkpoint / resume: params + decode-state snapshots (orbax).

The reference has none (SURVEY.md §5: weights re-downloaded every run, sim
runs one-shot).  For preemptible TPU serving we snapshot both the weights
and the live DecodeState — the pruned/quantized KV cache, importance
accumulators, lengths, head masks — so a preempted replica resumes decoding
mid-stream without refetching or re-pruning."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax

from spatten_tpu.engine.state import DecodeState


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, params: Any, state: Optional[DecodeState] = None,
         extra: Any = None) -> None:
    """Write params (and optionally the live decode state, plus any small
    `extra` pytree — e.g. a supervisor's loop cursor) to `path`.

    `params=None` writes a state-only snapshot (the supervisor rotates
    these every window; rewriting immutable multi-GB weights each time
    would dominate the snapshot cadence)."""
    ckpt = _checkpointer()
    payload = {} if params is None else {"params": params}
    if state is not None:
        payload["state"] = state._asdict()
    if extra is not None:
        payload["extra"] = extra
    ckpt.save(os.path.abspath(path), payload)


def restore_with_extra(path: str
                       ) -> Tuple[Any, Optional[DecodeState], Any]:
    """Read (params, state-or-None, extra-or-None) from `path` with a
    single checkpoint read (the payload holds all three)."""
    payload = _checkpointer().restore(os.path.abspath(path))
    params, state = _payload_to_state(payload)
    return params, state, payload.get("extra")


def restore(path: str) -> Tuple[Any, Optional[DecodeState]]:
    """Read (params, state-or-None) from `path`."""
    ckpt = _checkpointer()
    payload = ckpt.restore(os.path.abspath(path))
    return _payload_to_state(payload)


def _payload_to_state(payload) -> Tuple[Any, Optional[DecodeState]]:
    params = payload.get("params")
    state = None
    if "state" in payload and payload["state"] is not None:
        d = payload["state"]
        from spatten_tpu.engine.kv_cache import LayerKVCache
        from spatten_tpu.ops.quantize import QuantizedKV

        def as_kv(x):
            def kv(t):
                return QuantizedKV(full=t["full"], msb=t.get("msb"),
                                   scale=t["scale"], lsb2=t.get("lsb2"))
            return LayerKVCache(k=kv(x["k"]), v=kv(x["v"]))
        cache = d["cache"]
        if not isinstance(cache, LayerKVCache):
            cache = as_kv(cache)
        import jax.numpy as _jnp
        num_layers = d["importance"].shape[0]
        layer_lengths = d.get("layer_lengths")
        if layer_lengths is None:       # pre-cascade checkpoints
            layer_lengths = _jnp.broadcast_to(
                _jnp.asarray(d["lengths"])[None], (num_layers,)
                + d["lengths"].shape).astype(_jnp.int32)
        quant_bits = d.get("quant_bits")
        if quant_bits is None:          # pre-profile checkpoints: 4-bit
            quant_bits = _jnp.full((num_layers,), 4, _jnp.int32)
        state = DecodeState(
            cache=cache, importance=d["importance"], lengths=d["lengths"],
            layer_lengths=layer_lengths,
            head_mask=d["head_mask"], requant_events=d["requant_events"],
            quant_bits=quant_bits,
        )
    return params, state
