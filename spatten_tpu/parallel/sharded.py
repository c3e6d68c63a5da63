"""Sharded serving: DP(batch) x TP(heads) decode over a jax Mesh.

Layout (the Megatron/scaling-book recipe, expressed with shard_map so the
Pallas decode kernel sees local shards):

  weights   wq/wk/wv [L, D, H*dh]   -> P(None, None, "model")   (column)
            wo       [L, H*dh, D]   -> P(None, "model", None)   (row)
            w_gate/up [L, D, I]     -> P(None, None, "model")
            w_down   [L, I, D]      -> P(None, "model", None)
            norms / embed / lm_head -> replicated
  state     cache+importance [L, B, Hkv, ...] -> P(None, "data", "model")
            lengths  [B]            -> P("data")
            head_mask [L, Hq]       -> P(None, "model")
  activ     x [B, S, D] data-sharded, replicated over model; two psums per
            layer (o_proj, down_proj) ride ICI.

Per-head importance accumulation, top-k token pruning, V pruning, and the
requant decision are all *per kv-head* — they shard over "model" with zero
communication, which is the TPU payoff of SpAtten's per-head design.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatten_tpu.config import SpAttenConfig
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine.state import DecodeState, init_state
from spatten_tpu.models import transformer


def local_config(cfg: SpAttenConfig, mesh: Mesh) -> SpAttenConfig:
    """Config describing one model-shard's slice (local head counts)."""
    tp = mesh.shape["model"]
    m = cfg.model
    if m.num_heads % tp or m.num_kv_heads % tp or m.intermediate_size % tp:
        raise ValueError(
            f"heads {m.num_heads}/{m.num_kv_heads} and intermediate "
            f"{m.intermediate_size} must divide tp={tp}"
        )
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            m,
            num_heads=m.num_heads // tp,
            num_kv_heads=m.num_kv_heads // tp,
            intermediate_size=m.intermediate_size // tp,
        ),
    )


def param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree for a transformer.init_params tree."""
    col3 = P(None, None, "model")    # [L, D, out_sharded]
    row3 = P(None, "model", None)    # [L, in_sharded, D]
    col2 = P(None, "model")          # [L, out_sharded]
    layer_rules = {
        "wq": col3, "wk": col3, "wv": col3, "wo": row3,
        "bq": col2, "bk": col2, "bv": col2, "bo": P(None, None),
        "w_gate": col3, "w_up": col3, "w_down": row3,
        "b_up": col2, "b_down": P(None, None),
        "attn_norm_w": P(None, None), "attn_norm_b": P(None, None),
        "mlp_norm_w": P(None, None), "mlp_norm_b": P(None, None),
    }
    specs = {
        "embed": P(None, None),
        "final_norm_w": P(None),
        "layers": {k: layer_rules[k] for k in params["layers"]},
    }
    if "final_norm_b" in params:
        specs["final_norm_b"] = P(None)
    if "wpe" in params:
        specs["wpe"] = P(None, None)
    if "lm_head" in params:
        specs["lm_head"] = P(None, None)
    return specs


def state_pspecs(state: DecodeState) -> DecodeState:
    """PartitionSpec pytree for a DecodeState."""
    from spatten_tpu.engine.kv_cache import LayerKVCache
    from spatten_tpu.ops.quantize import QuantizedKV
    # token-major planes [L, B, C, Hkv*D]: heads live in the fused lane
    # axis -> shard the last axis over "model"; scales are [L, B, Hkv, C].
    # Optional nibble planes mirror whatever the template state carries.
    plane = P(None, "data", None, "model")
    scale = P(None, "data", "model", None)

    def kv_spec(t: QuantizedKV) -> QuantizedKV:
        return QuantizedKV(
            full=plane,
            msb=plane if t.msb is not None else None,
            scale=scale,
            lsb2=plane if t.lsb2 is not None else None)

    cache_specs = LayerKVCache(k=kv_spec(state.cache.k),
                               v=kv_spec(state.cache.v))

    return DecodeState(
        cache=cache_specs,
        importance=P(None, "data", "model", None),
        lengths=P("data"),
        layer_lengths=P(None, "data"),
        head_mask=P(None, "model"),
        requant_events=P(),
        quant_bits=P(),            # per-layer policy array, replicated
    )


class ShardedEngine:
    """Builds and caches the jitted shard_map'd step functions."""

    def __init__(self, cfg: SpAttenConfig, mesh: Mesh):
        cfg.validate()
        if cfg.engine.max_batch_size % mesh.shape["data"]:
            raise ValueError("batch must divide the data axis")
        self.cfg = cfg
        self.mesh = mesh
        self.lcfg = local_config(cfg, mesh)

        template = jax.eval_shape(
            lambda: init_state(cfg, cfg.engine.max_batch_size))
        self._state_specs = state_pspecs(template)
        self._param_specs: Optional[Any] = None

        lcfg = self.lcfg

        def _prefill(params, state, tokens):
            state, _ = gen.maybe_prune(lcfg, state, tokens.shape[1])
            logits, state, aux = transformer.forward(
                params, lcfg, state, tokens, tp_axis="model")
            # fold the *global* requant count into the replicated counter
            global_req = jax.lax.psum(aux.requant_events, ("data", "model"))
            prev = state.requant_events - aux.requant_events
            state = state._replace(requant_events=prev + global_req)
            return logits[:, -1], state

        def _decode(params, state, token):
            state, _ = gen.maybe_prune(lcfg, state, 1)
            logits, state, aux = transformer.forward(
                params, lcfg, state, token[:, None], tp_axis="model")
            global_req = jax.lax.psum(aux.requant_events, ("data", "model"))
            prev = state.requant_events - aux.requant_events
            state = state._replace(requant_events=prev + global_req)
            next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return next_token, state

        self._jit_cache: dict = {}
        self._prefill_fn = _prefill
        self._decode_fn = _decode

    # -- sharding helpers ---------------------------------------------------

    def named(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def shard_params(self, params: Any) -> Any:
        """Distribute a host-local parameter tree onto the mesh.

        Uses `make_array_from_callback`, which also works multi-host: every
        process passes its (identical) host copy and contributes only the
        shards its local devices own."""
        import numpy as np
        self._param_specs = param_pspecs(params)

        def put(a, spec):
            a = np.asarray(a)
            return jax.make_array_from_callback(
                a.shape, self.named(spec), lambda idx: a[idx])

        return jax.tree.map(put, params, self._param_specs)

    def init_sharded_state(self, batch: Optional[int] = None) -> DecodeState:
        """Create the decode state directly on-device with its shardings
        (no host transfer; multi-host safe)."""
        b = batch if batch is not None else self.cfg.engine.max_batch_size
        shardings = jax.tree.map(self.named, self._state_specs)
        make = jax.jit(lambda: init_state(self.cfg, b),
                       out_shardings=shardings)
        return make()

    # -- jitted steps -------------------------------------------------------

    def _shard_mapped(self, fn, token_spec):
        assert self._param_specs is not None, "call shard_params first"
        mapped = jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(self._param_specs, self._state_specs, token_spec),
            out_specs=(P("data"), self._state_specs)
            if token_spec == P("data") else (P("data", None),
                                             self._state_specs),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(1,))

    def prefill_step(self):
        key = "prefill"
        if key not in self._jit_cache:
            self._jit_cache[key] = self._shard_mapped(
                self._prefill_fn, P("data", None))
        return self._jit_cache[key]

    def decode_step(self):
        key = "decode"
        if key not in self._jit_cache:
            self._jit_cache[key] = self._shard_mapped(
                self._decode_fn, P("data"))
        return self._jit_cache[key]

    # -- generation ---------------------------------------------------------

    def generate(self, params, prompt: jax.Array, max_new_tokens: int,
                 eos_token_id: Optional[int] = None) -> jax.Array:
        """Greedy generation on the mesh; prompt [B, S] -> [B, new]."""
        import numpy as np
        b, prompt_len = prompt.shape
        state = self.init_sharded_state(b)
        prompt_np = np.asarray(prompt)
        prompt = jax.make_array_from_callback(
            prompt_np.shape, self.named(P("data", None)),
            lambda idx: prompt_np[idx])

        prefill, decode = self.prefill_step(), self.decode_step()
        chunk = self.cfg.engine.prefill_chunk
        pos, last_logits = 0, None
        while pos < prompt_len:
            n = min(chunk, prompt_len - pos)
            last_logits, state = prefill(params, state, prompt[:, pos:pos + n])
            pos += n

        token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        outs = []
        done = jnp.zeros((b,), bool)
        for _ in range(max_new_tokens):
            outs.append(token)
            next_token, state = decode(params, state, token)
            if eos_token_id is not None:
                done = done | (token == eos_token_id)
                next_token = jnp.where(done, eos_token_id, next_token)
            token = next_token
        return jnp.stack(outs, axis=1)
