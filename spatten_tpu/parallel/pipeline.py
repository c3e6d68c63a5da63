"""Pipeline parallelism: layer stages over a "pipe" mesh axis.

Absent from the reference (SURVEY.md §2.9 — its only pipeline is the
chip's internal 15-stage request pipeline); needed for models whose
weights exceed one chip (70B-class).  Design:

* parameters and decode state are layer-stacked `[L, ...]`; sharding them
  `P("pipe")` on the layer axis gives each device a contiguous stage of
  `L/P` layers AND its stage's share of the pruned KV cache — pruning
  state remains fully stage-local, like the TP case.
* inside shard_map, activations flow stage to stage with `ppermute`; each
  stage runs its local `run_layers` only on its turn (`lax.cond`), so per
  token the pipeline does P-1 hops of a [B, S, D] buffer over ICI.
* embedding/lm_head weights are replicated (cheap relative to layers);
  the final stage computes logits, broadcast back with a masked psum.

This is the correctness-first (bubble-accepted) formulation: one
microbatch fills one stage at a time.  Throughput-oriented microbatch
interleaving composes on top by batch-splitting the decode step — the
scheduling is host-side and the per-stage program is unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatten_tpu.config import SpAttenConfig
from spatten_tpu.engine.state import DecodeState, init_state
from spatten_tpu.models import transformer


def pipeline_local_config(cfg: SpAttenConfig, stages: int) -> SpAttenConfig:
    m = cfg.model
    if m.num_layers % stages:
        raise ValueError(
            f"num_layers {m.num_layers} must divide stages {stages}")
    return dataclasses.replace(
        cfg, model=dataclasses.replace(
            m, num_layers=m.num_layers // stages))


def pipeline_param_pspecs(params: Any) -> Any:
    """Layer stacks shard over "pipe"; everything else replicated."""
    specs = {
        k: P(*([None] * v.ndim)) for k, v in params.items()
        if k != "layers"
    }
    specs["layers"] = {
        k: P("pipe", *([None] * (v.ndim - 1)))
        for k, v in params["layers"].items()
    }
    return specs


def pipeline_state_pspecs(state: DecodeState) -> DecodeState:
    def layer_leaf(leaf):
        return P("pipe", *([None] * (leaf.ndim - 1)))

    return DecodeState(
        cache=jax.tree.map(layer_leaf, state.cache),
        importance=P("pipe", None, None, None),
        lengths=P(),
        layer_lengths=P("pipe", None),
        head_mask=P("pipe", None),
        requant_events=P(),
        quant_bits=P("pipe"),      # [L] layer axis rides the stage shard
    )


class PipelineEngine:
    """P-stage pipelined decode over a Mesh with axis ("pipe",)."""

    def __init__(self, cfg: SpAttenConfig, mesh: Mesh):
        cfg.validate()
        if tuple(mesh.axis_names) != ("pipe",):
            raise ValueError("PipelineEngine expects a ('pipe',) mesh")
        self.cfg = cfg
        self.mesh = mesh
        self.stages = mesh.shape["pipe"]
        self.lcfg = pipeline_local_config(cfg, self.stages)
        template = jax.eval_shape(
            lambda: init_state(cfg, cfg.engine.max_batch_size))
        self._state_specs = pipeline_state_pspecs(template)
        self._param_specs: Optional[Any] = None
        self._jit_cache: dict = {}

    def named(self, spec):
        return NamedSharding(self.mesh, spec)

    def shard_params(self, params: Any) -> Any:
        import numpy as np
        self._param_specs = pipeline_param_pspecs(params)

        def put(a, spec):
            a = np.asarray(a)
            return jax.make_array_from_callback(
                a.shape, self.named(spec), lambda idx: a[idx])

        return jax.tree.map(put, params, self._param_specs)

    def init_sharded_state(self, batch: Optional[int] = None) -> DecodeState:
        b = batch if batch is not None else self.cfg.engine.max_batch_size
        shardings = jax.tree.map(self.named, self._state_specs)
        return jax.jit(lambda: init_state(self.cfg, b),
                       out_shardings=shardings)()

    def _local_step(self, params, state, tokens):
        """shard_map body: tokens [B, S] (replicated) -> logits of the
        LAST query position [B, V] (replicated) + updated local state."""
        import spatten_tpu.engine.generate as gen
        lcfg = self.lcfg
        stages = self.stages
        layers_local = lcfg.model.num_layers
        stage = jax.lax.axis_index("pipe")

        # capacity-triggered cascade pruning: lengths are replicated, so
        # every stage prunes its local layers' caches in the same step
        state, _ = gen.maybe_prune(lcfg, state, tokens.shape[1])

        x, positions = transformer.embed_tokens(params, lcfg, state,
                                                tokens)

        def my_turn(carry):
            x, _cache, _imp, _ll, _req, _maxp = carry
            out, cache, imp, ll, req, maxp = transformer.run_layers(
                params["layers"], lcfg, state, x, positions,
                layer_offset=stage * layers_local)
            return out, cache, imp, ll, req, maxp

        def skip(carry):
            return carry

        carry = (
            x, state.cache, state.importance, state.layer_lengths,
            jnp.zeros((layers_local,), jnp.int32),
            jnp.zeros((layers_local, x.shape[0],
                       lcfg.model.num_kv_heads), jnp.float32),
        )
        for p_ in range(stages):
            carry = jax.lax.cond(stage == p_, my_turn, skip, carry)
            if p_ < stages - 1:
                x_c, *rest = carry
                x_c = jax.lax.ppermute(
                    x_c, "pipe",
                    [(i, (i + 1) % stages) for i in range(stages)])
                carry = (x_c, *rest)

        x, cache, imp, layer_lengths, requants, max_probs = carry
        logits = transformer.lm_head(params, lcfg, x[:, -1:])[:, 0]
        # only the final stage holds real logits; broadcast via masked psum
        logits = jax.lax.psum(
            jnp.where(stage == stages - 1, logits, 0.0), "pipe")
        global_req = jax.lax.psum(requants.sum(), "pipe")

        s = tokens.shape[1]
        new_state = state._replace(
            cache=cache, importance=imp,
            lengths=state.lengths + s,
            layer_lengths=layer_lengths,
            requant_events=state.requant_events + global_req,
        )
        return logits, new_state

    def step_fn(self, seq_len: int):
        key = ("step", seq_len)
        if key not in self._jit_cache:
            assert self._param_specs is not None, "call shard_params first"
            mapped = jax.shard_map(
                self._local_step,
                mesh=self.mesh,
                in_specs=(self._param_specs, self._state_specs, P()),
                out_specs=(P(), self._state_specs),
                check_vma=False,
            )
            self._jit_cache[key] = jax.jit(mapped, donate_argnums=(1,))
        return self._jit_cache[key]

    def generate(self, params, prompt: jax.Array, max_new_tokens: int
                 ) -> jax.Array:
        """Greedy pipelined generation (prefill chunks + decode)."""
        import numpy as np
        b, prompt_len = prompt.shape
        state = self.init_sharded_state(b)
        chunk = self.cfg.engine.prefill_chunk
        pos, logits = 0, None
        while pos < prompt_len:
            n = min(chunk, prompt_len - pos)
            logits, state = self.step_fn(n)(
                params, state, jnp.asarray(prompt[:, pos:pos + n]))
            pos += n
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs = []
        for _ in range(max_new_tokens):
            outs.append(token)
            logits, state = self.step_fn(1)(params, state, token[:, None])
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jnp.stack(outs, axis=1)
