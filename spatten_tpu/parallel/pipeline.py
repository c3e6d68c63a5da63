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


def pipeline_param_pspecs(params: Any, tp: bool = False) -> Any:
    """Layer stacks shard over "pipe"; with `tp`, each layer's weights
    additionally column/row-shard over "model" (the composed PP x TP
    layout); everything else replicated."""
    specs = {
        k: P(*([None] * v.ndim)) for k, v in params.items()
        if k != "layers"
    }
    if tp:
        from spatten_tpu.parallel.sharded import param_pspecs
        base = param_pspecs(params)["layers"]
        specs["layers"] = {k: P("pipe", *tuple(v)[1:])
                           for k, v in base.items()}
    else:
        specs["layers"] = {
            k: P("pipe", *([None] * (v.ndim - 1)))
            for k, v in params["layers"].items()
        }
    return specs


def pipeline_state_pspecs(state: DecodeState, tp: bool = False
                          ) -> DecodeState:
    from spatten_tpu.engine.kv_cache import LayerKVCache
    from spatten_tpu.ops.quantize import QuantizedKV

    if tp:
        # [L, B, C, Hkv*D] planes: layers over "pipe", fused head-lane
        # axis over "model" (sharded.py's TP layout with a pipe layer axis)
        plane = P("pipe", None, None, "model")
        scale = P("pipe", None, "model", None)

        def kv_spec(t):
            return QuantizedKV(
                full=plane, msb=plane if t.msb is not None else None,
                scale=scale,
                lsb2=plane if t.lsb2 is not None else None)

        return DecodeState(
            cache=LayerKVCache(k=kv_spec(state.cache.k),
                               v=kv_spec(state.cache.v)),
            importance=P("pipe", None, "model", None),
            lengths=P(),
            layer_lengths=P("pipe", None),
            head_mask=P("pipe", "model"),
            requant_events=P(),
            quant_bits=P("pipe"),
        )

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
    """P-stage pipelined decode over a Mesh with axis ("pipe",).

    `microbatches` M > 1 interleaves M batch slices through the stages
    (GPipe-style schedule over M + P - 1 ticks): while microbatch m is in
    stage p, microbatch m+1 occupies stage p-1, so the bubble fraction is
    (P-1)/(M+P-1) instead of the single-microbatch (P-1)/P.  The per-stage
    program is unchanged — scheduling slices the batch axis.
    """

    def __init__(self, cfg: SpAttenConfig, mesh: Mesh,
                 microbatches: int = 1):
        cfg.validate()
        if tuple(mesh.axis_names) not in (("pipe",), ("pipe", "model")):
            raise ValueError(
                "PipelineEngine expects a ('pipe',) or ('pipe','model') "
                "mesh")
        if cfg.engine.max_batch_size % microbatches:
            raise ValueError("microbatches must divide max_batch_size")
        self.microbatches = microbatches
        self.cfg = cfg
        self.mesh = mesh
        self.stages = mesh.shape["pipe"]
        self.tp = mesh.shape.get("model", 1)
        self.tp_axis = "model" if self.tp > 1 else None
        lcfg = pipeline_local_config(cfg, self.stages)
        if self.tp_axis is not None:
            from spatten_tpu.parallel.sharded import local_config
            lcfg = local_config(lcfg, mesh)
        self.lcfg = lcfg
        template = jax.eval_shape(
            lambda: init_state(cfg, cfg.engine.max_batch_size))
        self._state_specs = pipeline_state_pspecs(
            template, tp=self.tp_axis is not None)
        self._param_specs: Optional[Any] = None
        self._jit_cache: dict = {}

    def named(self, spec):
        return NamedSharding(self.mesh, spec)

    def shard_params(self, params: Any) -> Any:
        import numpy as np
        self._param_specs = pipeline_param_pspecs(
            params, tp=self.tp_axis is not None)

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
                layer_offset=stage * layers_local, tp_axis=self.tp_axis)
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
        req_axes = ("pipe",) if self.tp_axis is None else ("pipe", "model")
        global_req = jax.lax.psum(requants.sum(), req_axes)

        s = tokens.shape[1]
        new_state = state._replace(
            cache=cache, importance=imp,
            lengths=state.lengths + s,
            layer_lengths=layer_lengths,
            requant_events=state.requant_events + global_req,
        )
        return logits, new_state

    def _local_step_micro(self, params, state, tokens):
        """Microbatch-interleaved shard_map body (GPipe decode schedule).

        tokens [B, S] (replicated); the batch splits into M slices that
        flow through the P stages over M + P - 1 ticks; each tick every
        stage runs its local layers on its current slice and ppermutes the
        activations onward.  Output logits [B, V] (last query position)."""
        import spatten_tpu.engine.generate as gen
        stages, M = self.stages, self.microbatches
        lcfg = self.lcfg
        layers_local = lcfg.model.num_layers
        stage = jax.lax.axis_index("pipe")
        b, s = tokens.shape
        if b % M:
            raise ValueError(f"batch {b} must divide microbatches {M}")
        bm = b // M
        hidden = lcfg.model.hidden_size

        state, _ = gen.maybe_prune(lcfg, state, s)
        x_all, positions = transformer.embed_tokens(params, lcfg, state,
                                                    tokens)   # [B, S, D]

        def slice_b(leaf, m, axis):
            return jax.lax.dynamic_slice_in_dim(leaf, m * bm, bm, axis)

        def state_slice(st, m):
            return st._replace(
                cache=jax.tree.map(lambda a: slice_b(a, m, 1), st.cache),
                importance=slice_b(st.importance, m, 1),
                lengths=slice_b(st.lengths, m, 0),
                layer_lengths=slice_b(st.layer_lengths, m, 1),
            )

        def state_merge(st, sub, m, active):
            def wr(big, small):
                start = [jnp.int32(0)] * big.ndim
                start[1] = m * bm
                cur = jax.lax.dynamic_slice(
                    big, start, small.shape)
                upd = jnp.where(active, small.astype(big.dtype), cur)
                return jax.lax.dynamic_update_slice(big, upd, start)

            cache = jax.tree.map(wr, st.cache, sub.cache)
            imp = wr(st.importance, sub.importance)
            ll = wr(st.layer_lengths[:, :, None],
                    sub.layer_lengths[:, :, None])[:, :, 0]
            return st._replace(cache=cache, importance=imp,
                               layer_lengths=ll)

        logits_all = jnp.zeros((b, lcfg.model.vocab_size), jnp.float32)
        requants = jnp.zeros((), jnp.int32)
        x_inflight = jnp.zeros((bm, s, hidden),
                               x_all.dtype)

        for t in range(M + stages - 1):
            my_m = t - stage                 # this stage's microbatch id
            active = (my_m >= 0) & (my_m < M)
            mc = jnp.clip(my_m, 0, M - 1)
            # stage 0 reads the embedded slice; later stages consume the
            # activations ppermuted from their predecessor
            x_in = jnp.where(stage == 0,
                             slice_b(x_all, mc, 0), x_inflight)
            sub = state_slice(state, mc)
            pos_m = slice_b(positions, mc, 0)

            def run(carry):
                x_in, sub = carry
                out, cache, imp, ll, req, _ = transformer.run_layers(
                    params["layers"], lcfg, sub, x_in, pos_m,
                    layer_offset=stage * layers_local,
                    tp_axis=self.tp_axis)
                return out, sub._replace(cache=cache, importance=imp,
                                         layer_lengths=ll), req.sum()

            def skip(carry):
                x_in, sub = carry
                return x_in, sub, jnp.zeros((), jnp.int32)

            x_out, sub2, req = jax.lax.cond(active, run, skip,
                                            (x_in, sub))
            state = state_merge(state, sub2, mc, active)
            requants = requants + jnp.where(active, req, 0)

            # the final stage emits this microbatch's logits
            lg = transformer.lm_head(params, lcfg, x_out[:, -1:])[:, 0]
            emit = active & (stage == stages - 1)
            cur = jax.lax.dynamic_slice_in_dim(logits_all, mc * bm, bm, 0)
            logits_all = jax.lax.dynamic_update_slice_in_dim(
                logits_all, jnp.where(emit, lg.astype(jnp.float32), cur),
                mc * bm, 0)

            if t < M + stages - 2:
                x_inflight = jax.lax.ppermute(
                    x_out, "pipe",
                    [(i, (i + 1) % stages) for i in range(stages)])

        # every stage holds its own layers' updated state; logits live on
        # the last stage — broadcast via masked psum
        logits_all = jax.lax.psum(
            jnp.where(stage == stages - 1, logits_all, 0.0), "pipe")
        req_axes = ("pipe",) if self.tp_axis is None else ("pipe", "model")
        global_req = jax.lax.psum(requants, req_axes)
        new_state = state._replace(
            lengths=state.lengths + s,
            requant_events=state.requant_events + global_req,
        )
        return logits_all, new_state

    def step_fn(self, seq_len: int):
        key = ("step", seq_len)
        if key not in self._jit_cache:
            assert self._param_specs is not None, "call shard_params first"
            body = (self._local_step if self.microbatches == 1
                    else self._local_step_micro)
            mapped = jax.shard_map(
                body,
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
