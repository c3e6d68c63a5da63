"""Functional transformer with a SpAtten attention core.

One generic decoder covers both model families (config-switched):

* Llama-class: RMSNorm, RoPE (pos-shift), SwiGLU MLP, optional GQA.
* GPT-2-class: LayerNorm(+bias), learned absolute positions, GELU MLP,
  optional per-layer attention scaling.

Design notes (TPU-first):
* Parameters are a plain pytree with **layer-stacked** arrays `[L, ...]`;
  the forward pass is a single `lax.scan` over layers, so XLA compiles one
  layer body regardless of depth and the KV cache/importance state scans
  along with it.
* The attention core consumes the quantized two-plane KV cache and emits
  the SpAtten signals (importance deltas, requant decisions) as scan
  outputs; the surrounding engine folds them into the decode state.
* Replaces the reference's monkey-patched HF forward
  (spatten_llm/pos_shift/modify_llama.py:31-181) with a from-scratch
  functional model — no torch, no module mutation.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from spatten_tpu.config import ModelConfig, SpAttenConfig
from spatten_tpu.engine.kv_cache import LayerKVCache, append_tokens
from spatten_tpu.engine.state import DecodeState
from spatten_tpu.ops import rope as rope_ops
from spatten_tpu.ops.attention_ref import spatten_attention_reference
from spatten_tpu.models.weight_quant import (
    matmul as _mm, matmul_t as _mm_t, take_rows as _take_rows,
)
from spatten_tpu.ops.fused_decode import fused_decode_attention
from spatten_tpu.ops.prefill_attention import prefill_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array,
                dtype=jnp.bfloat16) -> Params:
    m = cfg
    keys = iter(jax.random.split(key, 16))

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(dtype)

    L, D, I = m.num_layers, m.hidden_size, m.intermediate_size
    hq, hkv, dh = m.num_heads, m.num_kv_heads, m.head_dim

    layers = {
        "attn_norm_w": jnp.ones((L, D), dtype),
        "wq": dense(next(keys), (L, D, hq * dh), D),
        "wk": dense(next(keys), (L, D, hkv * dh), D),
        "wv": dense(next(keys), (L, D, hkv * dh), D),
        "wo": dense(next(keys), (L, hq * dh, D), hq * dh),
        "mlp_norm_w": jnp.ones((L, D), dtype),
        "w_up": dense(next(keys), (L, D, I), D),
        "w_down": dense(next(keys), (L, I, D), I),
    }
    if m.activation == "silu":
        layers["w_gate"] = dense(next(keys), (L, D, I), D)
    if m.layernorm_kind == "layernorm":
        layers["attn_norm_b"] = jnp.zeros((L, D), dtype)
        layers["mlp_norm_b"] = jnp.zeros((L, D), dtype)
    if m.use_qkv_bias:
        layers["bq"] = jnp.zeros((L, hq * dh), dtype)
        layers["bk"] = jnp.zeros((L, hkv * dh), dtype)
        layers["bv"] = jnp.zeros((L, hkv * dh), dtype)
        layers["bo"] = jnp.zeros((L, D), dtype)
    if m.use_mlp_bias:
        layers["b_up"] = jnp.zeros((L, I), dtype)
        layers["b_down"] = jnp.zeros((L, D), dtype)

    params: Params = {
        "embed": dense(next(keys), (m.vocab_size, D), D),
        "layers": layers,
        "final_norm_w": jnp.ones((D,), dtype),
    }
    if m.layernorm_kind == "layernorm":
        params["final_norm_b"] = jnp.zeros((D,), dtype)
    if m.use_abs_pos_emb:
        params["wpe"] = dense(next(keys), (m.max_position_embeddings, D), D)
    if not m.tie_word_embeddings:
        params["lm_head"] = dense(next(keys), (D, m.vocab_size), D)
    return params


def num_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def compact_head_params(params: Params, cfg, head_mask: jax.Array) -> dict:
    """Physically compact the attention projections to the KEPT heads.

    Permanent head pruning (head_update_interval == 0: the per-layer
    mask is derived once, post-prefill): gather each layer's kept head
    columns of wq/wk/wv (+ qkv biases) and kept rows of wo into dense
    matrices, so decode streams only live-head weight bytes.  The
    reference's pruned heads never issue requests (missing CSV rows,
    SURVEY.md §2.8); with compaction they stop costing projection
    bandwidth and FLOPs too.  The KV cache keeps its full head layout
    (compact K/V scatter into their physical slots; the kernel's
    per-head fetch gating already skips dead slabs).

    Returns {"layers": compacted stacked leaves, "kept_q": int32 [L, kq],
    "kept_kv": int32 [L, kkv]} for forward(head_compact=...).  Exact:
    outputs equal the masked (uncompacted) forward bit-for-bit.
    """
    from spatten_tpu.models.weight_quant import is_quantized
    m, p = cfg.model, cfg.pruning
    L, hq, hkv, dh = m.num_layers, m.num_heads, m.num_kv_heads, m.head_dim
    group = hq // hkv
    kg = min(p.head_keep, hkv)
    gmask = head_mask.reshape(L, hkv, group).any(-1)          # [L, Hkv]
    # kept kv-group indices, sorted (stable physical order); the mask
    # keeps exactly head_keep groups per layer (engine.policy)
    score = gmask.astype(jnp.int32) * (2 * hkv) - jnp.arange(hkv)[None]
    kept_kv = jnp.sort(jax.lax.top_k(score, kg)[1], axis=-1)  # [L, kg]
    kept_q = (kept_kv[:, :, None] * group
              + jnp.arange(group)[None, None, :]).reshape(L, kg * group)

    def lanes(idx):                       # [L, k] -> [L, k*dh]
        return (idx[:, :, None] * dh
                + jnp.arange(dh)[None, None, :]).reshape(idx.shape[0], -1)

    def g_out(w, li):                     # gather output-channel lanes
        if is_quantized(w):
            return {"qw": jnp.take_along_axis(w["qw"], li[:, None, :], 2),
                    "ws": jnp.take_along_axis(w["ws"], li, 1)}
        return jnp.take_along_axis(w, li[:, None, :], 2)

    def g_in(w, li):                      # gather input-row lanes (wo)
        if is_quantized(w):
            return {"qw": jnp.take_along_axis(w["qw"], li[:, :, None], 1),
                    "ws": w["ws"]}
        return jnp.take_along_axis(w, li[:, :, None], 1)

    lq, lkv = lanes(kept_q), lanes(kept_kv)
    layers = dict(params["layers"])
    layers["wq"] = g_out(layers["wq"], lq)
    layers["wk"] = g_out(layers["wk"], lkv)
    layers["wv"] = g_out(layers["wv"], lkv)
    layers["wo"] = g_in(layers["wo"], lq)
    for bn, li in (("bq", lq), ("bk", lkv), ("bv", lkv)):
        if bn in layers:
            layers[bn] = jnp.take_along_axis(layers[bn], li, 1)
    return {"layers": layers, "kept_q": kept_q, "kept_kv": kept_kv}


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _norm(x: jax.Array, w: jax.Array, b: jax.Array | None, kind: str,
          eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    if kind == "rmsnorm":
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    elif kind == "layernorm":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
    else:
        raise ValueError(kind)
    return out.astype(x.dtype)


def _mlp(x: jax.Array, lp: Params, activation: str) -> jax.Array:
    """Up/gate/down MLP *without* the down bias (added by the caller after
    any tensor-parallel psum, so it isn't summed once per shard)."""
    if activation == "silu":
        gate = jax.nn.silu(_mm(x, lp["w_gate"]))
        up = _mm(x, lp["w_up"])
        if "b_up" in lp:
            up = up + lp["b_up"]
        return _mm(gate * up, lp["w_down"])
    elif activation == "gelu":
        h = _mm(x, lp["w_up"])
        if "b_up" in lp:
            h = h + lp["b_up"]
        h = jax.nn.gelu(h, approximate=True)
        return _mm(h, lp["w_down"])
    raise ValueError(activation)


# ---------------------------------------------------------------------------
# Forward step
# ---------------------------------------------------------------------------

class StepAux(NamedTuple):
    """Per-call aggregate pruning/quant telemetry."""

    requant_events: jax.Array   # int32 [] — (layer, batch, kv_head) requants
    max_probs: jax.Array        # f32 [L, B, Hkv]


def embed_tokens(params: Params, cfg: SpAttenConfig, state: DecodeState,
                 tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Token (+ absolute position) embedding.  Returns (x, positions)."""
    m = cfg.model
    s = tokens.shape[1]
    x = _take_rows(params["embed"], tokens)                # [B, S, D]
    positions = state.lengths[:, None] + jnp.arange(s)[None, :]   # [B, S]
    if m.use_abs_pos_emb:
        x = x + _take_rows(params["wpe"], positions)
    return x, positions


def lm_head(params: Params, cfg: SpAttenConfig, x: jax.Array) -> jax.Array:
    m = cfg.model
    x = _norm(x, params["final_norm_w"], params.get("final_norm_b"),
              m.layernorm_kind, m.norm_eps)
    if m.tie_word_embeddings:
        logits = _mm_t(x, params["embed"])
    else:
        logits = _mm(x, params["lm_head"])
    return logits.astype(jnp.float32)


def run_layers(
    layer_params: Params,       # stacked [L_local, ...]
    cfg: SpAttenConfig,         # cfg.model.num_layers == L_local
    state: DecodeState,         # leaves stacked [L_local, ...]
    x: jax.Array,               # [B, S, D]
    positions: jax.Array,       # [B, S]
    layer_offset: jax.Array | int = 0,    # global index of local layer 0
    tp_axis: str | None = None,
    rope_tables: Tuple[jax.Array, jax.Array] | None = None,
    head_kept: Tuple[jax.Array, jax.Array] | None = None,  # (kept_q [L,kq],
                                # kept_kv [L,kkv]) — layer_params are then
                                # the COMPACTED leaves (compact_head_params)
):
    """Scan x through a (possibly local) stack of layers, appending the S
    tokens to each layer's cache.  Returns
    (x, new_cache, new_importance, new_layer_lengths, requants,
    max_probs).

    `rope_tables`: precomputed (cos, sin) [capacity, head_dim].  Callers
    that invoke forward inside a scanned decode loop MUST compute the
    tables once outside the scan and thread them in — XLA does not hoist
    the [cap, d] sin/cos materialization out of while-loops, and at
    serving capacities recomputing it per decode step costs more than the
    attention itself."""
    m, p, q, e = cfg.model, cfg.pruning, cfg.quant, cfg.engine
    b, s = x.shape[0], x.shape[1]
    hq, hkv, dh = m.num_heads, m.num_kv_heads, m.head_dim
    cap = state.capacity

    if rope_tables is None:
        rope_tables = rope_ops.rope_table(cap, dh, m.rope_theta)
    cos, sin = rope_tables

    base_scale = 1.0 / math.sqrt(dh)
    v_keep_layers = (0,)
    if p.enable_v_pruning:
        # PER-LAYER value fetch budgets relative to each layer's key
        # budget (the reference traces show value_fetch_num scaling with
        # the layer's key_fetch_num, ≈ 0.2-0.35x, CSV cols 6/12) — with a
        # cascade schedule deep layers keep few tokens, so a global
        # budget would barely prune them.  Steady-state key budget per
        # layer = start + cascade budget + recent.
        if p.enable_token_pruning:
            from spatten_tpu.pruning.token_pruning import \
                layer_budgets_static
            budgets = layer_budgets_static(p, m.num_layers)
            kb_l = [p.start_size + bl + p.recent_size for bl in budgets]
        else:
            kb_l = [cap] * m.num_layers
        v_keep_layers = tuple(
            max(p.v_block_size, int(p.v_keep_ratio * kb)) for kb in kb_l)

    track_importance = p.enable_token_pruning or p.enable_head_pruning
    on_cpu = jax.default_backend() == "cpu"
    rope_in_kernel_ok = m.use_abs_pos_emb or e.rope_mode == "cached"
    # Decode (single query) takes the fused Pallas kernel (append +
    # attention + P·V in one pallas_call; the STACKED cache planes alias
    # in place, indexed by a layer scalar — see fused_decode's stacked
    # mode).  Per-layer attention scale (GPT-2) folds into the queries
    # since the kernel's sm_scale must be static.  Prefill chunks use the
    # streaming jnp path (XLA fuses those fine).  The kernel computes no
    # RoPE (queries arrive rotated; keys are cached-rotated or abs-pos),
    # so "read" rope mode keeps the jnp path.  The token-major cache
    # layout needs the fused lane width Hkv*D to be 128-aligned on
    # hardware — GPT-2's 12x64 = 768 qualifies (interpret mode covers
    # every shape in tests).
    use_kernel = (
        e.use_pallas and s == 1 and rope_in_kernel_ok
        and ((hkv * dh) % 128 == 0 or on_cpu)
        # the kernel's 6-bit path needs its 8-row lsb2 append RMW to fit
        and not (q.needs_lsb2 and e.cache_capacity < 32)
    )

    def qkv(x, lp, lengths_l, layer_idx, kept=None):
        """Shared attention prologue: norms, projections, RoPE.

        `kept`: (kept_q_l [kq], kept_kv_l [kkv]) when the projections are
        head-compacted — compute on the compact width, then scatter into
        the physical head slots (dead heads get exact zeros, identical to
        the masked uncompacted forward)."""
        h = _norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"),
                  m.layernorm_kind, m.norm_eps)
        qh = _mm(h, lp["wq"]) + lp.get("bq", 0)
        kh = _mm(h, lp["wk"]) + lp.get("bk", 0)
        vh = _mm(h, lp["wv"]) + lp.get("bv", 0)
        nq = hq if kept is None else kept[0].shape[0]
        nkv = hkv if kept is None else kept[1].shape[0]
        qh = qh.reshape(b, s, nq, dh).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, s, nkv, dh).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, s, nkv, dh).transpose(0, 2, 1, 3)
        if kept is not None:
            qh = jnp.zeros((b, hq, s, dh), qh.dtype).at[:, kept[0]].set(qh)
            kh = jnp.zeros((b, hkv, s, dh), kh.dtype).at[:, kept[1]].set(kh)
            vh = jnp.zeros((b, hkv, s, dh), vh.dtype).at[:, kept[1]].set(vh)

        # per-layer cache positions: with a cascade schedule each layer's
        # cache holds a different number of live tokens, so the pos-shift
        # positions (slot indices) are per layer
        pos_l = jnp.minimum(lengths_l[:, None] + jnp.arange(s)[None, :],
                            cap - 1)                       # [B, S]

        if not m.use_abs_pos_emb:
            # pos-shift: rotate queries at their cache positions; keys are
            # cached unrotated and rotated at read time inside attention
            # ("read" mode), or rotated here before caching ("cached"
            # mode — the prune path re-rotates survivors by their slot
            # delta, see engine.generate.maybe_prune).
            c = jnp.take(cos, pos_l, axis=0)[:, None]       # [B,1,S,dh]
            sn = jnp.take(sin, pos_l, axis=0)[:, None]
            qh = (qh * c + rope_ops.rotate_half(qh) * sn).astype(qh.dtype)
            if e.rope_mode == "cached":
                kh = (kh * c + rope_ops.rotate_half(kh) * sn
                      ).astype(kh.dtype)

        sm_scale = base_scale
        if m.use_attn_scale_by_layer:
            sm_scale = base_scale / (
                (layer_idx + layer_offset).astype(jnp.float32) + 1.0)
        return qh, kh, vh, pos_l, sm_scale

    def out_mlp(x, lp, attn_out, kept_q=None):
        """Shared epilogue: o_proj (+psum), MLP (+psum), residuals."""
        if kept_q is not None:
            # head-compacted o_proj: gather the kept heads' outputs; the
            # pruned rows were exact zeros, so nothing is lost
            attn_out = jnp.take(attn_out, kept_q, axis=1)
        o = attn_out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(
            b, s, -1)
        o_proj = _mm(o, lp["wo"])
        if tp_axis is not None:
            o_proj = jax.lax.psum(o_proj, tp_axis)
        x = x + (o_proj + lp.get("bo", 0))

        h2 = _norm(x, lp["mlp_norm_w"], lp.get("mlp_norm_b"),
                   m.layernorm_kind, m.norm_eps)
        mlp_out = _mlp(h2, lp, m.activation)
        if tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, tp_axis)
        return x + mlp_out + lp.get("b_down", 0)

    def attn_kwargs(hmask_l, layer_idx=None):
        """layer_idx None -> the fused kernel (takes the whole per-layer
        budget tuple); a traced index -> jnp paths (scalar budget)."""
        if not p.enable_v_pruning:
            vk = 0
        elif layer_idx is None:
            vk = v_keep_layers
        else:
            vk = jnp.take(jnp.asarray(v_keep_layers, jnp.int32), layer_idx)
        return dict(
            requant_threshold=(q.requant_threshold
                               if (q.enabled and q.enable_requant) else 0.0),
            quant_enabled=q.enabled,
            v_keep=vk,
            v_block_size=p.v_block_size,
            head_mask=hmask_l if p.enable_head_pruning else None,
            importance_kind=p.importance_kind,
        )

    layer_ids = jnp.arange(m.num_layers, dtype=jnp.int32)

    if use_kernel:
        # Decode path: the stacked cache planes + importance RIDE THE SCAN
        # CARRY and the kernel updates one layer in place per iteration.
        # Scanning the planes as xs/ys instead would make XLA round-trip
        # the entire multi-layer cache through fresh ys buffers every
        # decode step (~GBs/step at serving shapes).
        accum = track_importance and p.cascade_accumulate

        def make_layer_fn(cap_rung):
            cap_override = cap_rung if cap_rung < cap else None

            def layer_fn(carry, scanned):
                x, k_all, v_all, imp_all, layer_lengths = carry
                if head_kept is not None:
                    lp, hmask_l, layer_idx, kq_l, kkv_l = scanned
                    kept = (kq_l, kkv_l)
                else:
                    lp, hmask_l, layer_idx = scanned
                    kept = None
                lengths_l = jnp.take(layer_lengths, layer_idx, axis=0)

                qh, kh, vh, _, sm_scale = qkv(x, lp, lengths_l, layer_idx,
                                              kept=kept)
                if m.use_attn_scale_by_layer:
                    q_kernel = qh * (sm_scale / base_scale)
                else:
                    q_kernel = qh
                attn_out, stats, k_all, v_all = fused_decode_attention(
                    q_kernel, k_all, v_all, kh, vh, lengths_l + s,
                    sm_scale=base_scale,
                    interpret=on_cpu,
                    importance_in=imp_all if accum else None,
                    layer=layer_idx,
                    quant_bits=(state.quant_bits
                                if q.enabled and q.layer_bits is not None
                                else None),
                    quantize_queries=q.quantize_queries,
                    pv_int8=q.pv_int8,
                    probs_bf16=q.probs_bf16,
                    track_importance=track_importance,
                    importance_ema=p.importance_ema,
                    cap_override=cap_override,
                    **attn_kwargs(hmask_l),
                )
                if track_importance:
                    if accum:
                        # stacked accumulator updated in place by the kernel
                        imp_all = stats.importance_delta
                    else:
                        delta = stats.importance_delta[None].astype(
                            imp_all.dtype)
                        if delta.shape[-1] < imp_all.shape[-1]:
                            # rung-sized delta: columns past the rung are
                            # dead under the layer-length contract
                            delta = jnp.pad(
                                delta, ((0, 0), (0, 0), (0, 0),
                                        (0, imp_all.shape[-1]
                                         - delta.shape[-1])))
                        imp_all = jax.lax.dynamic_update_slice(
                            imp_all, delta, (layer_idx, 0, 0, 0))
                layer_lengths = jax.lax.dynamic_update_slice(
                    layer_lengths, (lengths_l + s)[None],
                    (layer_idx, jnp.int32(0)))

                x = out_mlp(x, lp, attn_out,
                            kept_q=None if kept is None else kept[0])
                layer_out = (stats.need_requant.sum().astype(jnp.int32),
                             stats.max_prob)
                return (x, k_all, v_all, imp_all, layer_lengths), layer_out

            return layer_fn

        carry = (x, state.cache.k, state.cache.v, state.importance,
                 state.layer_lengths)
        xs = (layer_params, state.head_mask, layer_ids)
        if head_kept is not None:
            xs = xs + head_kept
        # Per-layer capacity rungs: contiguous layer groups share a rung
        # (the cascade budgets decay monotonically), and each group scans
        # with a kernel variant sized to its rung — smaller [R, cap]
        # planes and more batch rows per grid instance on deep layers
        # (token_pruning.layer_capacities).
        from spatten_tpu.pruning.token_pruning import layer_capacity_groups
        groups = layer_capacity_groups(cfg)
        if len(groups) == 1:
            (x, k_all, v_all, new_imp, new_lengths), (requants, max_probs) \
                = jax.lax.scan(make_layer_fn(groups[0][2]), carry, xs)
        else:
            req_g, maxp_g = [], []
            for (ga, gb, cap_r) in groups:
                # scan over layer INDICES and gather each layer's slice
                # in-body (scan's own xs handling) — a static xs[ga:gb]
                # slice would materialize a fresh copy of the group's
                # weights every decode step (measured +0.35 ms/step)
                lf = make_layer_fn(cap_r)

                def body(c, l, _lf=lf):
                    sl = jax.tree.map(
                        lambda a: jax.lax.dynamic_index_in_dim(
                            a, l, 0, keepdims=False), xs)
                    return _lf(c, sl)

                carry, (rq, mp) = jax.lax.scan(
                    body, carry, jnp.arange(ga, gb, dtype=jnp.int32))
                req_g.append(rq)
                maxp_g.append(mp)
            x, k_all, v_all, new_imp, new_lengths = carry
            requants = jnp.concatenate(req_g, axis=0)
            max_probs = jnp.concatenate(maxp_g, axis=0)
        new_cache = LayerKVCache(k=k_all, v=v_all)
        return x, new_cache, new_imp, new_lengths, requants, max_probs

    # Prefill / jnp fallback path: per-layer slices scan as xs/ys (the
    # copies this implies are amortized over the whole prefill chunk).
    if head_kept is not None:
        raise NotImplementedError(
            "head-compacted projections are a decode-kernel-path feature "
            "(prefill derives the mask, so it never runs compacted)")

    def layer_fn(x, scanned):
        lp, layer_cache, imp, hmask_l, lengths_l, layer_idx, qbits_l = \
            scanned

        qh, kh, vh, pos_l, sm_scale = qkv(x, lp, lengths_l, layer_idx)
        kwargs = attn_kwargs(hmask_l, layer_idx)
        kwargs["use_rope"] = (not m.use_abs_pos_emb) and \
            e.rope_mode == "read"
        if q.enabled and q.layer_bits is not None:
            kwargs["pass1_bits"] = qbits_l

        layer_cache = append_tokens(layer_cache, kh, vh, lengths_l)
        if s > 1:
            # streaming-blocks prefill: O(S + C) memory.  With
            # prefill_fp_score (default), the prompt pass scores at full
            # precision and skips requant + V-prune masking — pass-1
            # nibble scoring is a decode BANDWIDTH optimization; prefill
            # is MXU-bound and reads each K row once either way
            # (measured ~3x prefill throughput, round 4).
            pkw = dict(kwargs)
            if e.prefill_fp_score:
                # only the scoring-precision ladder is skipped; the
                # quantized cache planes and exact importance still build
                pkw["quant_enabled"] = False
                pkw["requant_threshold"] = 0.0
                pkw.pop("pass1_bits", None)
            if not e.prefill_v_mask:
                # dense-prompt pricing (bert.cpp:17-242): V streams once
                # per chunk regardless, so mass/top-k masking buys no
                # fetch.  Importance is pre-mask in both paths, so the
                # cascade/V-budget state is unchanged (config.py
                # prefill_v_mask).
                pkw["v_keep"] = 0
            attn_out, stats = prefill_attention(
                qh, layer_cache.k, layer_cache.v, cos, sin,
                lengths_l + s, pos_l, sm_scale=sm_scale, **pkw)
        else:
            attn_out, stats = spatten_attention_reference(
                qh, layer_cache.k, layer_cache.v, cos, sin,
                lengths_l + s, pos_l, sm_scale=sm_scale, **kwargs)
        if track_importance:
            # reset the incoming tokens' accumulator slots, then add
            # (shared by both non-kernel branches: chunked prefill must
            # accumulate importance exactly like s=1 stepping)
            slot = jnp.arange(cap)[None, None, :]
            is_new = ((slot >= lengths_l[:, None, None])
                      & (slot < (lengths_l + s)[:, None, None]))
            imp_dt = imp.dtype        # storage dtype (f32 or bf16)
            if p.cascade_accumulate:
                ema = p.importance_ema
                imp = jnp.where(is_new, 0.0, imp.astype(jnp.float32))
                imp = (ema * imp + stats.importance_delta).astype(imp_dt)
            else:
                imp = stats.importance_delta.astype(imp_dt)

        x = out_mlp(x, lp, attn_out)
        layer_out = (layer_cache, imp, lengths_l + s,
                     stats.need_requant.sum().astype(jnp.int32),
                     stats.max_prob)
        return x, layer_out

    x, (new_cache, new_imp, new_lengths, requants, max_probs) = jax.lax.scan(
        layer_fn,
        x,
        (layer_params, state.cache, state.importance, state.head_mask,
         state.layer_lengths, layer_ids, state.quant_bits),
    )
    return x, new_cache, new_imp, new_lengths, requants, max_probs


def forward(
    params: Params,
    cfg: SpAttenConfig,
    state: DecodeState,
    tokens: jax.Array,          # int32 [B, S]
    tp_axis: str | None = None,
    rope_tables: Tuple[jax.Array, jax.Array] | None = None,
    head_compact: dict | None = None,   # compact_head_params() output:
                                # decode with physically compacted
                                # attention projections (permanent head
                                # pruning)
) -> Tuple[jax.Array, DecodeState, StepAux]:
    """Run S tokens through the model, appending them to the cache.

    Returns (logits [B, S, vocab], new_state, aux).  Token positions are
    the current cache slots [lengths, lengths+S) — pos-shift positioning.

    When `tp_axis` is set, the call must be inside a `shard_map` whose mesh
    has that axis: attention heads and MLP intermediate are head/column
    sharded (cfg.model must already describe the *local* head counts) and
    the o_proj / down_proj partial sums are reduced with `lax.psum` over the
    axis — the Megatron layout expressed as explicit ICI collectives.
    """
    s = tokens.shape[1]
    x, positions = embed_tokens(params, cfg, state, tokens)
    x, new_cache, new_imp, new_lengths, requants, max_probs = run_layers(
        head_compact["layers"] if head_compact else params["layers"],
        cfg, state, x, positions, tp_axis=tp_axis,
        rope_tables=rope_tables,
        head_kept=(None if head_compact is None else
                   (head_compact["kept_q"], head_compact["kept_kv"])))
    logits = lm_head(params, cfg, x)

    new_state = state._replace(
        cache=new_cache,
        importance=new_imp,
        lengths=state.lengths + s,
        layer_lengths=new_lengths,
        requant_events=state.requant_events + requants.sum(),
    )
    aux = StepAux(requant_events=requants.sum(), max_probs=max_probs)
    return logits, new_state, aux
