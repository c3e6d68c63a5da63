"""Generation engine: prefill, decode, and capacity-triggered cascade pruning.

This is the serving analog of the reference demo loop
(run_spatten_llama.py:18-83): greedy decode with a rolling
start/important/recent KV cache.  Differences, by design:

* Pruning is **on-device at decode-window boundaries** (a `lax.cond` over
  the whole-batch trigger once per `decode_window` steps), not a host-side
  pass between conversation rounds — the engine never leaves the device,
  and the hot per-token scan stays branch-free.
* The physical cache capacity exceeds the algorithmic cache_size
  (start+important+recent); pruning triggers when an append would overflow
  capacity and compacts down to cache_size, so one gather is amortized over
  `capacity - cache_size` decode steps.  The reference amortizes the same
  way via its `num_coming = prompt + max_gen_len` look-ahead
  (kv_cache_token_pruning.py:46-47).
* Each (layer, kv_head) prunes with its own importance accumulator — the
  per-head top-k of the reference (kv_cache_token_pruning.py:59-61) — and
  the importance accumulator is gathered alongside K/V, preserving cascade
  accumulation across prunes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from spatten_tpu.config import SpAttenConfig
from spatten_tpu.engine import kv_cache as kvc
from spatten_tpu.ops import quantize as qz
from spatten_tpu.engine.sampling import SamplingParams, sample_token
from spatten_tpu.engine.state import DecodeState, init_state
from spatten_tpu.models import transformer
from spatten_tpu.pruning import token_pruning


# ---------------------------------------------------------------------------
# Pruning inside the decode step
# ---------------------------------------------------------------------------

def maybe_prune(cfg: SpAttenConfig, state: DecodeState, num_coming: int,
                static_layers: Optional[Tuple[int, ...]] = None,
                ) -> Tuple[DecodeState, jax.Array]:
    """Compact any sequence whose next `num_coming` tokens would overflow.

    Returns (state, pruned_mask [B]).  Trigger per sequence:
    `length + num_coming > capacity rung`; the pruned sequence keeps
    start + important + recent = cache_size tokens (shape-static).

    ``static_layers``: when the caller KNOWS which layers can trigger
    (generation appends one token to every layer per step, so the
    trigger schedule is a pure function of the step count —
    `prune_schedule`), passing the tuple removes every per-layer
    `lax.cond`: layers in the tuple prune unconditionally (per-sequence
    identity masking still applies), other layers are untouched.  Each
    cond otherwise round-trips the stacked cache through its output
    buffers (~7 ms/layer at serving shapes, paid even by untriggered
    layers).  `()` compiles to a no-op; None keeps the dynamic conds.
    """
    p = cfg.pruning
    cap = state.capacity
    num_layers = cfg.model.num_layers
    # PER-LAYER triggers (round 4): layers refill at different rates (a
    # deep layer keeps ~0.14x of capacity and takes ~7x longer to refill
    # than layer 0), so prune events naturally stagger — each event
    # compacts only the overflowing layer(s) instead of all L at once.
    # This cuts the serving stall ~L-fold at steady state AND prunes deep
    # layers ~budget-proportionally less often.
    # Round 5: each layer triggers at its CAPACITY RUNG (<= physical
    # capacity, token_pruning.layer_capacities) — deep cascade layers
    # prune near their budget instead of refilling to full capacity, so
    # their live windows (and the decode kernel's grid) stay rung-sized.
    caps_l = jnp.asarray(token_pruning.layer_capacities(cfg),
                         jnp.int32)[:, None]                     # [L, 1]
    trigger_layer = state.layer_lengths + num_coming > caps_l    # [L, B]
    if static_layers is not None:
        static_mask = jnp.asarray(
            [l in static_layers for l in range(num_layers)],
            bool)[:, None]
        trigger_layer = trigger_layer & static_mask
    trigger = jnp.any(trigger_layer, axis=0)                       # [B]

    if not p.enable_token_pruning or static_layers == ():
        return state, jnp.zeros_like(trigger)

    budgets = token_pruning.layer_budgets(p, num_layers)           # [L]
    budgets_static = token_pruning.layer_budgets_static(p, num_layers)
    caps_l = token_pruning.layer_capacities(cfg)

    def do_prune(st: DecodeState) -> DecodeState:
        cached_rope = (cfg.engine.rope_mode == "cached"
                       and not cfg.model.use_abs_pos_emb)
        from spatten_tpu.pruning import compact

        # keep_count needs no top_k — pure arithmetic (the selection's
        # own count formula, token_pruning.py): the expensive per-head
        # top_k runs only inside a TRIGGERED layer's branch
        recent_keep = p.recent_size
        recent_begin = st.layer_lengths - recent_keep          # [L, B]
        n_imp = jnp.minimum(budgets[:, None],
                            jnp.maximum(recent_begin - p.start_size, 0))
        keep_count = p.start_size + n_imp + recent_keep        # [L, B]

        def one_layer(l, carry):
            """Prune layer l in place via the fused compaction (Pallas
            gather + moved-row-only delta re-rotation + requant + prefix
            repack — pruning/compact.py).  The layer index is STATIC
            (unrolled loop): selection top_k runs with layer l's OWN
            budget and over its capacity-rung window, so deep cascade
            layers pay rung-sized (not capacity-sized) event costs.
            Untriggered sequences pass identity indices so their rewrite
            is a bit-exact no-op, and a layer with NO triggered sequence
            skips both the selection and the compaction entirely
            (per-layer staggering: the steady-state event touches one
            layer, not L)."""
            cache, imp = carry
            trig_l = trigger_layer[l]                          # [B]
            keep_max_l = (p.start_size + budgets_static[l]
                          + p.recent_size)
            window = caps_l[l]          # static rung >= layer lengths

            def prune_this(carry):
                cache, imp = carry
                layer_cache = jax.tree.map(lambda x: x[l], cache)
                kidx_l, _ = token_pruning.select_keep_indices_budgeted(
                    imp[l][None, :, :, :window],
                    st.layer_lengths[l][None],
                    p.start_size, budgets[l:l + 1],
                    budgets_static[l], p.recent_size, num_coming=0)
                kidx_l = kidx_l[0]                 # [B, Hkv, keep_max_l]
                ident = jnp.broadcast_to(
                    jnp.arange(keep_max_l, dtype=jnp.int32),
                    kidx_l.shape)
                kidx_l = jnp.where(trig_l[:, None, None], kidx_l, ident)
                kc_l = jnp.where(trig_l, keep_count[l],
                                 jnp.int32(keep_max_l))         # [B]
                new_cache, new_imp = compact.compact_layer(
                    layer_cache, imp[l], kidx_l, rotate_k=cached_rope,
                    rope_theta=cfg.model.rope_theta,
                    lengths=st.layer_lengths[l], triggered=trig_l,
                    keep_count=kc_l, window=window)
                cache = jax.tree.map(
                    lambda big, small:
                    jax.lax.dynamic_update_index_in_dim(
                        big, small.astype(big.dtype), l, 0),
                    cache, new_cache)
                imp = jax.lax.dynamic_update_index_in_dim(imp, new_imp,
                                                          l, 0)
                return (cache, imp)

            if static_layers is not None:
                # the schedule already told us this layer triggers; the
                # per-sequence trig_l mask (identity kidx) handles any
                # sequence that happens not to overflow
                return prune_this(carry)
            return jax.lax.cond(jnp.any(trig_l), prune_this,
                                lambda c: c, carry)

        cache, imp = st.cache, st.importance
        layer_list = (range(num_layers) if static_layers is None
                      else static_layers)
        for l in layer_list:
            cache, imp = one_layer(l, (cache, imp))
        layer_lengths = jnp.where(trigger_layer, keep_count,
                                  st.layer_lengths)
        lengths = jnp.max(layer_lengths, axis=0)
        return st._replace(cache=cache, importance=imp, lengths=lengths,
                           layer_lengths=layer_lengths)

    if static_layers is not None:
        # schedule-driven: the listed layers prune unconditionally (the
        # outer cond would round-trip the cache like the per-layer ones)
        return do_prune(state), trigger
    new_state = jax.lax.cond(jnp.any(trigger), do_prune, lambda st: st,
                             state)
    return new_state, trigger


def prune_schedule_step(cfg: SpAttenConfig, host_lens: list, num_coming: int
                        ) -> Tuple[Tuple[int, ...], list]:
    """Host-side replica of the per-layer trigger/keep bookkeeping.

    Generation appends one token to EVERY layer of EVERY sequence per
    step, so layer lengths are a pure function of the step count and the
    trigger schedule is known before tracing — `maybe_prune` can run
    with `static_layers` (no lax.cond cache round-trips).  Returns
    (layers_triggering_now, lengths AFTER prune + num_coming appends).
    """
    p = cfg.pruning
    if not p.enable_token_pruning:
        return (), [x + num_coming for x in host_lens]
    caps = token_pruning.layer_capacities(cfg)
    budg = token_pruning.layer_budgets_static(p, cfg.model.num_layers)
    layers = []
    out = list(host_lens)
    for l, ln in enumerate(out):
        if ln + num_coming > caps[l]:
            rb = ln - p.recent_size
            out[l] = (p.start_size
                      + min(budg[l], max(rb - p.start_size, 0))
                      + p.recent_size)
            layers.append(l)
    return tuple(layers), [x + num_coming for x in out]


# ---------------------------------------------------------------------------
# Jitted step functions
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("nchunks",), donate_argnums=(2,))
def prefill_scan(params, cfg: SpAttenConfig, state: DecodeState,
                 tokens: jax.Array, *, nchunks: int):
    """Scan `nchunks` equal prompt chunks in ONE dispatch (no prune
    triggers may occur inside — the caller segments at schedule-known
    prune points).  Returns (last-token logits, state).

    Chunked prefill as one dispatch per chunk pays the host-dispatch
    floor per chunk (~30 ms through a tunnel-attached chip — half the
    measured TTFT at a 2k prompt); the scan pays it once per segment."""
    b = tokens.shape[0]
    chunk = tokens.shape[1] // nchunks
    xs = tokens.reshape(b, nchunks, chunk).transpose(1, 0, 2)

    def body(carry, tk):
        state, _ = carry
        logits, state, _ = transformer.forward(params, cfg, state, tk)
        return (state, logits[:, -1]), None

    logits0 = jnp.zeros((b, cfg.model.vocab_size), jnp.float32)
    (state, last), _ = jax.lax.scan(body, (state, logits0), xs)
    return last, state


def prefill(params, cfg: SpAttenConfig, state: DecodeState,
            tokens: jax.Array, host_lens: Optional[list] = None):
    """Full prompt prefill: schedule-known prunes run between jitted
    chunk-scan segments.  Returns (last_logits, state, host_lens)."""
    b, total = tokens.shape
    chunk = cfg.engine.prefill_chunk
    if host_lens is None:
        host_lens = [0] * cfg.model.num_layers
    last_logits = None
    pos = 0
    while pos < total:
        lens = list(host_lens)
        # first chunk of the segment (a schedule-known prune may have to
        # run before it)
        n0 = min(chunk, total - pos)
        layers, lens = prune_schedule_step(cfg, lens, n0)
        if layers:
            state = _prune_static_jit(cfg)(state, layers, n0)
        seg = n0
        # extend with further full chunks while nothing triggers
        if n0 == chunk:
            while pos + seg + chunk <= total:
                nl, lens2 = prune_schedule_step(cfg, lens, chunk)
                if nl:
                    break
                lens = lens2
                seg += chunk
        host_lens = lens
        # scans are capped at 8 chunks per dispatch: the scan body nests
        # the whole layer stack and a 16-chunk prefill scan risks
        # pathological compile times on the remote-compile path
        off = 0
        while off < seg:
            nck = min(8, (seg - off) // chunk)
            if nck >= 2:
                part = nck * chunk
                last_logits, state = prefill_scan(
                    params, cfg, state,
                    tokens[:, pos + off:pos + off + part], nchunks=nck)
            else:
                part = min(chunk, seg - off)
                last_logits, state, _ = prefill_chunk(
                    params, cfg, state,
                    tokens[:, pos + off:pos + off + part],
                    static_layers=())
            off += part
        pos += seg
    return last_logits, state, host_lens


@functools.lru_cache(maxsize=None)
def _prune_static_jit(cfg: SpAttenConfig):
    return jax.jit(
        lambda s, layers, n: maybe_prune(cfg, s, n,
                                         static_layers=layers)[0],
        static_argnums=(1, 2), donate_argnums=(0,))


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("static_layers",))
def prefill_chunk(params, cfg: SpAttenConfig, state: DecodeState,
                  tokens: jax.Array, *, static_layers=None):
    """Run one chunk of prompt tokens ([B, S]); returns last-token logits.

    `static_layers`: schedule-known prune set (see maybe_prune); None
    keeps the dynamic per-layer conds for callers without host-side
    length bookkeeping (continuous batching)."""
    state, _ = maybe_prune(cfg, state, tokens.shape[1],
                           static_layers=static_layers)
    logits, state, aux = transformer.forward(params, cfg, state, tokens)
    return logits[:, -1], state, aux


def maybe_update_head_mask(cfg: SpAttenConfig, state: DecodeState,
                           window: int = 1) -> DecodeState:
    """On-the-fly head pruning: re-derive the per-layer head mask from the
    live importance accumulators every `head_update_interval` decode steps
    (the reference's hp-step5 traces show the mask evolving during decode;
    post-prefill-only masks never adapt).  Uses the max sequence length as
    the step clock so it works in any jitted step without extra state;
    callers stepping `window` tokens at a time fire when the clock crosses
    a multiple of the interval within the window."""
    p = cfg.pruning
    n = p.head_update_interval
    if not (p.enable_head_pruning and p.head_keep > 0 and n > 0):
        return state
    from spatten_tpu.engine.policy import update_head_mask
    do = (jnp.max(state.lengths) % n) < window
    return jax.lax.cond(do, lambda s: update_head_mask(cfg, s),
                        lambda s: s, state)


@functools.partial(jax.jit, static_argnums=(1,))
def decode_step(params, cfg: SpAttenConfig, state: DecodeState,
                token: jax.Array):
    """One greedy decode step.  token: int32 [B] -> (next_token [B], state)."""
    state, _ = maybe_prune(cfg, state, 1)
    state = maybe_update_head_mask(cfg, state)
    logits, state, aux = transformer.forward(params, cfg, state,
                                             token[:, None])
    next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    return next_token, state, aux


class GenerateResult(NamedTuple):
    tokens: jax.Array          # int32 [B, max_new_tokens]
    state: DecodeState
    requant_events: jax.Array  # int32 []


def generate(
    params,
    cfg: SpAttenConfig,
    prompt: jax.Array,            # int32 [B, prompt_len]
    max_new_tokens: int,
    state: Optional[DecodeState] = None,
    eos_token_id: Optional[int] = None,
    sampling: Optional[SamplingParams] = None,
    rng: Optional[jax.Array] = None,
) -> GenerateResult:
    """Generation: chunked prefill + jitted token-at-a-time decode.

    The decode loop is a `lax.scan` over steps (one compiled program); EOS
    handling freezes finished sequences (keeps emitting eos, stops growing
    their cache influence) rather than exiting early, keeping shapes static.
    Greedy by default; pass `sampling` (+ optionally `rng`) for
    temperature / top-k / top-p.  If head pruning is enabled, the per-layer
    head mask is (re)derived from accumulated importance after prefill —
    the reference's "on-the-fly" head pruning (SURVEY.md §0.3).
    """
    cfg.validate()
    sampling = sampling or SamplingParams()
    b, prompt_len = prompt.shape
    if state is None:
        state = init_state(cfg, batch=b)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # Host-side prune schedule: generation appends to every layer every
    # step, so the trigger pattern is known before tracing and the jitted
    # programs compile WITHOUT per-layer conds (each cond round-trips the
    # stacked cache, ~7 ms/layer/invocation).  A provided state with
    # ragged per-sequence lengths falls back to the dynamic-cond path.
    L = cfg.model.num_layers
    import numpy as _np
    ll_host = _np.asarray(jax.device_get(state.layer_lengths))
    static_ok = bool((ll_host == ll_host[:, :1]).all())
    host_lens = [int(x) for x in ll_host[:, 0]]

    def sched(n):
        nonlocal host_lens
        if not static_ok:
            return None
        layers, host_lens = prune_schedule_step(cfg, host_lens, n)
        return layers

    chunk = cfg.engine.prefill_chunk
    last_logits = None
    from spatten_tpu.utils import debug as dbg
    if static_ok and not dbg.enabled():
        # segmented one-dispatch-per-segment prefill (schedule-known
        # prunes between jitted chunk scans)
        last_logits, state, host_lens = prefill(params, cfg, state,
                                                prompt,
                                                host_lens=host_lens)
    else:
        pos = 0
        while pos < prompt_len:
            n = min(chunk, prompt_len - pos)
            layers = sched(n)
            if pos == 0 and dbg.enabled():
                # SPATTEN_DEBUG=1: the first prefill chunk runs under
                # checkify float checks — numeric corruption (NaN
                # escaping a masked region, a zero softmax denominator)
                # raises at the producing op instead of surfacing as
                # garbage tokens
                last_logits, state, _ = dbg.checkify_step(
                    functools.partial(prefill_chunk, params, cfg,
                                      static_layers=layers),
                    state, prompt[:, pos:pos + n])
            else:
                last_logits, state, _ = prefill_chunk(
                    params, cfg, state, prompt[:, pos:pos + n],
                    static_layers=layers)
            pos += n

    head_compact = None
    if cfg.pruning.enable_head_pruning and cfg.pruning.head_keep > 0:
        from spatten_tpu.engine.policy import update_head_mask
        state = jax.jit(update_head_mask, static_argnums=0)(cfg, state)
        if (cfg.pruning.head_update_interval == 0
                and cfg.engine.compact_pruned_heads):
            # permanent mode: the mask is now fixed — physically compact
            # the attention projections once for the whole decode
            head_compact = jax.jit(
                transformer.compact_head_params, static_argnums=1
            )(params, cfg, state.head_mask)

    first_token = sample_token(last_logits, rng, sampling)

    # Decode runs in WINDOWS of W steps: the capacity-triggered cascade
    # prune and the periodic head-mask update run once at each window
    # boundary, and the hot per-token scan stays branch-free.  A
    # `lax.cond` inside the scanned step would round-trip the whole cache
    # through the cond's output buffers every token (~2.6 ms/step at
    # serving shapes on v5e); hoisting it to the window boundary makes it
    # O(1/W).  Semantics are exact: maybe_prune(num_coming=W) compacts any
    # sequence that could overflow within the window — the reference
    # prunes with the same num_coming look-ahead between rounds
    # (kv_cache_token_pruning.py:46-47).
    window_steps = cfg.engine.decode_window
    if cfg.pruning.enable_token_pruning:
        # headroom = the tightest per-layer slack between a rung and its
        # static keep bound (every rung covers decode_window by
        # construction, so this only bites for tiny test configs)
        caps_l = token_pruning.layer_capacities(cfg)
        keeps_l = token_pruning.layer_keep_max_static(
            cfg.pruning, cfg.model.num_layers)
        headroom = min(c - k for c, k in zip(caps_l, keeps_l))
        window_steps = max(1, min(window_steps, headroom))

    # schedule-known prunes run in their own small jit BEFORE the window
    # (at most num_layers + 1 compiled variants), so the hot window
    # program itself compiles with static_layers=() — zero prune code
    @functools.partial(jax.jit, static_argnums=(1, 2),
                       donate_argnums=(0,))
    def prune_static(state, layers, n):
        return maybe_prune(cfg, state, n, static_layers=layers)[0]

    # params is an explicit argument: closure-captured arrays lower as HLO
    # constants (bloating the module; fatal on remote-compile backends)
    @functools.partial(jax.jit, static_argnums=(2,),
                       static_argnames=("window_prune",),
                       donate_argnums=(1,))
    def decode_window(params, carry, n, head_compact=None, *,
                      window_prune=None):
        state, token, done, rng = carry
        state, _ = maybe_prune(cfg, state, n, static_layers=window_prune)
        state = maybe_update_head_mask(cfg, state, window=n)
        # rope tables computed ONCE per window: XLA won't hoist the
        # [cap, d] sin/cos materialization out of the scan
        from spatten_tpu.ops import rope as rope_ops
        tables = rope_ops.rope_table(cfg.engine.cache_capacity,
                                     cfg.model.head_dim,
                                     cfg.model.rope_theta)

        def body(carry, step_rng):
            state, token, done = carry
            logits, state, _ = transformer.forward(params, cfg, state,
                                                   token[:, None],
                                                   rope_tables=tables,
                                                   head_compact=head_compact)
            next_token = sample_token(logits[:, -1], step_rng, sampling)
            if eos_token_id is not None:
                done = done | (token == eos_token_id)
                next_token = jnp.where(done, eos_token_id, next_token)
            return (state, next_token, done), token

        rng, sub = jax.random.split(rng)
        step_keys = jax.random.split(sub, n)
        (state, token, done), toks = jax.lax.scan(
            body, (state, token, done), step_keys)
        return (state, token, done, rng), toks.T   # [B, n]

    carry = (state, first_token, jnp.zeros((b,), bool), rng)
    chunks = []
    remaining = max_new_tokens
    while remaining > 0:
        n = min(window_steps, remaining)
        layers = sched(n)
        if static_ok:
            if layers:
                st = prune_static(carry[0], layers, n)
                carry = (st,) + carry[1:]
            wp = ()
        else:
            wp = None          # dynamic conds inside the window
        carry, toks = decode_window(params, carry, n,
                                    head_compact=head_compact,
                                    window_prune=wp)
        chunks.append(toks)
        remaining -= n
    state = carry[0]
    tokens = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 1)
    return GenerateResult(tokens=tokens, state=state,
                          requant_events=state.requant_events)
