"""Perplexity-delta validation on a *trained* model (the eval the reference
left as a TODO, README.md:104-108).

A tiny Llama-style model is trained (with an independent, cache-free dense
forward) on a synthetic language with long-range structure (periodic copy),
then evaluated through the engine:

1. dense engine ppl must be far below chance -> the engine's forward agrees
   with the training-time forward on real (trained) weights;
2. the full SpAtten pipeline (int8+4-bit planes, requant, cascade token
   pruning, V pruning) must cost only a small ppl delta -> the pruning
   signal keeps the tokens that matter.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
from spatten_tpu.eval import evaluate_perplexity
from spatten_tpu.models import init_params
from spatten_tpu.models.transformer import _mlp, _norm

VOCAB = 64
PERIOD = 8


def model_cfg():
    return ModelConfig(
        vocab_size=VOCAB, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=4, head_dim=12, intermediate_size=96,
        max_position_embeddings=256,
    )


def dense_forward(params, m, tokens):
    """Independent cache-free causal forward for training (bf16-free)."""
    import math
    b, s = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0).astype(jnp.float32)
    from spatten_tpu.ops import rope as rope_ops
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


def make_batch(key, batch, seqlen):
    """Periodic-copy language: token t repeats token t-PERIOD, with the
    first PERIOD tokens random; 5% noise."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.randint(k1, (batch, PERIOD), 0, VOCAB)
    reps = -(-seqlen // PERIOD)
    seq = jnp.tile(base, (1, reps))[:, :seqlen]
    noise = jax.random.randint(k2, seq.shape, 0, VOCAB)
    flip = jax.random.uniform(k3, seq.shape) < 0.05
    return jnp.where(flip, noise, seq)


@pytest.fixture(scope="module")
def trained_params():
    m = model_cfg()
    params = init_params(m, jax.random.PRNGKey(0), dtype=jnp.float32)

    def loss_fn(params, tokens):
        logits = dense_forward(params, m, tokens[:, :-1])
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return nll.mean()

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(42)
    loss = None
    for i in range(250):
        key, sub = jax.random.split(key)
        tokens = make_batch(sub, 16, 64)
        params, opt_state, loss = step(params, opt_state, tokens)
    assert float(loss) < 2.0, f"training failed to converge: {loss}"
    return params


def engine_cfg(spatten: bool, cap: int, budget: int = 40):
    m = model_cfg()
    if spatten:
        pruning = PruningConfig(start_size=4, important_size=budget,
                                recent_size=budget, enable_v_pruning=True,
                                v_keep_ratio=0.5, v_block_size=4)
        quant = QuantConfig(enabled=True, enable_requant=True,
                            requant_threshold=0.15)
    else:
        pruning = PruningConfig(enable_token_pruning=False,
                                enable_v_pruning=False)
        quant = QuantConfig(enabled=False, enable_requant=False)
    return SpAttenConfig(
        model=m, pruning=pruning, quant=quant,
        engine=EngineConfig(max_batch_size=1, cache_capacity=cap,
                            prefill_chunk=8),
    ).validate()


def test_trained_ppl_and_pruning_delta(trained_params):
    """Eval at 3x the trained sequence length (the streaming regime the
    rolling cache exists for, spatten_llm/kv_cache_token_pruning.py)."""
    text = np.asarray(make_batch(jax.random.PRNGKey(99), 1, 200)[0])

    # dense full-context baseline (capacity >= text length)
    dense = evaluate_perplexity(trained_params, engine_cfg(False, 256),
                                text)
    # a trained copy-language model is far below chance (ppl ~VOCAB);
    # positions past the trained length cost some RoPE extrapolation
    assert dense.perplexity < 9.0, dense

    # full SpAtten pipeline at ~0.4x context cache
    pruned = evaluate_perplexity(trained_params,
                                 engine_cfg(True, 128, 40), text)
    delta = np.log(pruned.perplexity) - np.log(dense.perplexity)
    assert delta < 0.3, (
        f"pruning ppl delta too large: dense={dense.perplexity:.2f} "
        f"pruned={pruned.perplexity:.2f}")

    # the StreamingLLM effect the reference's pos-shift design targets: a
    # tight rolling cache keeps key positions inside the trained range and
    # BEATS dense extrapolation at 3x length
    streaming = evaluate_perplexity(trained_params,
                                    engine_cfg(True, 64, 24), text)
    assert streaming.perplexity < dense.perplexity, (
        f"streaming={streaming.perplexity:.2f} "
        f"dense={dense.perplexity:.2f}")
