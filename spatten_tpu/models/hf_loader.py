"""HuggingFace checkpoint -> spatten_tpu parameter tree.

Replaces the reference's `load()` (spatten_llm/utils.py:51-62, torch fp16 +
device_map="auto") with a TPU-native loader: weights are read tensor-by-
tensor (safetensors or torch bins), transposed into our layer-stacked
layout, cast to the engine dtype, and (optionally) device_put with TP
shardings — no torch graph, no GPU.

Supported families (matching the reference's scope, SURVEY.md §2.1/§2.8):
* Llama-class (`LlamaForCausalLM`): vicuna/llama/tinyllama...
* GPT-2-class (`GPT2LMHeadModel`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import ModelConfig


def config_from_hf(hf_cfg: Any) -> ModelConfig:
    """Map a transformers config object (or dict) to ModelConfig."""
    if not isinstance(hf_cfg, dict):
        hf_cfg = hf_cfg.to_dict()
    mt = hf_cfg.get("model_type", "llama")
    if mt == "llama":
        heads = hf_cfg["num_attention_heads"]
        kv_heads = hf_cfg.get("num_key_value_heads", heads)
        return ModelConfig(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["hidden_size"],
            num_layers=hf_cfg["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=kv_heads,
            head_dim=hf_cfg.get(
                "head_dim", hf_cfg["hidden_size"] // heads),
            intermediate_size=hf_cfg["intermediate_size"],
            norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
            rope_theta=hf_cfg.get("rope_theta", 10000.0),
            max_position_embeddings=hf_cfg.get("max_position_embeddings",
                                               4096),
            model_type="llama",
            activation="silu",
            tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
        )
    if mt == "gpt2":
        heads = hf_cfg["n_head"]
        return ModelConfig(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["n_embd"],
            num_layers=hf_cfg["n_layer"],
            num_heads=heads,
            num_kv_heads=heads,
            head_dim=hf_cfg["n_embd"] // heads,
            intermediate_size=hf_cfg.get("n_inner") or 4 * hf_cfg["n_embd"],
            norm_eps=hf_cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=hf_cfg.get("n_positions", 1024),
            model_type="gpt2",
            activation="gelu",
            use_qkv_bias=True,
            use_mlp_bias=True,
            layernorm_kind="layernorm",
            use_abs_pos_emb=True,
            tie_word_embeddings=True,
        )
    raise ValueError(f"unsupported model_type {mt!r} "
                     "(the reference supports llama only, "
                     "enable_spatten_llm.py:14; we add gpt2)")


def _read_checkpoint_tensors(path: str) -> Dict[str, np.ndarray]:
    """Read all tensors from a local HF checkpoint directory."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st_files:
        from safetensors import safe_open
        for f in sorted(st_files):
            with safe_open(os.path.join(path, f), framework="np") as fh:
                for k in fh.keys():
                    tensors[k] = fh.get_tensor(k)
        return tensors
    bin_files = [f for f in os.listdir(path)
                 if f.startswith("pytorch_model") and f.endswith(".bin")]
    if bin_files:
        import torch
        for f in sorted(bin_files):
            sd = torch.load(os.path.join(path, f), map_location="cpu",
                            weights_only=True)
            for k, v in sd.items():
                tensors[k] = v.to(torch.float32).numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors/bin weights under {path}")


def load_model_config(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as fh:
        return config_from_hf(json.load(fh))


def _np(x) -> np.ndarray:
    if hasattr(x, "astype"):
        a = np.asarray(x)
        if a.dtype == np.float16 or str(a.dtype) == "bfloat16":
            a = a.astype(np.float32)
        return a
    return np.asarray(x)


def params_from_hf_state_dict(
    tensors: Dict[str, np.ndarray], cfg: ModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Assemble the layer-stacked parameter tree from HF tensor names."""
    if cfg.model_type == "llama":
        return _llama_params(tensors, cfg, dtype)
    if cfg.model_type == "gpt2":
        return _gpt2_params(tensors, cfg, dtype)
    raise ValueError(cfg.model_type)


def _stack(get: Callable[[int], np.ndarray], n: int, dtype) -> jnp.ndarray:
    return jnp.asarray(np.stack([_np(get(i)) for i in range(n)]), dtype)


def _llama_params(t: Dict[str, np.ndarray], cfg: ModelConfig, dtype):
    L = cfg.num_layers
    pre = "model." if "model.embed_tokens.weight" in t else ""

    def w(name):
        return t[f"{pre}{name}"]

    def lw(i, name):     # HF Linear stores [out, in]; ours is [in, out]
        return _np(t[f"{pre}layers.{i}.{name}.weight"]).T

    layers = {
        "attn_norm_w": _stack(
            lambda i: w(f"layers.{i}.input_layernorm.weight"), L, dtype),
        "wq": _stack(lambda i: lw(i, "self_attn.q_proj"), L, dtype),
        "wk": _stack(lambda i: lw(i, "self_attn.k_proj"), L, dtype),
        "wv": _stack(lambda i: lw(i, "self_attn.v_proj"), L, dtype),
        "wo": _stack(lambda i: lw(i, "self_attn.o_proj"), L, dtype),
        "mlp_norm_w": _stack(
            lambda i: w(f"layers.{i}.post_attention_layernorm.weight"),
            L, dtype),
        "w_gate": _stack(lambda i: lw(i, "mlp.gate_proj"), L, dtype),
        "w_up": _stack(lambda i: lw(i, "mlp.up_proj"), L, dtype),
        "w_down": _stack(lambda i: lw(i, "mlp.down_proj"), L, dtype),
    }
    params = {
        "embed": jnp.asarray(_np(w("embed_tokens.weight")), dtype),
        "layers": layers,
        "final_norm_w": jnp.asarray(_np(w("norm.weight")), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(_np(t["lm_head.weight"]).T, dtype)
    return params


def _gpt2_params(t: Dict[str, np.ndarray], cfg: ModelConfig, dtype):
    L, D = cfg.num_layers, cfg.hidden_size
    pre = "transformer." if "transformer.wte.weight" in t else ""

    def w(name):
        return _np(t[f"{pre}{name}"])

    # GPT-2 Conv1D stores [in, out] already; c_attn packs qkv on axis 1.
    def split_qkv(i, part, bias=False):
        kind = "bias" if bias else "weight"
        full = w(f"h.{i}.attn.c_attn.{kind}")
        qkv = np.split(full, 3, axis=-1)
        return qkv[part]

    layers = {
        "attn_norm_w": _stack(lambda i: w(f"h.{i}.ln_1.weight"), L, dtype),
        "attn_norm_b": _stack(lambda i: w(f"h.{i}.ln_1.bias"), L, dtype),
        "wq": _stack(lambda i: split_qkv(i, 0), L, dtype),
        "wk": _stack(lambda i: split_qkv(i, 1), L, dtype),
        "wv": _stack(lambda i: split_qkv(i, 2), L, dtype),
        "bq": _stack(lambda i: split_qkv(i, 0, True), L, dtype),
        "bk": _stack(lambda i: split_qkv(i, 1, True), L, dtype),
        "bv": _stack(lambda i: split_qkv(i, 2, True), L, dtype),
        "wo": _stack(lambda i: w(f"h.{i}.attn.c_proj.weight"), L, dtype),
        "bo": _stack(lambda i: w(f"h.{i}.attn.c_proj.bias"), L, dtype),
        "mlp_norm_w": _stack(lambda i: w(f"h.{i}.ln_2.weight"), L, dtype),
        "mlp_norm_b": _stack(lambda i: w(f"h.{i}.ln_2.bias"), L, dtype),
        "w_up": _stack(lambda i: w(f"h.{i}.mlp.c_fc.weight"), L, dtype),
        "b_up": _stack(lambda i: w(f"h.{i}.mlp.c_fc.bias"), L, dtype),
        "w_down": _stack(lambda i: w(f"h.{i}.mlp.c_proj.weight"), L, dtype),
        "b_down": _stack(lambda i: w(f"h.{i}.mlp.c_proj.bias"), L, dtype),
    }
    return {
        "embed": jnp.asarray(w("wte.weight"), dtype),
        "wpe": jnp.asarray(w("wpe.weight"), dtype),
        "layers": layers,
        "final_norm_w": jnp.asarray(w("ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(w("ln_f.bias"), dtype),
    }


def load_pretrained(path: str, dtype=jnp.bfloat16):
    """Load (cfg, params) from a local HF checkpoint directory."""
    cfg = load_model_config(path)
    tensors = _read_checkpoint_tensors(path)
    return cfg, params_from_hf_state_dict(tensors, cfg, dtype)
