"""HF checkpoint loading + logits parity against transformers (torch CPU).

Builds tiny randomly-initialized HF models locally (no network), saves them,
loads them through hf_loader, and compares next-token logits.  With pruning
and quantization disabled and a fresh cache, pos-shift attention equals
standard attention, so the only numerics gap is the int8 KV round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from spatten_tpu.config import (  # noqa: E402
    EngineConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
from spatten_tpu.engine.state import init_state  # noqa: E402
from spatten_tpu.models import forward  # noqa: E402
from spatten_tpu.models import hf_loader  # noqa: E402


def run_spatten(cfg_model, params, tokens):
    cfg = SpAttenConfig(
        model=cfg_model,
        pruning=PruningConfig(enable_token_pruning=False,
                              enable_v_pruning=False),
        quant=QuantConfig(enabled=False, enable_requant=False),
        engine=EngineConfig(max_batch_size=1, cache_capacity=64,
                            prefill_chunk=32, use_pallas=False),
    ).validate()
    state = init_state(cfg, batch=1)
    logits, _, _ = forward(params, cfg, state, jnp.asarray(tokens))
    return np.asarray(logits)


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()   # constructor leaves train mode (dropout) on
    d = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(d)
    return str(d), model


@pytest.fixture(scope="module")
def tiny_gpt2_dir(tmp_path_factory):
    cfg = transformers.GPT2Config(
        vocab_size=128, n_embd=32, n_layer=2, n_head=4, n_positions=64,
        n_inner=64,
    )
    torch.manual_seed(1)
    model = transformers.GPT2LMHeadModel(cfg)
    model.eval()   # constructor leaves train mode (dropout) on
    d = tmp_path_factory.mktemp("tiny_gpt2")
    model.save_pretrained(d)
    return str(d), model


def test_llama_logits_parity(tiny_llama_dir):
    path, hf_model = tiny_llama_dir
    mcfg, params = hf_loader.load_pretrained(path, dtype=jnp.float32)
    assert mcfg.num_kv_heads == 2 and mcfg.num_layers == 2

    tokens = np.array([[3, 17, 42, 9, 88, 120, 5]], np.int64)
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens)).logits.float().numpy()
    got = run_spatten(mcfg, params, tokens.astype(np.int32))

    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
    np.testing.assert_array_equal(got[0, -1].argmax(), want[0, -1].argmax())


def test_gpt2_logits_parity(tiny_gpt2_dir):
    path, hf_model = tiny_gpt2_dir
    mcfg, params = hf_loader.load_pretrained(path, dtype=jnp.float32)
    assert mcfg.model_type == "gpt2" and mcfg.use_abs_pos_emb

    tokens = np.array([[5, 99, 3, 64, 21, 77]], np.int64)
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens)).logits.float().numpy()
    got = run_spatten(mcfg, params, tokens.astype(np.int32))

    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
    np.testing.assert_array_equal(got[0, -1].argmax(), want[0, -1].argmax())


def test_config_from_hf_llama_dict():
    cfg = hf_loader.config_from_hf({
        "model_type": "llama", "vocab_size": 32000, "hidden_size": 4096,
        "num_hidden_layers": 32, "num_attention_heads": 32,
        "intermediate_size": 11008,
    })
    assert cfg.num_kv_heads == 32 and cfg.head_dim == 128
