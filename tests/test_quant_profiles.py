"""Per-layer quantization profiles (4/6/8-bit pass-1) — the reference's
per-request QuantProfile (SpAtten.scala:71-74, MatrixFetcher.scala:48-51)
realized as policy-as-data: DecodeState.quant_bits + an lsb2 bit plane."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import (
    EngineConfig, ModelConfig, PruningConfig, QuantConfig, SpAttenConfig,
)
from spatten_tpu.ops import quantize as qz


def rand_q8(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


def test_lsb2_pack_roundtrip():
    q8 = rand_q8(jax.random.PRNGKey(0), (2, 16, 6))
    packed = qz.pack_lsb2(q8)
    assert packed.shape == (2, 4, 6)
    got = qz.unpack_lsb2(packed)
    want = (q8.astype(jnp.int32) >> 2) & 0x3
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dequantize_6bit_matches_reference_values():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 4))  # [B,H,T,D]
    q = qz.quantize(x, with_lsb2=True)
    got = qz.dequantize_6bit(q)
    q8_hm = jnp.moveaxis(
        q.full.reshape(2, 8, 3, 4), -2, -3)                    # [B,H,T,D]
    want = qz.pass1_reference_values(q8_hm, 6) * q.scale[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_update_token_maintains_lsb2():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 8, 4))                       # [H, T, D]
    q = qz.quantize(x, with_lsb2=True)
    x_new = jax.random.normal(jax.random.PRNGKey(3), (2, 4))
    for slot in (0, 2, 5, 7):
        q2 = qz.update_token(q, x_new, jnp.int32(slot))
        np.testing.assert_array_equal(
            np.asarray(q2.lsb2), np.asarray(qz.pack_lsb2(q2.full)),
            err_msg=f"slot {slot}")


def test_gather_tokens_repacks_lsb2():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 4))
    q = qz.quantize(x, with_lsb2=True)
    idx = jnp.array([[0, 2, 3, 7], [1, 4, 5, 6]], jnp.int32)
    g = qz.gather_tokens(q, idx)
    np.testing.assert_array_equal(
        np.asarray(g.lsb2), np.asarray(qz.pack_lsb2(g.full)))


@pytest.mark.parametrize("bits,plane_fn", [
    (4, qz.dequantize_msb), (6, qz.dequantize_6bit),
    (8, qz.dequantize_full)])
def test_attention_ref_honors_pass1_bits(bits, plane_fn):
    from spatten_tpu.ops.attention_ref import spatten_attention_reference
    from spatten_tpu.ops.rope import rope_table

    b, hq, hkv, cap, d = 2, 4, 2, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, hq, 1, d))
    k = jax.random.normal(ks[1], (b, hkv, cap, d))
    v = jax.random.normal(ks[2], (b, hkv, cap, d))
    kq = qz.quantize(k, with_lsb2=True)
    vq = qz.quantize(v, with_lsb2=True)
    cos, sin = rope_table(cap, d)
    length = jnp.array([10, 7], jnp.int32)
    pos = jnp.array([[9], [6]], jnp.int32)

    out, stats = spatten_attention_reference(
        q, kq, vq, cos, sin, length, pos, sm_scale=0.3,
        pass1_bits=jnp.int32(bits), use_rope=False)

    # oracle: softmax over the selected plane's dequantization
    kf = plane_fn(kq)
    krep = jnp.repeat(kf, hq // hkv, axis=1)
    s = jnp.einsum("bhqd,bhcd->bhqc", q, krep) * 0.3
    mask = (jnp.arange(cap)[None, None, None, :]
            < length[:, None, None, None]) & \
           (jnp.arange(cap)[None, None, None, :]
            <= pos[:, None, :, None])
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask, p, 0.0)
    vrep = jnp.repeat(qz.dequantize_full(vq), hq // hkv, axis=1)
    want = jnp.einsum("bhqc,bhcd->bhqd", p, vrep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_8bit_pass1_never_requants():
    from spatten_tpu.ops.attention_ref import spatten_attention_reference
    from spatten_tpu.ops.rope import rope_table

    b, hq, hkv, cap, d = 1, 2, 2, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(ks[0], (b, hq, 1, d))
    kq = qz.quantize(jax.random.normal(ks[1], (b, hkv, cap, d)),
                     with_lsb2=True)
    vq = qz.quantize(jax.random.normal(ks[2], (b, hkv, cap, d)),
                     with_lsb2=True)
    cos, sin = rope_table(cap, d)
    length = jnp.array([12], jnp.int32)
    pos = jnp.array([[11]], jnp.int32)
    # threshold 1.0: everything is "low confidence"
    _, stats8 = spatten_attention_reference(
        q, kq, vq, cos, sin, length, pos, sm_scale=0.3,
        requant_threshold=1.0, pass1_bits=jnp.int32(8), use_rope=False)
    assert not bool(np.asarray(stats8.need_requant).any())
    _, stats4 = spatten_attention_reference(
        q, kq, vq, cos, sin, length, pos, sm_scale=0.3,
        requant_threshold=1.0, pass1_bits=jnp.int32(4), use_rope=False)
    assert bool(np.asarray(stats4.need_requant).all())


def mixed_cfg(layer_bits=(6, 8)):
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8,
                              recent_size=8, v_block_size=4,
                              enable_v_pruning=False),
        quant=QuantConfig(enabled=True, enable_requant=True,
                          requant_threshold=1.0,      # always fire (if <8b)
                          layer_bits=layer_bits),
        engine=EngineConfig(max_batch_size=2, cache_capacity=32,
                            prefill_chunk=8),
    ).validate()


def test_engine_mixed_profile_runs_and_gates_requant():
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.models import transformer

    cfg = mixed_cfg((6, 8))
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    state = init_state(cfg, batch=2)
    assert state.cache.k.lsb2 is not None
    np.testing.assert_array_equal(np.asarray(state.quant_bits), [6, 8])

    step = jax.jit(transformer.forward, static_argnums=(1,))
    toks = jnp.arange(6, dtype=jnp.int32)[None, :] % 256
    toks = jnp.broadcast_to(toks, (2, 6))
    logits, state, _ = step(params, cfg, state, toks)
    assert bool(jnp.isfinite(logits).all())
    # decode one token: requant fires on the 6-bit layer only (threshold=1)
    logits, state, aux = step(params, cfg, state,
                              jnp.zeros((2, 1), jnp.int32))
    maxp = np.asarray(aux.max_probs)                 # [L, B, Hkv]
    assert maxp.shape[0] == 2
    # the requant_events counter only counts sub-8-bit layers
    events = int(np.asarray(state.requant_events))
    hkv, b = cfg.model.num_kv_heads, 2
    # 7 appended tokens -> 7 steps' worth of requant on layer 0 only
    assert events <= 7 * b * hkv * 1 + b * hkv  # layer 1 contributes none


def test_trace_emits_mixed_bits():
    from spatten_tpu.engine.trace import collect_trace
    from spatten_tpu.models import transformer

    cfg = mixed_cfg((6, 8))
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jnp.arange(5, dtype=jnp.int32)[None, :] % 256
    rows = collect_trace(params, cfg, prompt, 3)
    bits_by_layer = {r.layer_id: r.quant_key_bit for r in rows}
    assert bits_by_layer == {0: 6, 1: 8}
    assert all(not r.if_requant for r in rows if r.layer_id == 1)


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_fused_kernel_honors_pass1_bits(bits):
    """The fused decode kernel selects its pass-1 plane set at runtime
    from the scalar-prefetched quant_bits array (interpret mode)."""
    from spatten_tpu.engine import kv_cache as kvc
    from spatten_tpu.ops.attention_ref import spatten_attention_reference
    from spatten_tpu.ops.fused_decode import fused_decode_attention
    from spatten_tpu.ops.rope import rope_table

    b, hq, hkv, cap, d = 2, 4, 2, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    qh = jax.random.normal(ks[0], (b, hq, 1, d))
    k = jax.random.normal(ks[1], (b, hkv, cap, d))
    v = jax.random.normal(ks[2], (b, hkv, cap, d))
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d))
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d))
    kq = qz.quantize(k, with_lsb2=True)
    vq = qz.quantize(v)
    cos, sin = rope_table(cap, d)
    lengths = jnp.array([50, 23], jnp.int32)

    kwargs = dict(sm_scale=0.2, requant_threshold=0.3, quant_enabled=True)
    cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                  k_new, v_new, lengths - 1)
    ref_out, ref_stats = spatten_attention_reference(
        qh, cache_ref.k, cache_ref.v, cos, sin, lengths,
        lengths[:, None] - 1, use_rope=False,
        pass1_bits=jnp.int32(bits), **kwargs)

    ker_out, ker_stats, k2, v2 = fused_decode_attention(
        qh, kq, vq, k_new, v_new, lengths,
        quant_bits=jnp.array([bits], jnp.int32),
        interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ker_stats.need_requant),
                                  np.asarray(ref_stats.need_requant))
    if bits == 8:
        assert not np.asarray(ker_stats.need_requant).any()
    # the lsb2 plane is maintained by the in-kernel append RMW
    np.testing.assert_array_equal(
        np.asarray(qz.pack_lsb2(k2.full)), np.asarray(k2.lsb2))


def test_fused_kernel_mixed_profile_stacked():
    """Stacked-layer mode: each layer's scalar-prefetched bits select a
    different pass-1 plane set (engine-level, via the layer scan)."""
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.models import transformer

    cfg = mixed_cfg((4, 6))
    import dataclasses
    cfg = dataclasses.replace(cfg, quant=dataclasses.replace(
        cfg.quant, requant_threshold=0.0, enable_requant=False)).validate()
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(3))
    toks = jnp.broadcast_to(jnp.arange(6, dtype=jnp.int32)[None] % 256,
                            (2, 6))

    # jnp reference path (use_pallas off)
    cfg_ref = dataclasses.replace(cfg, engine=dataclasses.replace(
        cfg.engine, use_pallas=False))
    st_r = init_state(cfg_ref, batch=2)
    step_r = jax.jit(transformer.forward, static_argnums=(1,))
    lg_r, st_r, _ = step_r(params, cfg_ref, st_r, toks)
    lg_r2, _, _ = step_r(params, cfg_ref, st_r,
                         jnp.zeros((2, 1), jnp.int32))

    # kernel path (interpret on CPU)
    st_k = init_state(cfg, batch=2)
    step_k = jax.jit(transformer.forward, static_argnums=(1,))
    lg_k, st_k, _ = step_k(params, cfg, st_k, toks)
    lg_k2, _, _ = step_k(params, cfg, st_k, jnp.zeros((2, 1), jnp.int32))
    # prefill runs the same jnp path; the decode step runs the kernel
    np.testing.assert_allclose(np.asarray(lg_k2), np.asarray(lg_r2),
                               atol=2e-4, rtol=1e-3)


def test_bf16_importance_matches_f32_pruning_decisions():
    """bf16 importance storage is a ranking signal: the cascade prune
    keeps (nearly) the same tokens as f32 accumulation."""
    from spatten_tpu.engine.state import init_state
    from spatten_tpu.models import transformer
    import spatten_tpu.engine.generate as gen

    def run(dtype):
        cfg = SpAttenConfig(
            model=ModelConfig.tiny(),
            pruning=PruningConfig(start_size=2, important_size=8,
                                  recent_size=8, v_block_size=4,
                                  importance_dtype=dtype),
            quant=QuantConfig(requant_threshold=0.1),
            engine=EngineConfig(max_batch_size=1, cache_capacity=32,
                                prefill_chunk=8),
        ).validate()
        params = transformer.init_params(cfg.model, jax.random.PRNGKey(4))
        prompt = (jnp.arange(14, dtype=jnp.int32) * 7)[None] % 255
        r = gen.generate(params, cfg, prompt, max_new_tokens=24)
        return np.asarray(r.tokens)

    t32 = run("float32")
    t16 = run("bfloat16")
    # decode trajectories agree (identical pruning keeps identical tokens)
    assert (t32 == t16).mean() > 0.9, (t32, t16)


@pytest.mark.parametrize("bpp", [2, 4])
def test_fused_kernel_6bit_batch_group(bpp):
    """6-bit mixed profile (has_lsb2) with batch grouping (bpp > 1): the
    new-row patch6 term must expand each member's k6 row onto ITS rows
    (regression: round-3 multiplied [R, slab] by [bpp, slab])."""
    from spatten_tpu.engine import kv_cache as kvc
    from spatten_tpu.ops.attention_ref import spatten_attention_reference
    from spatten_tpu.ops.fused_decode import fused_decode_attention
    from spatten_tpu.ops.rope import rope_table

    b, hq, hkv, cap, d = 4, 4, 2, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(29), 5)
    qh = jax.random.normal(ks[0], (b, hq, 1, d))
    k = jax.random.normal(ks[1], (b, hkv, cap, d))
    v = jax.random.normal(ks[2], (b, hkv, cap, d))
    k_new = jax.random.normal(ks[3], (b, hkv, 1, d))
    v_new = jax.random.normal(ks[4], (b, hkv, 1, d))
    kq = qz.quantize(k, with_lsb2=True)
    vq = qz.quantize(v)
    cos, sin = rope_table(cap, d)
    lengths = jnp.array([50, 23, 64, 9], jnp.int32)

    kwargs = dict(sm_scale=0.2, requant_threshold=0.3, quant_enabled=True)
    cache_ref = kvc.append_tokens(kvc.LayerKVCache(k=kq, v=vq),
                                  k_new, v_new, lengths - 1)
    ref_out, ref_stats = spatten_attention_reference(
        qh, cache_ref.k, cache_ref.v, cos, sin, lengths,
        lengths[:, None] - 1, use_rope=False,
        pass1_bits=jnp.int32(6), **kwargs)
    ker_out, ker_stats, k2, v2 = fused_decode_attention(
        qh, kq, vq, k_new, v_new, lengths,
        quant_bits=jnp.array([6], jnp.int32),
        interpret=True, _bpp_override=bpp, **kwargs)
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ker_stats.need_requant),
                                  np.asarray(ref_stats.need_requant))
    np.testing.assert_array_equal(
        np.asarray(qz.pack_lsb2(k2.full)), np.asarray(k2.lsb2))
