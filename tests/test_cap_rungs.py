"""Per-layer capacity rungs: static rung math + kernel cap_override parity.

The rungs bound each layer's live window near its cascade budget
(token_pruning.layer_capacities) and let the decode kernel compile
per-rung variants over a shared packed-plane prefix (fused_decode
cap_override).  Reference anchor: the cascade key_fetch_num decay
(workloads/summary-gpt2-small-wikitext2-per8.csv) is what makes deep
layers' windows small in the first place.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import (EngineConfig, ModelConfig, PruningConfig,
                                QuantConfig, SpAttenConfig)
from spatten_tpu.ops import quantize as qz
from spatten_tpu.ops.fused_decode import fused_decode_attention
from spatten_tpu.pruning import token_pruning as tp


def _cfg(cap=16384, layers=8, rungs=True, pruning=True, headroom=768):
    return SpAttenConfig(
        model=dataclasses.replace(ModelConfig.llama2_7b(),
                                  num_layers=layers, num_heads=4,
                                  num_kv_heads=4),
        pruning=PruningConfig(
            start_size=4, important_size=int(cap * 0.55),
            recent_size=int(cap * 0.10),
            cascade_layer_ratios=(1.0, 0.78, 0.25, 0.25, 0.25,
                                  0.14, 0.14, 0.14),
            enable_token_pruning=pruning,
            v_block_size=max(16, cap // 128)),
        engine=EngineConfig(cache_capacity=cap, layer_cap_rungs=rungs,
                            layer_cap_headroom=headroom),
    )


class TestRungMath:
    def test_rungs_are_2048_multiples_covering_keep(self):
        cfg = _cfg()
        caps = tp.layer_capacities(cfg)
        keeps = tp.layer_keep_max_static(cfg.pruning, 8)
        assert len(caps) == 8
        for c, k in zip(caps, keeps):
            assert c % 2048 == 0
            assert c <= cfg.engine.cache_capacity
            # headroom covers the configured minimum
            assert c - k >= cfg.engine.layer_cap_headroom
            # rungs share the serving pack unit
            assert qz.pack_unit(c) == qz.pack_unit(cfg.engine.cache_capacity)

    def test_rungs_decay_with_budgets(self):
        caps = tp.layer_capacities(_cfg())
        assert caps[0] > caps[-1]
        assert all(a >= b for a, b in zip(caps, caps[1:]))

    def test_flat_when_disabled_or_small(self):
        assert tp.layer_capacities(_cfg(rungs=False)) == (16384,) * 8
        assert tp.layer_capacities(_cfg(pruning=False)) == (16384,) * 8
        small = _cfg(cap=2048)
        assert tp.layer_capacities(small) == (2048,) * 8

    def test_groups_are_contiguous_partition(self):
        cfg = _cfg()
        groups = tp.layer_capacity_groups(cfg)
        caps = tp.layer_capacities(cfg)
        assert groups[0][0] == 0 and groups[-1][1] == 8
        for (a, b, c), (a2, b2, c2) in zip(groups, groups[1:]):
            assert b == a2 and c != c2
        for a, b, c in groups:
            assert all(caps[l] == c for l in range(a, b))


class TestKernelCapOverride:
    def _mk_kv(self, key, b, cap, hkv, d):
        x = jax.random.normal(key, (b, cap, hkv, d), jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=-1)
        sc = jnp.where(amax > 0, amax / 127.0, 1.0)
        q8 = jnp.clip(jnp.round(x / sc[..., None]), -127, 127
                      ).astype(jnp.int8).reshape(b, cap, hkv * d)
        return qz.QuantizedKV(full=q8, msb=qz.pack_msb(q8),
                              scale=sc.transpose(0, 2, 1))

    @pytest.mark.parametrize("rung", [2048])
    def test_override_matches_full_capacity(self, rung):
        """Outputs + rung-prefix cache updates identical with and without
        cap_override when lengths fit inside the rung (interpret mode)."""
        cap_total, b, hkv, group, d = 4096, 2, 2, 2, 16
        hq = hkv * group
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        kq = self._mk_kv(ks[0], b, cap_total, hkv, d)
        vq = self._mk_kv(ks[1], b, cap_total, hkv, d)
        q = jax.random.normal(ks[2], (b, hq, 1, d), jnp.float32)
        k_new = jax.random.normal(ks[3], (b, hkv, 1, d), jnp.float32)
        v_new = jax.random.normal(ks[4], (b, hkv, 1, d), jnp.float32)
        lengths = jnp.array([900, 1500], jnp.int32)
        imp = jnp.zeros((b, hkv, cap_total), jnp.float32)
        kwargs = dict(sm_scale=0.25, requant_threshold=0.3,
                      quant_enabled=True, v_keep=256, v_block_size=16,
                      importance_kind="prob", quantize_queries=True,
                      track_importance=True, interpret=True)
        out1, st1, k1, v1 = fused_decode_attention(
            q, kq, vq, k_new, v_new, lengths + 1, importance_in=imp,
            **kwargs)
        out2, st2, k2, v2 = fused_decode_attention(
            q, kq, vq, k_new, v_new, lengths + 1, importance_in=imp,
            cap_override=rung, **kwargs)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(st1.need_requant),
                                      np.asarray(st2.need_requant))
        np.testing.assert_array_equal(np.asarray(k1.full[:, :rung]),
                                      np.asarray(k2.full[:, :rung]))
        np.testing.assert_array_equal(np.asarray(v1.full[:, :rung]),
                                      np.asarray(v2.full[:, :rung]))
        np.testing.assert_array_equal(
            np.asarray(k1.msb[:, :rung // 2]),
            np.asarray(k2.msb[:, :rung // 2]))
        np.testing.assert_allclose(
            np.asarray(st1.importance_delta)[..., :rung],
            np.asarray(st2.importance_delta)[..., :rung],
            rtol=1e-5, atol=1e-6)

    def test_illegal_override_rejected(self):
        cap_total, b, hkv, d = 4096, 1, 2, 16
        kq = self._mk_kv(jax.random.PRNGKey(0), b, cap_total, hkv, d)
        vq = self._mk_kv(jax.random.PRNGKey(1), b, cap_total, hkv, d)
        q = jnp.zeros((b, hkv, 1, d))
        new = jnp.zeros((b, hkv, 1, d))
        with pytest.raises(AssertionError):
            fused_decode_attention(
                q, kq, vq, new, new, jnp.array([8], jnp.int32),
                cap_override=1000,  # not a pack-unit multiple
                quant_enabled=True, v_keep=0, v_block_size=8,
                interpret=True)


class TestEngineTriggers:
    def test_prune_triggers_at_layer_rung(self):
        """A layer crossing ITS rung (not global capacity) triggers."""
        import spatten_tpu.engine.generate as gen
        from spatten_tpu.engine.state import init_state

        cfg = _cfg(cap=8192, layers=8)
        cfg = dataclasses.replace(
            cfg, quant=QuantConfig(enabled=False, enable_requant=False))
        caps = tp.layer_capacities(cfg)
        assert caps[-1] < cfg.engine.cache_capacity
        state = init_state(cfg, batch=1)
        # put the LAST layer just over its rung
        ll = state.layer_lengths.at[-1, 0].set(caps[-1])
        state = state._replace(layer_lengths=ll,
                               lengths=jnp.max(ll, axis=0))
        new_state, trig = gen.maybe_prune(cfg, state, 1)
        assert bool(jax.device_get(trig)[0])
        keep = tp.layer_keep_max_static(cfg.pruning, 8)[-1]
        assert int(jax.device_get(new_state.layer_lengths)[-1, 0]) <= keep


class TestPruneSchedule:
    def test_host_schedule_matches_device_triggers(self):
        """prune_schedule_step's host bookkeeping reproduces the device
        trigger/keep sequence exactly (uniform lengths)."""
        import spatten_tpu.engine.generate as gen
        from spatten_tpu.engine.state import init_state

        cfg = _cfg(cap=8192, layers=4)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, num_layers=4),
            pruning=dataclasses.replace(
                cfg.pruning,
                cascade_layer_ratios=(1.0, 0.5, 0.25, 0.25)),
            quant=QuantConfig(enabled=False, enable_requant=False))
        L = 4
        state = init_state(cfg, batch=2)
        host = [0] * L
        n = 128
        import numpy as np
        for w in range(40):
            layers, host = gen.prune_schedule_step(cfg, host, n)
            st2, _ = gen.maybe_prune(cfg, state, n)
            dev_trig = np.asarray(jax.device_get(
                (state.layer_lengths + n
                 > jnp.asarray(tp.layer_capacities(cfg))[:, None]
                 ).any(axis=1)))
            assert set(np.nonzero(dev_trig)[0]) == set(layers), (w,)
            # append n to every layer like the decode window would
            ll = st2.layer_lengths + n
            state = st2._replace(layer_lengths=ll,
                                 lengths=jnp.max(ll, axis=0))
            got = [int(x) for x in np.asarray(
                jax.device_get(state.layer_lengths))[:, 0]]
            assert got == host, (w, got, host)

    def test_static_layers_matches_dynamic(self):
        """maybe_prune(static_layers=schedule) == maybe_prune(None)."""
        import spatten_tpu.engine.generate as gen
        from spatten_tpu.engine.state import init_state
        import numpy as np

        cfg = _cfg(cap=8192, layers=8)
        cfg = dataclasses.replace(
            cfg, quant=QuantConfig(enabled=False, enable_requant=False))
        caps = tp.layer_capacities(cfg)
        state = init_state(cfg, batch=2)
        # warm deterministic content + lengths crossing two rungs
        ll = state.layer_lengths.at[2].set(caps[2]).at[7].set(caps[7])
        key = jax.random.PRNGKey(0)
        kf = jax.random.randint(
            key, state.cache.k.full.shape, -127, 128, jnp.int8)
        k = state.cache.k._replace(full=kf)
        v = state.cache.v._replace(full=kf[::-1])
        imp = jax.random.uniform(key, state.importance.shape)
        state = state._replace(
            cache=state.cache._replace(k=k, v=v), importance=imp,
            layer_lengths=ll, lengths=jnp.max(ll, axis=0))
        dyn, _ = jax.jit(lambda s: gen.maybe_prune(cfg, s, 1))(state)
        stat, _ = jax.jit(lambda s: gen.maybe_prune(
            cfg, s, 1, static_layers=(2, 7)))(state)
        for a, b2 in zip(jax.tree.leaves(dyn), jax.tree.leaves(stat)):
            lla = np.asarray(jax.device_get(dyn.layer_lengths))
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(dyn.layer_lengths)),
            np.asarray(jax.device_get(stat.layer_lengths)))
        # compare live cache prefixes per layer
        kfa = np.asarray(jax.device_get(dyn.cache.k.full))
        kfb = np.asarray(jax.device_get(stat.cache.k.full))
        for l in range(8):
            live = int(lla[l].max())
            np.testing.assert_array_equal(kfa[l][:, :live],
                                          kfb[l][:, :live])
