"""DP x TP sharded decode on the virtual 8-device CPU mesh.

Checks that the shard_map'd engine produces the same tokens as the
single-device engine — TP psums and head-sharded pruning must be exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatten_tpu.config import (
    EngineConfig, MeshConfig, ModelConfig, PruningConfig, SpAttenConfig,
)
import spatten_tpu.engine.generate as gen
from spatten_tpu.models import transformer
from spatten_tpu.parallel import ShardedEngine, make_mesh


def small_cfg(data=2, model=2) -> SpAttenConfig:
    return SpAttenConfig(
        model=ModelConfig.tiny(),
        pruning=PruningConfig(start_size=2, important_size=8, recent_size=8,
                              v_keep_ratio=0.5, v_block_size=4),
        engine=EngineConfig(max_batch_size=4, cache_capacity=32,
                            prefill_chunk=8,
                            mesh=MeshConfig(data=data, model=model)),
    ).validate()


@pytest.fixture(scope="module")
def cfg():
    return small_cfg()


@pytest.fixture(scope="module")
def mesh(cfg):
    assert len(jax.devices()) >= 4, "conftest must force 8 CPU devices"
    return make_mesh(cfg.engine.mesh)


def test_sharded_matches_single_device(cfg, mesh):
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (4, 12), 0, 255)

    ref = gen.generate(params, cfg, prompt, max_new_tokens=8)

    eng = ShardedEngine(cfg, mesh)
    sharded_params = eng.shard_params(params)
    toks = eng.generate(sharded_params, prompt, max_new_tokens=8)

    # TP psums reassociate float adds, so a random tiny model can flip an
    # argmax on a near-tie late in decode; require early-step exactness and
    # near-total agreement overall.
    got, want = np.asarray(toks), np.asarray(ref.tokens)
    np.testing.assert_array_equal(got[:, :3], want[:, :3])
    agree = (got == want).mean()
    assert agree >= 0.85, f"only {agree:.0%} of tokens agree\n{got}\n{want}"


def test_sharded_prunes_within_capacity(cfg, mesh):
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(2), (4, 20), 0, 255)

    eng = ShardedEngine(cfg, mesh)
    sharded_params = eng.shard_params(params)
    state = eng.init_sharded_state(4)
    prefill = eng.prefill_step()
    decode = eng.decode_step()

    logits, state = prefill(sharded_params, state, prompt[:, :8])
    logits, state = prefill(sharded_params, state, prompt[:, 8:16])
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    for _ in range(25):
        token, state = decode(sharded_params, state, token)
    assert int(jax.device_get(state.lengths).max()) <= \
        cfg.engine.cache_capacity


def test_dp_only_mesh(cfg):
    c = small_cfg(data=4, model=1)
    mesh = make_mesh(c.engine.mesh)
    params = transformer.init_params(c.model, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (4, 6), 0, 255)
    ref = gen.generate(params, c, prompt, max_new_tokens=4)
    eng = ShardedEngine(c, mesh)
    toks = eng.generate(eng.shard_params(params), prompt, max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref.tokens))


def test_sharded_replicated_state_consistent(cfg, mesh):
    """SPMD consistency assert (SURVEY §5 sanitizer row): state the
    program treats as replicated — head masks, the requant counter —
    must hold identical bytes on every shard after prefill + decode."""
    from spatten_tpu.utils import debug as dbg
    params = transformer.init_params(cfg.model, jax.random.PRNGKey(2))
    prompt = jax.random.randint(jax.random.PRNGKey(3), (4, 12), 0, 255)
    eng = ShardedEngine(cfg, mesh)
    sharded_params = eng.shard_params(params)
    eng.generate(sharded_params, prompt, max_new_tokens=6)
    state = eng.last_state if hasattr(eng, "last_state") else None
    if state is None:
        # generate() may not retain state; run the step fns directly
        state = eng.init_sharded_state()
        prefill = eng.prefill_step()
        tokens = jax.device_put(np.asarray(prompt),
                                eng.named(jax.sharding.PartitionSpec(
                                    "data", None)))
        _, state = prefill(sharded_params, state, tokens)
    checked = 0
    for name in state._fields:
        leaf = getattr(state, name)
        for sub in jax.tree.leaves(leaf):
            if (hasattr(sub, "sharding")
                    and sub.sharding.is_fully_replicated
                    and sub.dtype != jnp.int8):
                mism = dbg.replicated_mismatch(sub)
                assert mism == 0.0, \
                    f"{name} diverged across shards by {mism}"
                checked += 1
    assert checked > 0, "no replicated leaves found to check"
