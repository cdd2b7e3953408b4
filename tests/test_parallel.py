"""Sharded rollout tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-host tier via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.parallel import mesh as mesh_lib
from robogym_tpu.parallel import rollout as rollout_lib


@pytest.fixture(scope="module")
def env():
    from robogym_tpu.envs.dactyl.reach import make_env
    return make_env(dict(goal_stabilize_steps=0, mujoco_substeps=2),
                    dtype=jnp.float64)


def test_mesh_shapes():
    mesh = mesh_lib.make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = mesh_lib.make_mesh(8, tp=1)
    assert mesh.shape == {"dp": 8, "tp": 1}


def test_sharded_rollout(env):
    mesh = mesh_lib.make_mesh(8, tp=1)
    B = 16
    state_b, obs_b = rollout_lib.sharded_reset(env, mesh, B, jax.random.key(0))
    # batch axis is sharded over dp
    sh = state_b.physics.qpos.sharding
    assert sh.spec == jax.sharding.PartitionSpec("dp")
    fn = rollout_lib.make_rollout_fn(env, mesh, n_steps=3)
    state_b, metrics = fn(state_b, jax.random.key(1))
    assert np.isfinite(float(metrics["reward_mean"]))
    assert 0.0 <= float(metrics["done_frac"]) <= 1.0
    assert bool(jnp.isfinite(state_b.physics.qpos).all())


def test_shardmap_rollout_pmean_metrics(env):
    """Explicit shard_map path: metrics are pmean-reduced over dp and must be
    finite/identical across shards (collective correctness)."""
    mesh = mesh_lib.make_mesh(8, tp=1)
    B = 16
    state_b, _ = rollout_lib.sharded_reset(env, mesh, B, jax.random.key(2))
    fn = rollout_lib.make_shardmap_rollout_fn(env, mesh, n_steps=3)
    state_b, metrics = fn(state_b, jax.random.key(3))
    assert np.isfinite(float(metrics["reward_mean"]))
    assert 0.0 <= float(metrics["done_frac"]) <= 1.0
    assert bool(jnp.isfinite(state_b.physics.qpos).all())


def test_sharded_matches_unsharded(env):
    """dp sharding must not change results: same keys, same trajectory."""
    B = 8
    keys = jax.random.split(jax.random.key(5), B)
    state_ref, _ = jax.jit(jax.vmap(env.reset))(keys)
    mesh = mesh_lib.make_mesh(8, tp=1)
    state_sh, _ = rollout_lib.sharded_reset(env, mesh, B, jax.random.key(5))
    np.testing.assert_allclose(
        np.asarray(state_ref.physics.qpos), np.asarray(state_sh.physics.qpos),
        atol=1e-12,
    )
