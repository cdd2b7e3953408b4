"""Smoke-step every rearrange env flavor (the reference's highest-value test
tier: _list_rearrange_envs globs every env module and steps each,
/root/reference/robogym/envs/rearrange/tests/test_rearrange_envs.py:71-113)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SMALL_CST = dict(mujoco_substeps=2, stabilize_steps=1)
SMALL_PAR = dict(
    simulation_params=dict(num_objects=2, max_num_objects=2),
    robot_control_params=dict(control_mode="joint", tcp_solver_mode="mocap"),
)

FLAVORS = [
    "blocks",
    "blocks_train",
    "blocks_duplicate",
    "blocks_reach",
    "blocks_stack",
    "blocks_pickandplace",
    "ycb",
    "ycb_pickandplace",
    "composer",
]


@pytest.mark.parametrize("flavor", FLAVORS)
def test_rearrange_flavor_smoke(flavor):
    mod = importlib.import_module(f"robogym_tpu.envs.rearrange.{flavor}")
    kwargs = {}
    if flavor in ("ycb", "ycb_pickandplace", "composer"):
        kwargs["mesh_names"] = ["005_tomato_soup_can", "011_banana"]
    env = mod.make_env(dict(SMALL_CST), dict(SMALL_PAR), **kwargs)
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    assert "obj_pos" in obs and "tcp_force" in obs and "obj_colors" in obs
    step = jax.jit(env.step)
    for _ in range(2):
        state, obs, reward, done, info = step(
            state, jnp.zeros(env.action_size)
        )
    assert reward.shape == (3,)
    assert bool(jnp.isfinite(state.physics.qpos).all()), flavor
    for k, v in obs.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), (flavor, k)
    assert "env_crash" in info


def test_stack_goal_is_tower():
    from robogym_tpu.envs.rearrange import blocks_stack

    env = blocks_stack.make_env(dict(SMALL_CST), dict(SMALL_PAR))
    state, _ = jax.jit(env.reset)(jax.random.key(1))
    gp = np.asarray(state.goal["obj_pos"])[: env.num_objects]
    # same xy, increasing z
    np.testing.assert_allclose(gp[0, :2], gp[1, :2], atol=1e-6)
    assert abs(abs(gp[1, 2] - gp[0, 2]) - 2 * 0.0254) < 1e-5


def test_pickandplace_goal_in_air():
    from robogym_tpu.envs.rearrange import blocks_pickandplace

    env = blocks_pickandplace.make_env(dict(SMALL_CST), dict(SMALL_PAR))
    state, _ = jax.jit(env.reset)(jax.random.key(2))
    gp = np.asarray(state.goal["obj_pos"])
    _, _, table_h = env.idx.table_dimensions()
    assert gp[0, 2] > table_h + 0.05 - 0.01   # lifted by >= height_range[0]


def test_duplicate_single_color():
    from robogym_tpu.envs.rearrange import blocks_duplicate

    env = blocks_duplicate.make_env(dict(SMALL_CST), dict(SMALL_PAR))
    state, obs = jax.jit(env.reset)(jax.random.key(3))
    cols = np.asarray(obs["obj_colors"])[: env.num_objects]
    np.testing.assert_allclose(cols[0], cols[1], atol=1e-6)


def test_train_goal_distance_ratio():
    from robogym_tpu.envs.rearrange import blocks_train

    par = dict(SMALL_PAR)
    par["simulation_params"] = dict(
        num_objects=2, max_num_objects=2, goal_distance_ratio=0.0
    )
    env = blocks_train.make_env(dict(SMALL_CST, goal_generation="train"), par)
    state, obs = jax.jit(env.reset)(jax.random.key(4))
    # ratio 0 -> goals sit exactly at the current object positions
    cur = np.asarray(obs["obj_pos"])[: env.num_objects]
    gp = np.asarray(state.goal["obj_pos"])[: env.num_objects]
    np.testing.assert_allclose(cur, gp, atol=1e-5)
