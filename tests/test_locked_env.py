"""Dactyl locked-cube env tests (TPU build).

Mirrors the reference locked-env tests
(/root/reference/robogym/envs/dactyl/tests/test_locked.py): seed determinism,
goal semantics (parallel quats), on-palm reset invariant, tracker/multi-goal
bookkeeping, and drop detection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs.dactyl import cube_env
from robogym_tpu.envs.dactyl.locked import LockedEnvConstants, make_env
from robogym_tpu.utils import rotation as rot


class _Shared:
    """One env + one jitted reset/step shared by every test (compiles once)."""

    def __init__(self):
        # small config to keep CPU compile times down: fewer substeps and no
        # random warmup; physics semantics unchanged.
        self.env = make_env(
            dict(
                mujoco_substeps=2,
                n_random_initial_steps=0,
                reset_initial_steps=5,
                max_pose_resets=2,
            ),
            dtype=jnp.float64,
        )
        self.reset = jax.jit(self.env.reset)
        self.step = jax.jit(self.env.step)

    def __getattr__(self, name):
        return getattr(self.env, name)


@pytest.fixture(scope="module")
def env():
    return _Shared()


def test_reset_on_palm_and_shapes(env):
    state, obs = env.reset(jax.random.key(3))
    assert bool(cube_env.is_on_palm(env.cube, state.physics))
    assert obs["cube_pos"].shape == (3,)
    assert obs["cube_quat"].shape == (4,)
    assert obs["hand_angle"].shape == (24,)
    assert obs["fingertip_pos"].shape == (15,)
    assert obs["goal_quat"].shape == (4,)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(obs["cube_quat"])), 1.0, atol=1e-6
    )


def test_goal_is_parallel_quat(env):
    """LockedParallelGoal: goal quat must equal z_quat * parallel_quat, i.e.
    rotating a cube by it leaves the cube axis-aligned
    (goals/locked_parallel.py:32-47)."""
    state, _ = env.reset(jax.random.key(0))
    goal_quat = np.asarray(state.goal["cube_quat"])
    # goal = Rz(theta) @ P with P in the cube group, so the world z-axis
    # expressed in the cube frame (third ROW of R) is a signed basis vector
    mat = np.asarray(rot.quat2mat(jnp.asarray(goal_quat)))
    row = np.abs(mat[2, :])
    assert np.isclose(row.max(), 1.0, atol=1e-6)


def test_seed_determinism(env):
    """Same seed -> identical obs trajectory (test_locked.py:145-206)."""
    step = env.step
    reset = env.reset

    def rollout(seed):
        state, obs = reset(jax.random.key(seed))
        traj = [obs]
        a_key = jax.random.key(100 + seed)
        for _ in range(3):
            a_key, k = jax.random.split(a_key)
            a = jax.random.uniform(k, (20,), minval=-1, maxval=1)
            state, obs, r, d, i = step(state, a)
            traj.append(obs)
        return traj

    t1, t2 = rollout(7), rollout(7)
    for o1, o2 in zip(t1, t2):
        for k in o1:
            np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]))

    # different seed -> different cube pose
    t3 = rollout(8)
    assert not np.allclose(
        np.asarray(t1[0]["cube_quat"]), np.asarray(t3[0]["cube_quat"])
    )


def test_step_reward_structure(env):
    state, _ = env.reset(jax.random.key(1))
    step = env.step
    state, obs, reward, done, info = step(state, jnp.zeros(20))
    assert reward.shape == (3,)  # [env, goal-distance, success]
    assert bool(jnp.isfinite(reward).all())
    assert bool(jnp.isfinite(state.physics.qpos).all())
    assert info["successes_so_far"].dtype == jnp.int32


def test_success_triggers_goal_resample(env):
    """Teleport the cube into the goal orientation -> success + new goal
    (multi_goal_tracker.py:157-241 semantics)."""
    state, _ = env.reset(jax.random.key(2))
    # write goal orientation directly into the cube ball joint
    qpos = state.physics.qpos.at[jnp.asarray(env.cube.cube_rot_qpos)].set(
        state.goal["cube_quat"]
    )
    state = state.replace(physics=state.physics.replace(qpos=qpos))
    old_goal = np.asarray(state.goal["cube_quat"])
    step = env.step
    state, obs, reward, done, info = step(state, jnp.zeros(20))
    # cube may drift slightly in one step but should still be successful
    assert bool(info["is_successful"])
    assert int(info["successes_so_far"]) == 1
    assert float(reward[2]) == env.constants.success_reward
    assert not bool(done)
    new_goal = np.asarray(state.goal["cube_quat"])
    assert not np.allclose(old_goal, new_goal)


def test_drop_detection(env):
    """Cube below palm -> done + drop penalty (wrappers/cube.py:106-150)."""
    state, _ = env.reset(jax.random.key(4))
    qpos = state.physics.qpos.at[jnp.asarray(env.cube.cube_pos_qpos)].set(
        jnp.asarray([0.0, 0.0, -0.5], state.physics.qpos.dtype)
    )
    state = state.replace(physics=state.physics.replace(qpos=qpos))
    state, obs, reward, done, info = env.step(state, jnp.zeros(20))
    assert bool(done)
    assert float(reward[0]) == env.constants.drop_reward


def test_vmap_batch(env):
    """vmapped reset/step over a small batch stays finite and independent."""
    B = 4
    keys = jax.random.split(jax.random.key(0), B)
    state, obs = jax.jit(jax.vmap(env.env.reset))(keys)
    assert obs["cube_quat"].shape == (B, 4)
    actions = jnp.zeros((B, 20))
    state, obs, reward, done, info = jax.jit(jax.vmap(env.env.step))(state, actions)
    assert reward.shape == (B, 3)
    assert bool(jnp.isfinite(obs["qpos"]).all())
    # batch members differ (independent RNG streams)
    assert not np.allclose(np.asarray(obs["cube_quat"][0]), np.asarray(obs["cube_quat"][1]))


def test_locked_dummy_vision_provider():
    """The vision-flagged locked variant routes through the observation
    provider framework: zero-image `vision`/`vision_goal` keys with RESET_
    GOAL staging (reference observation/dummy_vision.py:11-53 default)."""
    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(dict(
        mujoco_substeps=2, n_random_initial_steps=0, reset_initial_steps=1,
        max_pose_resets=1, vision_observation_provider="dummy_vision",
        vision_image_size=16,
    ), dtype=jnp.float64)
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    assert obs["vision"].shape == (3, 16, 16, 3)
    assert obs["vision_goal"].shape == (3, 16, 16, 3)
    assert not np.any(np.asarray(obs["vision"]))
    state, obs, reward, done, info = jax.jit(env.step)(
        state, jnp.zeros(env.action_size)
    )
    assert obs["vision"].shape == (3, 16, 16, 3)
