"""Rearrange blocks env tests.

Mirrors the reference rearrange tests
(/root/reference/robogym/envs/rearrange/tests/test_rearrange_envs.py smoke +
determinism subset) on the TPU build with a small world to bound compile
time on the 1-core CPU runner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.envs.rearrange.blocks import make_env


class _Shared:
    def __init__(self):
        self.env = make_env(
            dict(mujoco_substeps=2, stabilize_steps=1),
            dict(simulation_params=dict(num_objects=2, max_num_objects=3)),
        )
        self.reset = jax.jit(self.env.reset)
        self.step = jax.jit(self.env.step)

    def __getattr__(self, name):
        return getattr(self.env, name)


@pytest.fixture(scope="module")
def env():
    return _Shared()


def test_reset_places_objects_on_table(env):
    state, obs = env.reset(jax.random.key(0))
    pos = np.asarray(obs["obj_pos"])
    _, _, table_h = env.idx.table_dimensions()
    # active objects on the table surface, within the placement area
    lo, hi = env.idx.placement_bounds(env.num_objects)
    for i in range(env.num_objects):
        assert pos[i, 2] == pytest.approx(table_h + 0.0254, abs=0.02)
        assert lo[0] - 0.05 <= pos[i, 0] <= hi[0] + 0.05
        assert lo[1] - 0.05 <= pos[i, 1] <= hi[1] + 0.05
    # inactive slot masked to zero
    np.testing.assert_array_equal(pos[env.num_objects:], 0.0)


def test_objects_dont_overlap(env):
    state, obs = env.reset(jax.random.key(1))
    pos = np.asarray(obs["obj_pos"])[: env.num_objects]
    d01 = np.linalg.norm(pos[0, :2] - pos[1, :2])
    assert d01 > 0.02  # at least not coincident


def test_goal_in_placement_area(env):
    state, obs = env.reset(jax.random.key(2))
    goal = np.asarray(state.goal["obj_pos"])[: env.num_objects]
    lo, hi = env.idx.placement_bounds(env.num_objects)
    assert (goal[:, 0] >= lo[0] - 0.05).all() and (goal[:, 0] <= hi[0] + 0.05).all()
    assert (goal[:, 1] >= lo[1] - 0.05).all() and (goal[:, 1] <= hi[1] + 0.05).all()


def test_step_and_determinism(env):
    def rollout(seed):
        state, obs = env.reset(jax.random.key(seed))
        out = []
        akey = jax.random.key(50 + seed)
        for _ in range(3):
            akey, k = jax.random.split(akey)
            a = jax.random.uniform(k, (7,), minval=-1, maxval=1)
            state, obs, reward, done, info = env.step(state, a)
            out.append((obs, reward))
        return out

    t1, t2 = rollout(3), rollout(3)
    for (o1, r1), (o2, r2) in zip(t1, t2):
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        for k in o1:
            np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]))


def test_success_on_teleport_to_goal(env):
    """Teleporting objects into the goal -> num_success goal reward."""
    state, obs = env.reset(jax.random.key(4))
    d = sim_lib.set_object_poses(
        env.idx, state.physics, state.goal["obj_pos"], state.goal["obj_rot"]
    )
    state = state.replace(physics=d)
    state, obs, reward, done, info = env.step(state, jnp.zeros(7))
    assert bool(info["is_successful"])
    # goal-distance reward = newly successful objects (prev dist was large)
    assert float(reward[1]) >= env.num_objects - 1


def test_off_table_termination(env):
    state, obs = env.reset(jax.random.key(5))
    pos = state.goal["obj_pos"] * 0.0 + jnp.asarray([5.0, 5.0, 0.05])
    d = sim_lib.set_object_poses(
        env.idx, state.physics, pos, state.goal["obj_rot"]
    )
    state = state.replace(physics=d)
    state, obs, reward, done, info = env.step(state, jnp.zeros(7))
    assert bool(done)
    assert bool(np.asarray(info["objects_off_table"])[: env.num_objects].all())
