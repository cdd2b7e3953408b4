"""End-to-end vision observations: raycast providers wired into locked and
blocks (reference parity: vision obs keys + goal-image staleness semantics,
robogym/envs/rearrange/common/base.py:61-63 + observation/goal.py:46-82)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def locked_vision_env():
    from robogym_tpu.envs.dactyl.locked import make_env

    return make_env(
        constants=dict(
            vision_observation_provider="raycast", vision_image_size=16
        )
    )


def test_locked_raycast_obs(locked_vision_env):
    env = locked_vision_env
    assert env.model.const.ncam == 3
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs["vision"].shape == (3, 16, 16, 3)
    assert obs["vision"].dtype == jnp.uint8
    assert obs["vision_goal"].shape == (3, 16, 16, 3)
    # a real render: non-constant image
    assert int(jnp.ptp(obs["vision"])) > 10
    # goal image hides the hand: must differ from the live image
    assert bool(jnp.any(obs["vision"] != obs["vision_goal"]))

    step = jax.jit(env.step)
    state2, obs2, reward, done, info = step(state, jnp.zeros(env.action_size))
    assert obs2["vision"].shape == (3, 16, 16, 3)
    # goal unchanged after one non-success step -> cached goal image is
    # bit-identical (RESET_GOAL staleness semantics)
    np.testing.assert_array_equal(
        np.asarray(obs2["vision_goal"]), np.asarray(obs["vision_goal"])
    )


def test_blocks_vision_obs():
    from robogym_tpu.envs.rearrange.blocks import make_env

    env = make_env(
        constants=dict(vision=True, vision_image_size=16),
        parameters=dict(simulation_params=dict(num_objects=1,
                                               max_num_objects=1)),
    )
    assert env.model.const.ncam >= 2  # vision_cam_front + vision_cam_wrist
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    assert obs["vision_obs"].shape == (1, 16, 16, 3)
    assert obs["vision_obs_mobile"].shape == (1, 16, 16, 3)
    assert obs["vision_goal"].shape == (1, 16, 16, 3)
    assert int(jnp.ptp(obs["vision_obs"])) > 10
    # goal render hides the robot but keeps the scene: images differ
    assert bool(jnp.any(obs["vision_obs"] != obs["vision_goal"]))
