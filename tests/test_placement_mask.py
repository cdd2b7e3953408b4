"""Placement-area observation masking parity.

Mirrors /root/reference/robogym/envs/rearrange/tests/
test_object_in_placement_area.py (value table in world coordinates — valid
here because the world XML derives from the same reference assets) and the
masked-obs contract of common/base.py:311-374.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.envs.rearrange.blocks import make_env

KEYS_TO_MASK = [
    "goal_obj_pos",
    "goal_obj_rot",
    "rel_goal_obj_pos",
    "rel_goal_obj_rot",
    "obj_pos",
    "obj_rot",
    "obj_rel_pos",
    "obj_vel_pos",
    "obj_vel_rot",
    "obj_gripper_contact",
    "obj_bbox_size",
    "obj_colors",
]


@pytest.fixture(scope="module")
def masked_env():
    return make_env(
        dict(
            mask_obs_outside_placement_area=True,
            stabilize_objects=False,
            goal_args=dict(randomize_goal_rot=True),
        ),
        dict(simulation_params=dict(num_objects=2, max_num_objects=3)),
    )


# (test_object_in_placement_area.py:22-52 value table)
@pytest.mark.parametrize(
    "obj_pos,in_area,margin",
    [
        ([[1.45, 0.68, 0.5]], [True], 0.02),
        ([[1.15, 0.39, 0.5]], [True], 0.02),
        ([[1.10, 0.39, 0.5]], [False], 0.02),
        ([[1.10, 0.39, 0.5]], [True], 0.1),
        ([[1.75, 0.97, 0.5]], [True], 0.02),
        ([[1.80, 1.0, 0.5]], [False], 0.02),
        ([[1.15, 0.97, 0.5]], [True], 0.02),
        ([[1.10, 1.0, 0.5]], [False], 0.02),
        ([[1.75, 0.39, 0.5]], [True], 0.02),
        ([[1.75, 0.36, 0.5]], [False], 0.02),
        ([[1.75, 0.36, 0.5]], [True], 0.1),
        ([[1.15, 0.39, 0.5], [1.10, 0.39, 0.5]], [True, False], 0.02),
        ([[1.80, 1.0, 0.5], [1.15, 0.97, 0.5]], [False, True], 0.02),
        (
            [[1.80, 1.0, 0.5], [1.10, 1.0, 0.5], [1.75, 0.39, 0.5]],
            [False, False, True],
            0.02,
        ),
    ],
)
def test_in_placement_area_value_table(obj_pos, in_area, margin):
    n_obj = len(obj_pos)
    env = make_env(
        parameters=dict(simulation_params=dict(
            num_objects=n_obj, max_num_objects=4,
        )),
    )
    got = sim_lib.in_placement_area(
        env.idx, jnp.asarray(obj_pos, jnp.float32), n_obj, margin=margin,
    )
    assert np.array_equal(np.asarray(got), np.asarray(in_area))

    # padding slots report True (simulation/base.py:894-897)
    padded = jnp.concatenate(
        [jnp.asarray(obj_pos, jnp.float32), jnp.zeros((4 - n_obj, 3))]
    )
    active = jnp.arange(4) < n_obj
    got_pad = sim_lib.in_placement_area(
        env.idx, padded, n_obj, margin=margin, active_mask=active,
    )
    assert np.array_equal(np.asarray(got_pad[:n_obj]), np.asarray(in_area))
    assert np.all(np.asarray(got_pad[n_obj:]))


def test_soft_mask_probabilistic():
    """soft=True labels the margin band stochastically
    (simulation/base.py:887-889): a point `margin/2` outside flips with the
    shared uniform draw."""
    env = make_env(
        parameters=dict(simulation_params=dict(num_objects=1)),
    )
    # boundary min_x = 1.14705 -> x = 1.137 is ~10mm outside, inside the
    # 20mm margin band
    pos = jnp.asarray([[1.137, 0.5, 0.5]], jnp.float32)
    vals = [
        bool(sim_lib.in_placement_area(
            env.idx, pos, 1, margin=0.02, soft=True, key=jax.random.key(s),
        )[0])
        for s in range(30)
    ]
    assert any(vals) and not all(vals)
    # hard check at the same point: outside
    assert not bool(
        sim_lib.in_placement_area(env.idx, pos, 1, margin=0.002)[0]
    )


def test_masked_obs_contract(masked_env):
    """All masked_* keys exist, padding slots are masked to the key's value
    (mask=1), and teleporting an object out of the area zeroes its row."""
    env = masked_env
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    for k in KEYS_TO_MASK:
        assert f"masked_{k}" in obs, k
    assert obs["placement_mask"].shape == (3, 1)
    assert obs["goal_placement_mask"].shape == (3, 1)
    # on-table reset: objects are inside, mask all-ones
    assert np.all(np.asarray(obs["placement_mask"]) == 1.0)
    assert np.all(np.asarray(obs["goal_placement_mask"]) == 1.0)
    for k in KEYS_TO_MASK:
        np.testing.assert_allclose(
            np.asarray(obs[f"masked_{k}"]), np.asarray(obs[k]), rtol=1e-6
        )

    # teleport object 0 outside the placement area -> row masked to zero
    d = sim_lib.set_object_poses(
        env.idx, state.physics,
        jnp.asarray([[1.10, 0.30, 0.5], [1.45, 0.68, 0.5], [0.0, 0.0, 0.0]],
                    jnp.float32),
        jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (3, 1)),
    )
    from robogym_tpu.physics import step as physics

    d = physics.fwd_position(env.model, d)
    obs2 = env._observe(state.replace(physics=d))
    pm = np.asarray(obs2["placement_mask"])[:, 0]
    assert pm[0] == 0.0 and pm[1] == 1.0 and pm[2] == 1.0
    assert np.all(np.asarray(obs2["masked_obj_pos"])[0] == 0.0)
    assert np.any(np.asarray(obs2["masked_obj_pos"])[1] != 0.0)


def test_goal_placement_keys_in_goal(masked_env):
    state, _ = jax.jit(masked_env.reset)(jax.random.key(2))
    assert "goal_objects_in_placement_area" in state.goal
    assert "goal_in_placement_area" in state.goal
    # goals are sampled inside the area
    assert bool(state.goal["goal_in_placement_area"])


def test_obj_rel_pos_and_rel_goal_rot():
    """obj_rel_pos = obj_pos - tcp (simulation/base.py:426-433);
    rel_goal_obj_rot is the euler of the goal-relative quat."""
    env = make_env(
        dict(goal_args=dict(randomize_goal_rot=True),
             stabilize_objects=False),
        dict(simulation_params=dict(num_objects=2, max_num_objects=2)),
    )
    state, obs = jax.jit(env.reset)(jax.random.key(3))
    np.testing.assert_allclose(
        np.asarray(obs["obj_rel_pos"]),
        np.asarray(obs["obj_pos"]) - np.asarray(obs["gripper_pos"])[None],
        atol=1e-6,
    )
    from robogym_tpu.utils import rotation as rot

    cur_quat = sim_lib.object_quats(env.idx, state.physics)
    expect = jax.vmap(rot.quat2euler)(rot.quat_normalize(
        rot.quat_difference(state.goal["obj_rot"], cur_quat)
    ))
    np.testing.assert_allclose(
        np.asarray(obs["rel_goal_obj_rot"]), np.asarray(expect), atol=1e-5
    )
    # zero relative rotation when the object already has the goal rotation
    d = sim_lib.set_object_poses(
        env.idx, state.physics,
        sim_lib.object_positions(env.idx, state.physics),
        state.goal["obj_rot"],
    )
    obs3 = env._observe(state.replace(physics=d))
    mag = np.linalg.norm(np.asarray(obs3["rel_goal_obj_rot"]), axis=-1)
    assert np.all(mag < 1e-4)
