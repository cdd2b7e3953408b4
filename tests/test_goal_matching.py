"""Goal-generation parity: duplicate-object greedy matching, goal
rotation randomization quality, and goal stabilization.

Mirrors /root/reference/robogym/envs/rearrange/tests/
test_goal_generation.py against the functional generators.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.utils import rotation as rot


def test_relative_pos_for_duplicated_objects():
    """Value table of test_goal_generation.py:96-150: groups [3, 2, 1],
    greedy within-group matching gives these exact relative positions and
    zero relative rotations."""
    cur_rot = np.array([
        [0, 0, np.pi / 2], [np.pi / 2, 0, 0], [0, np.pi / 2, 0],
        [np.pi / 2, 0, 0], [0, np.pi / 2, 0], [np.pi / 2, 0, 0],
    ])
    cur_pos = np.array(
        [[2, 2, 2], [3, 3, 4], [0, 1, 1], [1, 2, 3], [1, 1, 1], [5, 5, 6]],
        np.float32,
    )
    goal_rot = np.array([
        [0, np.pi / 2, 0], [0, 0, np.pi / 2], [np.pi / 2, 0, 0],
        [0, np.pi / 2, 0], [np.pi / 2, 0, 0], [np.pi / 2, 0, 0],
    ])
    goal_pos = np.array(
        [[1, 1, 1], [2, 2, 2], [3, 3, 3], [1, 1, 1], [1, 2, 3], [6, 5, 6]],
        np.float32,
    )
    group_ids = jnp.asarray([0, 0, 0, 1, 1, 2])
    active = jnp.ones(6, bool)

    match = goals_lib.greedy_group_match(
        jnp.asarray(cur_pos), jnp.asarray(goal_pos), group_ids, active
    )
    rel_pos = np.asarray(goal_pos)[np.asarray(match)] - cur_pos
    np.testing.assert_allclose(
        rel_pos,
        np.array([[0, 0, 0], [0, 0, -1], [1, 0, 0],
                  [0, 0, 0], [0, 0, 0], [1, 0, 0]]),
        atol=1e-6,
    )
    qc = jax.vmap(rot.euler2quat)(jnp.asarray(cur_rot, jnp.float32))
    qg = jax.vmap(rot.euler2quat)(jnp.asarray(goal_rot, jnp.float32))
    rel_rot = goals_lib.relative_rot_euler(qg[np.asarray(match)], qc)
    np.testing.assert_allclose(np.asarray(rel_rot), np.zeros((6, 3)),
                               atol=1e-5)


def test_greedy_match_respects_groups_and_padding():
    pos = jnp.asarray(
        [[0.0, 0, 0], [1.0, 0, 0], [5.0, 0, 0], [9.0, 0, 0]], jnp.float32
    )
    goal = jnp.asarray(
        [[1.0, 0, 0], [0.0, 0, 0], [5.0, 0, 0], [0.0, 0, 0]], jnp.float32
    )
    # objects 0,1 interchangeable; 2 singleton; 3 inactive padding
    group_ids = jnp.asarray([0, 0, 1, 2])
    active = jnp.asarray([True, True, True, False])
    match = np.asarray(goals_lib.greedy_group_match(pos, goal, group_ids,
                                                    active))
    assert match[0] == 1 and match[1] == 0   # swapped within group
    assert match[2] == 2                      # singleton -> itself
    assert match[3] == 3                      # padding -> identity


@pytest.mark.parametrize("rot_type", ["z_axis", "block", "full"])
def test_randomize_goal_orientation(rot_type):
    """(test_goal_generation.py:52-92): z_axis goals stay z-aligned, block
    goals keep a face up, full goals include unaligned poses."""
    args = goals_lib.GoalArgs(
        randomize_goal_rot=True, rot_randomize_type=rot_type
    )
    quats = np.concatenate([
        np.asarray(goals_lib.sample_goal_rotations(jax.random.key(s), 4,
                                                   args))
        for s in range(25)
    ])
    assert quats.std() > 0.0
    z_ok = [bool(rot.rot_z_aligned(jnp.asarray(q), 0.02,
                                   include_flip=False)) for q in quats]
    xyz_ok = [bool(rot.rot_xyz_aligned(jnp.asarray(q), 0.02))
              for q in quats]
    if rot_type == "z_axis":
        assert all(z_ok)
    elif rot_type == "block":
        assert all(xyz_ok)
    else:
        assert not all(xyz_ok)


def test_stabilize_goal_objects():
    """(test_goal_generation.py:14-48): goals placed in the air settle onto
    the table when goal_args.stabilize_goal is on, without disturbing the
    real objects."""
    from robogym_tpu.envs.rearrange import simulation as sim_lib
    from robogym_tpu.envs.rearrange.blocks import make_env

    env = make_env(
        dict(goal_args=dict(randomize_goal_rot=True, stabilize_goal=True),
             stabilize_objects=False),
        dict(simulation_params=dict(num_objects=2, max_num_objects=2)),
    )
    assert env.goal_gen.args.stabilize_goal
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    obj_pos = np.asarray(sim_lib.object_positions(env.idx, state.physics))
    goal_pos = np.asarray(state.goal["obj_pos"])
    _, _, table_height = env.idx.table_dimensions()
    # settled goals rest at block height on the table, not in the air
    size = float(env.parameters.simulation_params.object_size)
    assert np.all(goal_pos[:, 2] < table_height + 3 * size)
    assert np.all(goal_pos[:, 2] > table_height)
    # the real objects were untouched by the scratch settle
    state2, _, _, _, _ = jax.jit(env.step)(
        state, jnp.zeros(env.action_size)
    )
    assert np.all(np.isfinite(np.asarray(state2.physics.qpos)))
    assert np.allclose(
        obj_pos, np.asarray(sim_lib.object_positions(env.idx, state.physics))
    )


def test_duplicate_env_goal_matching_end_to_end():
    """blocks_duplicate: swapping two identical blocks' positions is goal
    distance zero after matching."""
    from robogym_tpu.envs.rearrange import simulation as sim_lib
    from robogym_tpu.envs.rearrange.blocks_duplicate import make_env

    env = make_env(
        dict(stabilize_objects=False),
        dict(simulation_params=dict(num_objects=2, max_num_objects=2)),
    )
    state, _ = jax.jit(env.reset)(jax.random.key(1))
    assert "group_ids" in state.goal
    np.testing.assert_array_equal(np.asarray(state.goal["group_ids"]),
                                  np.zeros(2))
    active = env._active_mask()
    # teleport objects to the SWAPPED goal positions
    d = sim_lib.set_object_poses(
        env.idx, state.physics,
        state.goal["obj_pos"][jnp.asarray([1, 0])],
        state.goal["obj_rot"][jnp.asarray([1, 0])],
    )
    dist = env.goal_gen.goal_distance(state.goal, d, active)
    assert np.all(np.asarray(dist["obj_pos"]) < 1e-5)
