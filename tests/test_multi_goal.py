"""Multi-goal bookkeeping parity with the reference MultiGoalTracker.

Mirrors the value tables of
/root/reference/robogym/envs/rearrange/tests/test_multi_goals_env.py
(TestMultiGoalsEnv) against the pure `core.tracker_process` /
`core.tracker_info` pair, plus an end-to-end check on the locked env.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs import core


CST = core.EnvConstants(
    max_timesteps_per_goal=10,
    successes_needed=5,
    success_reward=100.0,
    success_pause_range_s=(0.0, 0.0),
)


def _step(tracker, successful, cst=CST, goal_type=None, solved=False):
    """One tracker step + the env-side resample bookkeeping (pause (0,0)
    keeps success_steps_required at 1, like the reference test config)."""
    tracker, reward, done, need_new_goal = core.tracker_process(
        tracker, cst, jnp.asarray(successful),
        jnp.asarray(solved),
        goal_type=None if goal_type is None else jnp.asarray(goal_type),
    )
    info = core.tracker_info(
        tracker, cst,
        ("generic",) if goal_type is None else ("flip", "rotation"),
        goal_type=None if goal_type is None else jnp.asarray(goal_type),
    )
    info = {k: np.asarray(v) for k, v in info.items()}
    return tracker, float(reward), bool(done), bool(need_new_goal), info


def test_basic_info():
    """test_multi_goals_env.py:38-70 — no success for 10 steps -> timeout."""
    tr = core.TrackerState.zero()
    for step in range(9):
        tr, reward, done, need_new_goal, info = _step(tr, False)
        assert not done and reward == 0.0 and not need_new_goal
        assert info["goals_so_far"] == 1
        assert not info["trial_success"]
        assert not info["sub_goal_is_successful"]
        assert info["steps_since_last_goal"] == step + 1
        assert info["steps_by_goal_type/generic"] == step + 1
        assert info["successes_so_far"] == 0
        assert info["successes_so_far_by_goal_type/generic"] == 0
        assert info["steps_per_success"] == 10
        assert info["steps_per_success_by_goal_type/generic"] == 10
    tr, _, done, _, _ = _step(tr, False)
    assert done


def test_multi_successes_full():
    """test_multi_goals_env.py:94-125 — 5 goals, each succeeded on step 6."""
    tr = core.TrackerState.zero()
    for goal_idx in range(5):
        for step in range(5):
            tr, reward, done, _, info = _step(tr, False)
            assert not done
            assert not info["sub_goal_is_successful"]
            assert not info["trial_success"]
            assert info["steps_since_last_goal"] == step + 1
            assert info["successes_so_far"] == goal_idx
            assert info["goals_so_far"] == goal_idx + 1
            assert info["steps_per_success"] == (10 if goal_idx == 0 else 6)
        tr, reward, done, need_new_goal, info = _step(tr, True)
        assert reward == 100.0
        assert info["sub_goal_is_successful"]
        assert info["successes_so_far"] == goal_idx + 1
        assert info["steps_per_success"] == 6
        assert info["steps_per_success_by_goal_type/generic"] == 6
        if goal_idx == 4:
            assert done and info["trial_success"]
            assert not need_new_goal
            assert info["goals_so_far"] == 5
        else:
            assert not done and not info["trial_success"]
            assert need_new_goal
            assert info["goals_so_far"] == goal_idx + 2


def test_multi_successes_fail():
    """test_multi_goals_env.py:127-157 — successes after 2/4/6 steps, then
    a 10-step timeout on the 4th goal."""
    tr = core.TrackerState.zero()
    for goal_idx in range(3):
        steps_to_success = (goal_idx + 1) * 2
        for _ in range(steps_to_success - 1):
            tr, _, done, _, info = _step(tr, False)
            assert not done
            if goal_idx == 0:
                expected = 10
            elif goal_idx == 1:
                expected = 2
            else:
                expected = (2 + 4) / 2
            assert info["steps_per_success"] == expected
        tr, _, done, _, info = _step(tr, True)
        assert info["sub_goal_is_successful"] and not done
    for _ in range(9):
        tr, _, done, _, _ = _step(tr, False)
        assert not done
    tr, _, done, _, info = _step(tr, False)
    assert done
    assert not info["sub_goal_is_successful"]
    assert info["steps_per_success"] == (2 + 4 + 6) / 3
    assert not info["trial_success"]


def test_consecutive_success_steps_required():
    """test_multi_goals_env.py:185-243 — success must HOLD for the sampled
    duration before the reward fires."""
    cst = core.EnvConstants(
        max_timesteps_per_goal=100,
        successes_needed=1,
        success_reward=100.0,
        success_pause_range_s=(0.08, 0.08),  # 4 env steps at 0.02 s/step
    )
    required = int(round(0.08 / cst.step_duration))
    assert required == 4
    req = core.sample_success_steps_required(jax.random.key(0), cst)
    assert int(req) == required

    tr = core.TrackerState.zero().replace(success_steps_required=req)
    for i in range(4):
        tr, _, done, _, info = _step(tr, False, cst)
        assert not done and not info["sub_goal_is_successful"]
        assert int(tr.consecutive_successes) == 0
        assert info["steps_since_last_goal"] == i + 1
    for j in range(required - 1):
        tr, reward, done, _, info = _step(tr, True, cst)
        assert int(tr.consecutive_successes) == j + 1
        assert not done and reward == 0.0
        assert not info["sub_goal_is_successful"]
        assert not info["trial_success"]
        assert info["steps_since_last_goal"] == j + 5
    tr, reward, done, _, info = _step(tr, True, cst)
    assert int(tr.consecutive_successes) == required
    assert done and reward == 100.0
    assert info["sub_goal_is_successful"] and info["trial_success"]


def test_goal_type_bookkeeping():
    """Per-goal-type steps/successes split (update_info :243-277): flip goal
    succeeds on step 3, then a rotation goal runs 2 steps."""
    tr = core.TrackerState.zero(n_goal_types=2)
    for _ in range(2):
        tr, _, _, _, info = _step(tr, False, goal_type=0)
    tr, _, _, need_new_goal, info = _step(tr, True, goal_type=0)
    assert need_new_goal
    assert info["successes_so_far_by_goal_type/flip"] == 1
    assert info["successes_so_far_by_goal_type/rotation"] == 0
    assert info["steps_by_goal_type/flip"] == 3
    assert info["steps_per_success_by_goal_type/flip"] == 3
    for k in range(2):
        tr, _, _, _, info = _step(tr, False, goal_type=1)
        assert info["steps_by_goal_type/rotation"] == k + 1
        # flip's per-type average is unaffected by rotation-goal steps
        assert info["steps_per_success_by_goal_type/flip"] == 3
        assert info["steps_per_success_by_goal_type/rotation"] == 10
    # overall: 5 steps total, 2 spent on the live rotation goal, 1 success
    assert info["steps_per_success"] == 3


def test_solved_ends_trial_early():
    """goal_info['solved'] -> trial success regardless of successes_needed
    (multi_goal_tracker.py:226-229)."""
    tr = core.TrackerState.zero()
    tr, reward, done, need_new_goal, info = _step(tr, True, solved=True)
    assert done and info["trial_success"] and not need_new_goal
    assert reward == 100.0


def test_locked_env_emits_tracker_info():
    """End-to-end: the locked env's info dict carries the full reference
    bookkeeping contract, and a forced zero-distance goal fires success."""
    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(dict(
        mujoco_substeps=2, n_random_initial_steps=0,
        reset_initial_steps=5, max_pose_resets=2,
        success_pause_range_s=(0.0, 0.0),
    ))
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    step = jax.jit(env.step)
    state, obs, reward, done, info = step(state, jnp.zeros(env.action_size))
    for key in (
        "goals_so_far", "successes_so_far", "steps_since_last_goal",
        "sub_goal_is_successful", "trial_success", "steps_per_success",
        "consecutive_steps_with_success", "env_crash",
    ):
        assert key in info, key
    assert int(info["goals_so_far"]) == 1
    assert int(info["successes_so_far"]) == 0
    assert float(info["steps_per_success"]) == float(
        env.constants.max_timesteps_per_goal
    )

    # force success: make the goal the cube's current pose
    goal = dict(state.goal)
    goal["cube_quat"] = obs["cube_quat"]
    state = state.replace(goal=goal)
    state, obs, reward, done, info = step(state, jnp.zeros(env.action_size))
    assert bool(info["sub_goal_is_successful"])
    assert int(info["successes_so_far"]) == 1
    assert int(info["goals_so_far"]) == 2      # new goal sampled in-episode
    assert float(reward[2]) == env.constants.success_reward
