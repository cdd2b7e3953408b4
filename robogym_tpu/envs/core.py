"""Functional environment core — the TPU-native RobotEnv.

The reference RobotEnv (/root/reference/robogym/robot_env.py:328-1143) is a
stateful gym.Env around one MjSim. Here an environment is a *pure function
pair* over an explicit state pytree:

    env.reset(key)          -> (EnvState, obs)
    env.step(state, action) -> (EnvState, obs, reward[3], done, info)

vmapped to thousands of envs and pjit-sharded over a device mesh. The reward
triple [env_reward, goal_distance_reward - penalty, success_reward] and the
multi-goal bookkeeping replicate MultiGoalTracker.process
(/root/reference/robogym/utils/multi_goal_tracker.py:157-241): consecutive
success counting with a sampled hold duration, per-goal timeout -> done, goal
resample on success within the same episode, trial success after
`successes_needed` goals.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, Model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrackerState:
    """Vectorized MultiGoalTracker state (multi_goal_tracker.py:96-155)."""

    steps: jax.Array                       # i32 () total env steps this episode
    steps_since_last_goal: jax.Array       # i32
    consecutive_successes: jax.Array       # i32
    successes_so_far: jax.Array            # i32
    success_steps_required: jax.Array      # i32 sampled hold duration
    success_and_no_goal_reset: jax.Array   # bool
    trial_success: jax.Array               # bool
    goals_so_far: jax.Array                # i32, 1 after reset (initial goal)
    sub_goal_success: jax.Array            # bool, success fired THIS step
    steps_by_type: jax.Array               # i32[n_goal_types]
    successes_by_type: jax.Array           # i32[n_goal_types]

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @classmethod
    def zero(cls, n_goal_types: int = 1):
        z = jnp.zeros((), jnp.int32)
        zt = jnp.zeros((n_goal_types,), jnp.int32)
        return cls(
            steps=z, steps_since_last_goal=z, consecutive_successes=z,
            successes_so_far=z, success_steps_required=jnp.ones((), jnp.int32),
            success_and_no_goal_reset=jnp.zeros((), bool),
            trial_success=jnp.zeros((), bool),
            goals_so_far=jnp.ones((), jnp.int32),
            sub_goal_success=jnp.zeros((), bool),
            steps_by_type=zt, successes_by_type=zt,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Complete per-env state: physics + goal + tracker + RNG.

    `model_fields` carries per-episode randomized Model fields (gravity,
    gains, friction, ...) as a small dict pytree — the TPU replacement for
    the reference's per-reset MjModel mutation (randomization/sim.py,
    wrappers/randomizations.py). Only the randomized arrays are per-env;
    the full Model stays broadcast under vmap.
    """

    physics: Data
    goal: Any                    # goal pytree (env-specific dict)
    goal_aux: Any                # generator carry (e.g. last goal joint pos)
    prev_goal_distance: Any      # dict of scalars
    tracker: TrackerState
    key: jax.Array               # PRNG key
    t: jax.Array                 # i32 env step count
    model_fields: Any = None     # dict: Model field name -> overridden array
    robot_aux: Any = None        # per-episode robot controller state
                                 # (e.g. gripper RegraspState)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def apply_model_fields(model: Model, fields) -> Model:
    """Overlay per-episode randomized fields onto the static Model.
    Keys are Model field names; `"opt:<name>"` addresses Option fields."""
    if not fields:
        return model
    plain = {k: v for k, v in fields.items() if not k.startswith("opt:")}
    opt = {k[4:]: v for k, v in fields.items() if k.startswith("opt:")}
    if plain:
        model = model.replace(**plain)
    if opt:
        model = model.replace(opt=model.opt.replace(**opt))
    return model


@dataclasses.dataclass(frozen=True)
class EnvConstants:
    """Static env configuration (RobotEnvConstants analogue,
    robot_env.py:111-195). Only fields used on the TPU path."""

    mujoco_substeps: int = 10
    mujoco_timestep: float = 0.002
    success_reward: float = 5.0
    successes_needed: int = 5
    max_timesteps_per_goal: Optional[int] = None
    success_pause_range_s: Tuple[float, float] = (0.0, 0.0)
    relative_action: bool = True
    n_action_bins: int = 11
    max_position_change: Optional[float] = None
    randomize: bool = True
    use_goal_distance_reward: bool = True

    @property
    def step_duration(self) -> float:
        return self.mujoco_substeps * self.mujoco_timestep


def sample_success_steps_required(
    key: jax.Array, constants: EnvConstants
) -> jax.Array:
    """Sampled success-hold steps (multi_goal_tracker.py:84-94)."""
    lo_s, hi_s = constants.success_pause_range_s
    dt = constants.step_duration
    lo = max(1.0, lo_s / dt)
    hi = max(1.0, hi_s / dt)
    u = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return jnp.asarray(jnp.round(u), jnp.int32)


def tracker_process(
    tracker: TrackerState,
    constants: EnvConstants,
    is_successful: jax.Array,
    solved: jax.Array,
    goal_type: Optional[jax.Array] = None,
) -> Tuple[TrackerState, jax.Array, jax.Array, jax.Array]:
    """One step of MultiGoalTracker.process (multi_goal_tracker.py:157-241),
    vectorizable. `goal_type` is the CURRENT goal's type index into the env's
    static goal-type table (reference goal_info["goal"]["goal_type"]; None =
    single "generic" type). Returns (tracker', success_reward, done,
    need_new_goal)."""
    n_types = tracker.steps_by_type.shape[0]
    gt = (
        jnp.zeros((), jnp.int32) if goal_type is None
        else goal_type.astype(jnp.int32)
    )
    type_onehot = (jnp.arange(n_types) == gt).astype(jnp.int32)

    steps = tracker.steps + 1
    ssg = tracker.steps_since_last_goal + 1
    consec = jnp.where(is_successful, tracker.consecutive_successes + 1, 0)

    goal_hold_reached = (consec >= tracker.success_steps_required) & (
        ~tracker.success_and_no_goal_reset
    )
    success_reward = jnp.where(goal_hold_reached, constants.success_reward, 0.0)
    successes = tracker.successes_so_far + goal_hold_reached.astype(jnp.int32)

    timeout = (
        (ssg >= constants.max_timesteps_per_goal)
        if constants.max_timesteps_per_goal is not None
        else jnp.zeros((), bool)
    )
    done = timeout & ~goal_hold_reached

    pending = tracker.success_and_no_goal_reset | goal_hold_reached
    # min_timesteps_per_goal defaults to 0 in the reference -> fires same step
    fire = pending
    trial_success = fire & ((successes >= constants.successes_needed) | solved)
    done = done | trial_success
    need_new_goal = fire & ~trial_success

    tracker = TrackerState(
        steps=steps,
        steps_since_last_goal=jnp.where(need_new_goal | trial_success, 0, ssg),
        # reference reset_goal_steps() zeroes the streak on goal resample
        consecutive_successes=jnp.where(need_new_goal, 0, consec),
        successes_so_far=successes,
        success_steps_required=tracker.success_steps_required,
        success_and_no_goal_reset=pending & ~fire,
        trial_success=trial_success,
        goals_so_far=tracker.goals_so_far + need_new_goal.astype(jnp.int32),
        sub_goal_success=goal_hold_reached,
        steps_by_type=tracker.steps_by_type + type_onehot,
        successes_by_type=(
            tracker.successes_by_type
            + type_onehot * goal_hold_reached.astype(jnp.int32)
        ),
    )
    return tracker, success_reward, done, need_new_goal


def tracker_info(
    tracker: TrackerState,
    constants: EnvConstants,
    goal_type_names: Tuple[str, ...] = ("generic",),
    goal_type: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Post-process info keys (multi_goal_tracker.py:243-277, update_info).

    steps_per_success = (total steps - steps still spent on the current,
    unfinished goal) / successes, defaulting to max_timesteps_per_goal when
    no goal has been achieved yet — exactly _steps_per_success (:127-132)."""
    default = float(
        constants.max_timesteps_per_goal
        if constants.max_timesteps_per_goal is not None else 0
    )
    succ = tracker.successes_so_far
    sps = jnp.where(
        succ > 0,
        (tracker.steps - tracker.steps_since_last_goal)
        / jnp.maximum(succ, 1).astype(jnp.float32),
        default,
    )
    n_types = tracker.steps_by_type.shape[0]
    gt = (
        jnp.zeros((), jnp.int32) if goal_type is None
        else goal_type.astype(jnp.int32)
    )
    cur = (jnp.arange(n_types) == gt).astype(jnp.int32)
    unsucc_t = cur * tracker.steps_since_last_goal
    sps_t = jnp.where(
        tracker.successes_by_type > 0,
        (tracker.steps_by_type - unsucc_t)
        / jnp.maximum(tracker.successes_by_type, 1).astype(jnp.float32),
        default,
    )
    info: Dict[str, Any] = {
        "goals_so_far": tracker.goals_so_far,
        "successes_so_far": tracker.successes_so_far,
        "steps_since_last_goal": tracker.steps_since_last_goal,
        "consecutive_steps_with_success": tracker.consecutive_successes,
        "sub_goal_is_successful": tracker.sub_goal_success,
        "trial_success": tracker.trial_success,
        "steps_per_success": sps,
    }
    for i, name in enumerate(goal_type_names):
        info[f"steps_by_goal_type/{name}"] = tracker.steps_by_type[i]
        info[f"successes_so_far_by_goal_type/{name}"] = (
            tracker.successes_by_type[i]
        )
        info[f"steps_per_success_by_goal_type/{name}"] = sps_t[i]
    return info


def divergence_guard(
    d_prev: Data, d: Data, qvel_limit: float = 1e6
) -> Tuple[Data, jax.Array]:
    """Failure-detection channel: NaN / divergence -> `env_crash`.

    The reference surfaces MuJoCo C warnings/errors as `env_crash` info flags
    and aborts the episode (/root/reference/robogym/mujoco/warning_buffer.py:
    15-83, robot_env.py:826-869, multi_goal_tracker.py:12-21). The TPU
    analogue: detect non-finite or exploding state after the physics step;
    a crashed env keeps its PRE-STEP physics (so observations stay finite
    for the rest of the batch's lockstep) and reports crashed=True — the
    caller sets done and `info["env_crash"]`.
    """
    bad = ~(
        jnp.isfinite(d.qpos).all()
        & jnp.isfinite(d.qvel).all()
        & (jnp.max(jnp.abs(d.qvel), initial=0.0) < qvel_limit)
    )

    def pick(a, b):
        return jnp.where(bad, a, b)

    safe = jax.tree_util.tree_map(pick, d_prev, d)
    return safe, bad


def goal_distance_sum(dist: Dict[str, jax.Array]) -> jax.Array:
    """sum over threshold keys (robot_env.py:550-559)."""
    total = 0.0
    for k in sorted(dist.keys()):
        total = total + jnp.sum(dist[k])
    return total


def is_successful(
    dist: Dict[str, jax.Array], thresholds: Dict[str, float]
) -> jax.Array:
    """all(goal_distance < threshold) (robot_env.py:569-575)."""
    ok = jnp.asarray(True)
    for k, thr in thresholds.items():
        ok = ok & jnp.all(dist[k] < thr)
    return ok
