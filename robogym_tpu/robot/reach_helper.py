"""Reach helper: drive a robot to a target configuration (TPU build).

Re-implements the reference blocking reach loop
(/root/reference/robogym/robot/utils/reach_helper.py:246-657,
reach_position:619-720): generate per-step position deltas limited by
`max_speed_per_sec`, step the env, and declare success when the position is
within `reached_position_threshold` AND the velocity has stayed under
`stopped_velocity_threshold` for `stopped_stable_time` (stability
detection). Host-side episodic logic (reset-to-pose flows), driving the
jitted env step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class MeasurementUnit:
    """(robot/utils/measurement_units.py)."""

    RADIANS = "radians"
    METERS = "meters"


@dataclasses.dataclass
class ReachResult:
    """(reach_helper.py ReachResult)."""

    reached: bool
    steps: int
    final_position: np.ndarray
    final_error: np.ndarray

    def reached_position_and_stopped(self) -> bool:
        return self.reached


# defaults per measurement unit (reach_helper.py:658-684)
_DEFAULTS = {
    MeasurementUnit.RADIANS: dict(
        reached_position_threshold=np.deg2rad(1.0),
        stopped_velocity_threshold=np.deg2rad(1.0),
        max_speed_per_sec=np.deg2rad(30.0),
    ),
    MeasurementUnit.METERS: dict(
        reached_position_threshold=0.005,
        stopped_velocity_threshold=0.001,
        max_speed_per_sec=0.025,
    ),
}


def reach_position(
    env,
    state,
    position_control: np.ndarray,
    *,
    timeout_steps: int = 200,
    speed_units_per_sec: Optional[float] = None,
    position_threshold: Optional[float] = None,
    measurement_unit: str = MeasurementUnit.RADIANS,
    stopped_stable_steps: int = 5,
):
    """Drive `env` (JOINT control mode) from `state` to the target joint
    positions. Returns (new_state, ReachResult).

    The action at each step commands a clipped delta toward the target:
    action = clip(err, -speed*dt, +speed*dt) / max_position_change —
    the reference's delta-generation loop (reach_helper.py:376-430) over
    the relative-action denormalization contract."""
    defaults = _DEFAULTS[measurement_unit]
    speed = (
        speed_units_per_sec if speed_units_per_sec is not None
        else defaults["max_speed_per_sec"]
    )
    thr = (
        position_threshold if position_threshold is not None
        else defaults["reached_position_threshold"]
    )
    vel_thr = defaults["stopped_velocity_threshold"]
    dt = env.constants.step_duration
    max_delta = speed * dt

    from robogym_tpu.robot import ur16e as arm_lib

    rcp = env.parameters.robot_control_params
    assert rcp.control_mode == "joint", (
        "reach_position drives the joint control mode; TCP flows use the "
        "teleop controller"
    )
    max_change = rcp.default_max_position_change()
    target = np.asarray(position_control, np.float64)
    step_j = jax.jit(env.step)

    stable = 0
    for t in range(timeout_steps):
        cur = np.asarray(
            arm_lib.joint_positions(env.robot.arm, state.physics)
        )
        vel = np.asarray(
            arm_lib.joint_velocities(env.robot.arm, state.physics)
        )
        err = target - cur
        if (np.abs(err) < thr).all() and (np.abs(vel) < vel_thr).all():
            stable += 1
            if stable >= stopped_stable_steps:
                return state, ReachResult(True, t, cur, err)
        else:
            stable = 0
        delta = np.clip(err, -max_delta, max_delta)
        action = np.zeros(env.action_size)
        action[:6] = np.clip(delta / max_change, -1.0, 1.0)
        state, obs, reward, done, info = step_j(
            state, jnp.asarray(action, env.dtype)
        )
    cur = np.asarray(arm_lib.joint_positions(env.robot.arm, state.physics))
    return state, ReachResult(False, timeout_steps, cur, target - cur)
