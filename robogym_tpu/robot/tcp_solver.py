"""TCP (tool-center-point) control via the mocap weld (TPU build).

Re-implements the reference TCP control stack
(/root/reference/robogym/robot/control/tcp/solver.py:10-83,
mocap_solver.py:11-74, and ur16e/mujoco/free_dof_tcp_arm.py:13-254) as pure
functions: the action is a TCP position delta plus a reduced set of rotation
DOFs; the mocap body's pose is advanced by the deltas and the compiled
`mocap_weld` equality constraint drags the (free-floating-wrist) arm along —
all inside the same jitted physics step, no second simulation.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, Model
from robogym_tpu.utils import rotation as rot


class PrincipalAxis:
    """(solver.py:10-14). Values are euler-angle indices."""

    ROLL = 0
    PITCH = 2
    YAW = 1


# (free_dof_tcp_arm.py:13-17)
DOF_DIM_SPEED_SCALE = {
    PrincipalAxis.ROLL: np.deg2rad(200),
    PrincipalAxis.PITCH: np.deg2rad(600),
    PrincipalAxis.YAW: np.deg2rad(300),
}

# control-mode DOF sets (free_dof_tcp_arm.py:239-254)
TCP_WRIST_DOFS = (PrincipalAxis.PITCH,)
TCP_WRIST_ALIGN: Optional[int] = PrincipalAxis.PITCH
TCP_ROLL_YAW_DOFS = (PrincipalAxis.ROLL, PrincipalAxis.PITCH)
TCP_ROLL_YAW_ALIGN: Optional[int] = None


def align_axis(cmd_quat: jax.Array, axis: int) -> jax.Array:
    """(mocap_solver.py:59-74): rotate cmd_quat so that its column closest
    to the given world axis aligns exactly with it."""
    alignment = jax.nn.one_hot(axis, 3, dtype=cmd_quat.dtype)
    mtx = rot.quat2mat(cmd_quat)
    axis_nr = jnp.argmax(jnp.abs(alignment @ mtx))
    col = mtx[:, axis_nr]
    col = col * jnp.sign(jnp.dot(col, alignment))
    difference_quat = rot.vectors2quat(col, alignment)
    return rot.quat_mul(difference_quat, cmd_quat)


def get_tcp_quat_delta(
    d: Data, tcp_body: int, angle_ctrl: jax.Array,
    dof_axes: Tuple[int, ...], alignment_axis: Optional[int],
) -> jax.Array:
    """(mocap_solver.py:33-50): quaternion DELTA (to be added to the mocap
    quat) realizing the commanded rotation about the controlled axes."""
    euler = jnp.zeros(3, angle_ctrl.dtype)
    for i, ax in enumerate(dof_axes):
        euler = euler.at[ax].set(angle_ctrl[i])
    quat = rot.euler2quat(euler)
    gripper_quat = d.xquat[tcp_body]
    target = rot.quat_mul(gripper_quat, quat)
    if alignment_axis is not None:
        target = align_axis(target, alignment_axis)
    return target - gripper_quat


def mocap_set_action(
    d: Data, pos_delta: jax.Array, quat_delta: jax.Array, tcp_body: int,
    mocapid: int = 0,
) -> Data:
    """gym.envs.robotics utils.mocap_set_action semantics (the reference's
    mocap backend, mocap_solver.py:52-53): the mocap target is RESET to the
    welded body's current pose first (reset_mocap2body_xpos), then advanced
    additively by the deltas; the quat renormalizes in kinematics."""
    d = reset_mocap_to_body(d, tcp_body, mocapid)
    mocap_pos = d.mocap_pos.at[mocapid].add(pos_delta.astype(d.mocap_pos.dtype))
    mocap_quat = d.mocap_quat.at[mocapid].add(
        quat_delta.astype(d.mocap_quat.dtype)
    )
    return d.replace(mocap_pos=mocap_pos, mocap_quat=mocap_quat)


def reset_mocap_to_body(d: Data, tcp_body: int, mocapid: int = 0) -> Data:
    """utils.reset_mocap2body_xpos analogue (mocap_solver.py:55-57)."""
    return d.replace(
        mocap_pos=d.mocap_pos.at[mocapid].set(d.xpos[tcp_body]),
        mocap_quat=d.mocap_quat.at[mocapid].set(d.xquat[tcp_body]),
    )


def tcp_set_position_control(
    m: Model,
    d: Data,
    tcp_body: int,
    action: jax.Array,
    control_mode: str,
    max_position_change: float,
) -> Data:
    """Full TCP action application (free_dof_tcp_arm.py:185-209 +
    denormalize_position_control:162-180): action = [xyz deltas in [-1,1],
    rotation DOFs in [-1,1]]. Returns Data with the mocap target advanced."""
    from robogym_tpu.robot.composite import ControlMode

    if control_mode == ControlMode.TCP_WRIST:
        dof_axes, align = TCP_WRIST_DOFS, TCP_WRIST_ALIGN
    else:
        dof_axes, align = TCP_ROLL_YAW_DOFS, TCP_ROLL_YAW_ALIGN

    pos_delta = action[:3] * max_position_change
    speed = jnp.asarray(
        [DOF_DIM_SPEED_SCALE[a] * max_position_change for a in dof_axes],
        action.dtype,
    )
    angle_ctrl = action[3 : 3 + len(dof_axes)] * speed
    quat_delta = get_tcp_quat_delta(d, tcp_body, angle_ctrl, dof_axes, align)
    return mocap_set_action(d, pos_delta, quat_delta, tcp_body)
