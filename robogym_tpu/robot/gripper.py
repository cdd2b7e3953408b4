"""Robotiq 2f-85 gripper module (TPU build).

Re-implements the reference gripper
(/root/reference/robogym/robot/gripper/mujoco/mujoco_robotiq_gripper.py:38-192):
1-DoF position control of the coupled finger linkage through the
`robot0:r_gripper_finger_joint` actuator. The regrasp (anti-backdrive)
heuristic (regrasp_helper.py) is a pure state machine in `regrasp_control`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, Model

ACTUATORS = ["A_J1"]
JOINTS = ["r_gripper_RJ0_outer"]


@dataclasses.dataclass(frozen=True)
class GripperIndex:
    prefix: str
    actuator_id: int
    joint_qpos_id: int
    joint_dof_id: int

    @classmethod
    def build(cls, model: Model, prefix: str = "robot0:") -> "GripperIndex":
        c = model.const
        jid = c.names["joint"][prefix + JOINTS[0]]
        return cls(
            prefix=prefix,
            actuator_id=int(c.names["actuator"][prefix + "r_gripper_finger_joint"]),
            joint_qpos_id=int(c.jnt_qposadr[jid]),
            joint_dof_id=int(c.jnt_dofadr[jid]),
        )


def joint_position(idx: GripperIndex, d: Data) -> jax.Array:
    return d.qpos[idx.joint_qpos_id][None]


def joint_velocity(idx: GripperIndex, d: Data) -> jax.Array:
    return d.qvel[idx.joint_dof_id][None]


def denormalize_position_control(
    idx: GripperIndex,
    m: Model,
    d: Data,
    position_control: jax.Array,
    relative_action: bool = True,
) -> jax.Array:
    """[-1,1] -> finger joint ctrl (robot_interface.py:247-278; the gripper
    has no max_position_change constraint,
    mujoco_robotiq_gripper.py:70-72)."""
    cr = m.actuator_ctrlrange[idx.actuator_id]
    lo, hi = cr[0], cr[1]
    if relative_action:
        center = d.qpos[idx.joint_qpos_id]
    else:
        center = (hi + lo) / 2.0
    ctrl = jnp.clip(center + position_control[0] * (hi - lo) / 2.0, lo, hi)
    return d.ctrl.at[idx.actuator_id].set(ctrl)
