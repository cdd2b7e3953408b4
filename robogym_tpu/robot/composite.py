"""Composite arm+gripper robot (TPU build).

Re-implements the reference composite robot
(/root/reference/robogym/robot/composite/composite_robot.py:13-145 and
ur_gripper_arm.py:23-160): the action space is the concatenation of the arm
action space and the 1-d gripper action; `set_position_control` splits and
dispatches. Joint control mode actuates the cascaded-PI joint actuators
directly; TCP modes are built on the mocap weld (solver) path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, Model
from robogym_tpu.robot import gripper as gripper_lib
from robogym_tpu.robot import ur16e as arm_lib


class ControlMode:
    """(robot_interface.py:9-19)."""

    TCP_WRIST = "tcp+wrist"
    TCP_ROLL_YAW = "tcp+roll+yaw"
    JOINT = "joint"


class TcpSolverMode:
    """(robot_interface.py:22-29)."""

    MOCAP = "mocap"
    MOCAP_IK = "mocap_ik"


@dataclasses.dataclass(frozen=True)
class RobotControlParameters:
    """(robot_interface.py:33-128)."""

    MOCAP_DEFAULT_MAX_POSITION_CHANGE = 0.05
    MOCAP_RESET_DEFAULT_MAX_POSITION_CHANGE = 0.1
    JOINT_CONTROL_DEFAULT_MAX_POSITION_CHANGE = 2.4

    control_mode: str = ControlMode.TCP_ROLL_YAW
    max_position_change: Optional[float] = None
    tcp_solver_mode: str = TcpSolverMode.MOCAP_IK
    arm_joint_calibration_path: str = "cascaded_pi"
    arm_reset_controller_error: bool = True
    use_force_limiter: bool = True
    enable_gripper_regrasp: bool = False

    def is_joint_actuated(self) -> bool:
        return (
            self.control_mode == ControlMode.JOINT
            or self.tcp_solver_mode == TcpSolverMode.MOCAP_IK
        )

    def is_tcp_controlled(self) -> bool:
        return self.control_mode in (ControlMode.TCP_WRIST, ControlMode.TCP_ROLL_YAW)

    def requires_solver_sim(self) -> bool:
        return self.is_joint_actuated() and self.is_tcp_controlled()

    def action_dims(self) -> int:
        """Composite action dims (ur_gripper_arm.py: arm dims + 1 gripper)."""
        if self.control_mode == ControlMode.JOINT:
            return 6 + 1
        if self.control_mode == ControlMode.TCP_WRIST:
            return 4 + 1   # xyz + wrist rotation
        return 5 + 1       # xyz + roll + yaw

    def default_max_position_change(self) -> float:
        """(robot_interface.py:102-128)."""
        if self.max_position_change is not None:
            return self.max_position_change
        if self.control_mode == ControlMode.JOINT:
            return self.JOINT_CONTROL_DEFAULT_MAX_POSITION_CHANGE
        if self.tcp_solver_mode == TcpSolverMode.MOCAP:
            return self.MOCAP_DEFAULT_MAX_POSITION_CHANGE
        if self.arm_reset_controller_error:
            return self.MOCAP_RESET_DEFAULT_MAX_POSITION_CHANGE
        return self.MOCAP_DEFAULT_MAX_POSITION_CHANGE


@dataclasses.dataclass(frozen=True)
class CompositeIndex:
    arm: arm_lib.ArmIndex
    gripper: gripper_lib.GripperIndex
    params: RobotControlParameters

    @classmethod
    def build(
        cls, model: Model, params: RobotControlParameters,
        prefix: str = "robot0:",
    ) -> "CompositeIndex":
        return cls(
            arm=arm_lib.ArmIndex.build(model, prefix),
            gripper=gripper_lib.GripperIndex.build(model, prefix),
            params=params,
        )

    @property
    def action_size(self) -> int:
        return self.params.action_dims()


def set_position_control_joint(
    idx: CompositeIndex, m: Model, d: Data, action: jax.Array,
    relative_action: bool = True,
) -> jax.Array:
    """Joint control mode: split [arm(6) | gripper(1)]
    (composite_robot.py:98-107) and write ctrl."""
    ctrl = arm_lib.denormalize_position_control(
        idx.arm, m, d, action[:6],
        relative_action=relative_action,
        max_position_change=idx.params.default_max_position_change(),
    )
    d = d.replace(ctrl=ctrl)
    ctrl = gripper_lib.denormalize_position_control(
        idx.gripper, m, d, action[6:7], relative_action=relative_action
    )
    return ctrl
