"""UR16e arm robot module (TPU build).

Re-implements the reference arm abstraction
(/root/reference/robogym/robot/ur16e/arm_interface.py:8-96 and
mujoco/joint_controlled_arm.py:19-190) as pure functions over (Model, Data):
joint-space position control through the cascaded-PI actuators, TCP pose/
velocity/force observation extraction, and the safety-stop check.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, Model
from robogym_tpu.utils import rotation as rot

JOINTS: List[str] = ["J1", "J2", "J3", "J4", "J5", "J6"]
ACTUATORS: List[str] = [f"ur_actuator_{i}" for i in range(1, 7)]

# (arm_interface.py:27): tabletop experiment initial configuration.
# MUST match the reference exactly: other poses can start the arm inside
# the backdrop panel (contype/conaffinity 1/1 collides with the arm), and
# the ejection impulse leaves J6 outside its joint range — the round-3
# joint-control regressions traced back to exactly that.
TABLETOP_EXPERIMENT_INITIAL_POS = np.deg2rad(
    np.array([135.0, -90.0, 135.0, -100.0, -240.0, 135.0])
)

# (arm_interface.py:43-46): |F_tcp| threshold for triggering safety stop
SAFETY_STOP_FORCE_THRESHOLD = 120.0


@dataclasses.dataclass(frozen=True)
class ArmIndex:
    """Static index tables binding arm names to a compiled Model."""

    prefix: str
    joint_ids: np.ndarray        # (6,)
    joint_qpos_ids: np.ndarray   # (6,)
    joint_dof_ids: np.ndarray    # (6,)
    actuator_ids: np.ndarray     # (6,) or (0,) for mocap-actuated models
    tcp_body_id: int             # robot0:gripper_tcp
    mocap_body_id: int           # robot0:mocap (-1 if absent)

    @classmethod
    def build(cls, model: Model, prefix: str = "robot0:") -> "ArmIndex":
        c = model.const
        jn = c.names["joint"]
        jids = [jn[prefix + j] for j in JOINTS]
        an = c.names["actuator"]
        actuator_ids = np.asarray(
            [an[a] for a in ACTUATORS if a in an], np.int32
        )
        bn = c.names["body"]
        return cls(
            prefix=prefix,
            joint_ids=np.asarray(jids, np.int32),
            joint_qpos_ids=np.asarray(
                [c.jnt_qposadr[j] for j in jids], np.int32
            ),
            joint_dof_ids=np.asarray(
                [c.jnt_dofadr[j] for j in jids], np.int32
            ),
            actuator_ids=actuator_ids,
            tcp_body_id=int(bn[prefix + "gripper_tcp"]),
            mocap_body_id=int(bn.get(prefix + "mocap", -1)),
        )


def joint_positions(idx: ArmIndex, d: Data) -> jax.Array:
    return d.qpos[jnp.asarray(idx.joint_qpos_ids)]


def joint_velocities(idx: ArmIndex, d: Data) -> jax.Array:
    return d.qvel[jnp.asarray(idx.joint_dof_ids)]


def tcp_xyz(idx: ArmIndex, d: Data) -> jax.Array:
    """TCP world position (joint_controlled_arm MujocoObservation)."""
    return d.xpos[idx.tcp_body_id]


def tcp_quat(idx: ArmIndex, d: Data) -> jax.Array:
    return d.xquat[idx.tcp_body_id]


def tcp_rot(idx: ArmIndex, d: Data) -> jax.Array:
    return rot.quat2euler(d.xquat[idx.tcp_body_id])


def tcp_vel(idx: ArmIndex, m: Model, d: Data) -> jax.Array:
    """Linear TCP velocity. cvel rows are (ang, lin) spatial velocities
    referenced at the root's subtree com; shift to the body origin."""
    rootid = int(np.asarray(m.const.body_rootid)[idx.tcp_body_id])
    ang = d.cvel[idx.tcp_body_id, :3]
    lin = d.cvel[idx.tcp_body_id, 3:]
    offset = d.xpos[idx.tcp_body_id] - d.subtree_com[rootid]
    return lin + jnp.cross(ang, offset)


def denormalize_position_control(
    idx: ArmIndex,
    m: Model,
    d: Data,
    position_control: jax.Array,
    relative_action: bool = True,
    max_position_change: float | None = 2.4,
) -> jax.Array:
    """[-1,1]^6 -> joint ctrl targets (robot_interface.py:247-278 with the
    JOINT control mode's per-joint max_position_change)."""
    ids = jnp.asarray(idx.actuator_ids)
    cr = m.actuator_ctrlrange[ids]
    lo, hi = cr[:, 0], cr[:, 1]
    if relative_action:
        center = joint_positions(idx, d)
    else:
        center = (hi + lo) / 2.0
    arange = (hi - lo) / 2.0
    if relative_action and max_position_change is not None:
        arange = jnp.minimum(arange, max_position_change)
    ctrl = jnp.clip(center + position_control * arange, lo, hi)
    return d.ctrl.at[ids].set(ctrl)
