"""Robotiq 2f-85 gripper module (TPU build).

Re-implements the reference gripper
(/root/reference/robogym/robot/gripper/mujoco/mujoco_robotiq_gripper.py:38-192):
1-DoF position control of the coupled finger linkage through the
`robot0:r_gripper_finger_joint` actuator. The regrasp (anti-backdrive)
heuristic (regrasp_helper.py:82-255) is the pure state machine
`RegraspState` + `compute_regrasp_control` below — episode state threaded
through the env state instead of Python object attributes, so it lives
inside the jitted step.
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


# ---------------------------------------------------------------------------
# Regrasp (anti-backdrive) heuristic — reference regrasp_helper.py:82-255.
#
# Encoding of the reference's Python-object state as a flat pytree:
#   * last_cmd_dir / last_obs_dir use 0.0 for the reference's `None`
#     ("no nonzero direction recorded"); only {0, +1, -1} occur, and the
#     reference's truthiness tests (`x and x > 0`) reduce to `x > 0`.
#   * prev/second_prev action start at the initial hold control (the
#     reference asserts they exist by trigger time; seeding them with the
#     hold control preserves that invariant without optionals).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RegraspState:
    regrasp_cmd: jax.Array         # scalar f: command re-issued while active
    regrasp_active: jax.Array      # scalar bool
    prev_obs_position: jax.Array   # scalar f: last observed joint position
    last_cmd_dir: jax.Array        # scalar f in {0,+1,-1}; 0 == None
    last_obs_dir: jax.Array        # scalar f in {0,+1,-1}; 0 == None
    prev_action: jax.Array         # scalar f: last returned control
    second_prev_action: jax.Array  # scalar f: second-to-last returned control


def init_regrasp(initial_position: jax.Array,
                 initial_control: jax.Array) -> RegraspState:
    """Fresh per-episode regrasp state (regrasp_helper.py:14-22)."""
    p = jnp.asarray(initial_position).reshape(())
    c = jnp.asarray(initial_control).reshape(())
    zero = jnp.zeros_like(p)
    return RegraspState(
        regrasp_cmd=c, regrasp_active=jnp.zeros((), bool),
        prev_obs_position=p, last_cmd_dir=zero, last_obs_dir=zero,
        prev_action=c, second_prev_action=c,
    )


def compute_regrasp_control(
    s: RegraspState,
    position_control: jax.Array,
    default_control: jax.Array,
    current_position: jax.Array,
):
    """Pure translation of RegraspHelper.compute_regrasp_control
    (regrasp_helper.py:82-255). Returns (control, new_state).

    Branch structure of the reference, flattened to selects:
      bypass   — active & user-keeps: re-issue regrasp_cmd, NO state update
                 (the reference early-returns before step 5).
      trigger  — (close|keep) & last cmd was close & gripper was closing
                 or still & gripper now opening: start regrasp with the
                 second-to-last action.
      active   — emit max(regrasp_cmd, default) (user command wins when it
                 closes harder), else the default control.
    """
    pc = jnp.asarray(position_control).reshape(())
    default = jnp.asarray(default_control).reshape(())
    pos = jnp.asarray(current_position).reshape(())

    obs_move = pos - s.prev_obs_position
    obs_dir = jnp.where(jnp.abs(obs_move) < 1e-5, 0.0, jnp.sign(obs_move))

    wants_open = pc < 0.0
    wants_close = pc > 0.0
    wants_keep = pc == 0.0

    # step 2: active-state handling
    active = s.regrasp_active & ~wants_open     # user opening stops regrasp
    bypass = s.regrasp_active & ~wants_open & ~wants_close  # keep: re-issue

    # step 3: backdrive trigger
    trigger = (
        (wants_close | wants_keep)
        & (s.last_cmd_dir > 0.0)
        & (s.last_obs_dir > 0.0)
        & (obs_dir < 0.0)
        & ~bypass
    )
    regrasp_cmd = jnp.where(trigger, s.second_prev_action, s.regrasp_cmd)
    active = active | trigger

    # step 4: compare regrasp command to the user command (user wins if it
    # closes harder — regrasp_helper.py:206-214)
    regrasp_cmd = jnp.where(
        active & (default > regrasp_cmd), default, regrasp_cmd
    )
    out = jnp.where(active, regrasp_cmd, default)
    out = jnp.where(bypass, s.regrasp_cmd, out)

    # step 5: cache updates (skipped entirely on the bypass path)
    cmd_dir = jnp.where(jnp.abs(pc) < 1e-5, 0.0, jnp.sign(pc))
    # reference quirk (regrasp_helper.py:219-226): a ~zero command RESETS
    # last_nonzero_cmd_direction to None (None != 0.0 is truthy in Python)
    new_last_cmd = cmd_dir
    new_last_obs = jnp.where(obs_dir != 0.0, obs_dir, s.last_obs_dir)

    def upd(new, old):
        return jnp.where(bypass, old, new)

    new_state = RegraspState(
        regrasp_cmd=jnp.where(bypass, s.regrasp_cmd, regrasp_cmd),
        regrasp_active=jnp.where(bypass, s.regrasp_active, active),
        prev_obs_position=upd(pos, s.prev_obs_position),
        last_cmd_dir=upd(new_last_cmd, s.last_cmd_dir),
        last_obs_dir=upd(new_last_obs, s.last_obs_dir),
        prev_action=upd(out, s.prev_action),
        second_prev_action=upd(s.prev_action, s.second_prev_action),
    )
    return out, new_state


def denormalize_with_regrasp(
    idx: GripperIndex,
    m: Model,
    d: Data,
    position_control: jax.Array,
    s: RegraspState,
):
    """Relative-mode gripper control with the regrasp override
    (mujoco_robotiq_gripper.py:142-172). Returns (ctrl_vector, new_state)."""
    ctrl = denormalize_position_control(
        idx, m, d, position_control, relative_action=True
    )
    default = ctrl[idx.actuator_id]
    out, s2 = compute_regrasp_control(
        s, position_control[0], default, d.qpos[idx.joint_qpos_id]
    )
    return ctrl.at[idx.actuator_id].set(out), s2
