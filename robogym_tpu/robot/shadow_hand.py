"""Shadow Dexterous Hand robot module (TPU build).

Re-implements the reference hand abstraction
(/root/reference/robogym/robot/shadow_hand/hand_interface.py:9-515) as pure
functions over (Model, Data): actuator/joint name tables, the 20->24
coupled-joint projection matrices, [-1,1] action denormalization with
relative actions (robot_interface.py:247-278), and observation extraction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, Model

ACTUATORS: List[str] = [
    "A_WRJ1", "A_WRJ0",
    "A_FFJ3", "A_FFJ2", "A_FFJ1",
    "A_MFJ3", "A_MFJ2", "A_MFJ1",
    "A_RFJ3", "A_RFJ2", "A_RFJ1",
    "A_LFJ4", "A_LFJ3", "A_LFJ2", "A_LFJ1",
    "A_THJ4", "A_THJ3", "A_THJ2", "A_THJ1", "A_THJ0",
]

JOINTS: List[str] = [
    "WRJ1", "WRJ0",
    "FFJ3", "FFJ2", "FFJ1", "FFJ0",
    "MFJ3", "MFJ2", "MFJ1", "MFJ0",
    "RFJ3", "RFJ2", "RFJ1", "RFJ0",
    "LFJ4", "LFJ3", "LFJ2", "LFJ1", "LFJ0",
    "THJ4", "THJ3", "THJ2", "THJ1", "THJ0",
]

# actuator -> actuated joints (coupled *FJ1/*FJ0 pairs share one actuator)
ACTUATOR_JOINT_MAPPING: Dict[str, List[str]] = {
    "A_WRJ1": ["WRJ1"], "A_WRJ0": ["WRJ0"],
    "A_FFJ3": ["FFJ3"], "A_FFJ2": ["FFJ2"], "A_FFJ1": ["FFJ1", "FFJ0"],
    "A_MFJ3": ["MFJ3"], "A_MFJ2": ["MFJ2"], "A_MFJ1": ["MFJ1", "MFJ0"],
    "A_RFJ3": ["RFJ3"], "A_RFJ2": ["RFJ2"], "A_RFJ1": ["RFJ1", "RFJ0"],
    "A_LFJ4": ["LFJ4"], "A_LFJ3": ["LFJ3"], "A_LFJ2": ["LFJ2"],
    "A_LFJ1": ["LFJ1", "LFJ0"],
    "A_THJ4": ["THJ4"], "A_THJ3": ["THJ3"], "A_THJ2": ["THJ2"],
    "A_THJ1": ["THJ1"], "A_THJ0": ["THJ0"],
}

FINGERTIP_SITE_NAMES: List[str] = [
    "S_fftip", "S_mftip", "S_rftip", "S_lftip", "S_thtip",
]


def _projection_matrices():
    """(hand_interface.py:245-266): position<->control projections."""
    p2c = np.zeros((20, 24))
    c2p = np.zeros((24, 20))
    aid = {a: i for i, a in enumerate(ACTUATORS)}
    jid = {j: i for i, j in enumerate(JOINTS)}
    for act, joints in ACTUATOR_JOINT_MAPPING.items():
        v = 1.0 / len(joints)
        for j in joints:
            p2c[aid[act], jid[j]] = 1.0
            c2p[jid[j], aid[act]] = v
    return p2c, c2p


POSITION_TO_CONTROL_MATRIX, CONTROL_TO_POSITION_MATRIX = _projection_matrices()


@dataclasses.dataclass(frozen=True)
class HandIndex:
    """Static index tables binding hand names to a compiled Model."""

    prefix: str
    actuator_ids: np.ndarray     # (20,) model actuator ids in ACTUATORS order
    joint_ids: np.ndarray        # (24,) model joint ids in JOINTS order
    joint_qpos_ids: np.ndarray   # (24,) qpos addresses in JOINTS order
    joint_dof_ids: np.ndarray    # (24,)
    fingertip_site_ids: np.ndarray  # (5,)

    @classmethod
    def build(cls, model: Model, prefix: str = "robot0:") -> "HandIndex":
        c = model.const
        actuator_ids = np.asarray(
            [c.names["actuator"][prefix + a] for a in ACTUATORS], np.int32
        )
        jids = [c.names["joint"][prefix + j] for j in JOINTS]
        joint_qpos_ids = np.asarray([c.jnt_qposadr[j] for j in jids], np.int32)
        joint_dof_ids = np.asarray([c.jnt_dofadr[j] for j in jids], np.int32)
        fingertip_site_ids = np.asarray(
            [c.names["site"][prefix + s] for s in FINGERTIP_SITE_NAMES], np.int32
        )
        return cls(
            prefix=prefix,
            actuator_ids=actuator_ids,
            joint_ids=np.asarray(jids, np.int32),
            joint_qpos_ids=joint_qpos_ids,
            joint_dof_ids=joint_dof_ids,
            fingertip_site_ids=fingertip_site_ids,
        )


def joint_positions(idx: HandIndex, d: Data) -> jax.Array:
    """(24,) joint angles in JOINTS order (hand observation)."""
    return d.qpos[jnp.asarray(idx.joint_qpos_ids)]


def joint_velocities(idx: HandIndex, d: Data) -> jax.Array:
    return d.qvel[jnp.asarray(idx.joint_dof_ids)]


def fingertip_positions(idx: HandIndex, d: Data) -> jax.Array:
    """(15,) flattened fingertip site positions (reach goal observable)."""
    return d.site_xpos[jnp.asarray(idx.fingertip_site_ids)].reshape(-1)


def ctrl_range(idx: HandIndex, m: Model) -> jax.Array:
    """(20, 2) actuator control ranges in ACTUATORS order."""
    return m.actuator_ctrlrange[jnp.asarray(idx.actuator_ids)]


def joint_positions_to_control(qpos_hand: jax.Array) -> jax.Array:
    """(hand_interface.py:400-405)."""
    return jnp.asarray(POSITION_TO_CONTROL_MATRIX, qpos_hand.dtype) @ qpos_hand


def denormalize_position_control(
    idx: HandIndex,
    m: Model,
    d: Data,
    position_control: jax.Array,
    relative_action: bool = False,
    max_position_change: float | None = None,
) -> jax.Array:
    """[-1,1]^20 -> ctrl in radians (robot_interface.py:247-278). Returns the
    full-model ctrl vector with hand actuators set."""
    cr = ctrl_range(idx, m)
    lo, hi = cr[:, 0], cr[:, 1]
    if relative_action:
        actuation_center = joint_positions_to_control(joint_positions(idx, d))
    else:
        actuation_center = (hi + lo) / 2.0
    arange = (hi - lo) / 2.0
    if relative_action and max_position_change is not None:
        arange = jnp.minimum(arange, max_position_change)
    ctrl = jnp.clip(actuation_center + position_control * arange, lo, hi)
    full = d.ctrl
    return full.at[jnp.asarray(idx.actuator_ids)].set(ctrl)


def zero_control() -> jax.Array:
    """(hand_interface: flat straightened hand)."""
    return jnp.zeros(len(ACTUATORS))


# ---------------------------------------------------------------------------
# Effort (torque) control mode
# ---------------------------------------------------------------------------


def normalize_by_limits(values: jax.Array, limits: jax.Array) -> jax.Array:
    """Scale `values` into [-1, 1] by asymmetric `limits` (N, 2), keeping 0
    fixed (hand_utils.py:21-28). Used for the actuator_effort observation."""
    return jnp.where(values < 0,
                     jnp.abs(values) / limits[:, 0],
                     values / limits[:, 1])


def denormalize_by_limit(interpolation: jax.Array,
                         limits: jax.Array) -> jax.Array:
    """[-1, 1] -> asymmetric limits (N, 2), keeping 0 fixed
    (hand_utils.py:12-18)."""
    return jnp.where(interpolation < 0,
                     limits[:, 0] * jnp.abs(interpolation),
                     limits[:, 1] * interpolation)


def effort_control_model(idx: HandIndex, m: Model) -> Model:
    """Swap the hand actuators into effort (direct-torque) mode.

    The reference flips the SAME MjModel between modes per control call
    (mujoco_shadow_hand.py:139-156: gaintype->FIXED, biastype->NONE,
    gainprm[:,0]=1, biasprm=0, ctrlrange=[-1,1]). Gain/bias TYPES are
    compile-time structure here (the actuator partition in
    physics/actuation.py is static), so the TPU-native equivalent is a
    static model transform: build the effort-mode Model once and jit the
    step against it. Runtime gain ARRAYS change alongside so
    `actuation()`'s plain-actuator branch computes f = 1.0 * ctrl.
    """
    c = m.const
    ids = np.asarray(idx.actuator_ids)
    gt = c.actuator_gaintype.copy()
    bt = c.actuator_biastype.copy()
    from robogym_tpu.mjcf.model import BiasType, GainType
    gt[ids] = GainType.FIXED
    bt[ids] = BiasType.NONE
    const = dataclasses.replace(c, actuator_gaintype=gt, actuator_biastype=bt)
    jids = jnp.asarray(ids)
    gp = m.actuator_gainprm.at[jids, 0].set(1.0)
    bp = m.actuator_biasprm.at[jids].set(0.0)
    cr = m.actuator_ctrlrange.at[jids, 0].set(-1.0).at[jids, 1].set(1.0)
    return m.replace(const=const, actuator_gainprm=gp, actuator_biasprm=bp,
                     actuator_ctrlrange=cr)


def set_effort_control(idx: HandIndex, m: Model, d: Data,
                       control: jax.Array) -> jax.Array:
    """[-1,1]^20 effort command -> full ctrl vector: efforts denormalized by
    the per-actuator force limits (mujoco_shadow_hand.py:139-156). Use with
    a Model from `effort_control_model` so ctrl is force directly."""
    force_limits = m.actuator_forcerange[jnp.asarray(idx.actuator_ids)]
    force = denormalize_by_limit(control, force_limits)
    return d.ctrl.at[jnp.asarray(idx.actuator_ids)].set(force)


def actuator_effort(idx: HandIndex, m: Model, d: Data) -> jax.Array:
    """(20,) applied actuator force normalized to [-1, 1] by forcerange —
    the MuJoCoObservation.actuator_effort channel
    (mujoco_shadow_hand.py:44-55)."""
    ids = jnp.asarray(idx.actuator_ids)
    return normalize_by_limits(d.actuator_force[ids],
                               m.actuator_forcerange[ids])
