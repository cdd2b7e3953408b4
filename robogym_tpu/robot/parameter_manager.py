"""Shadow-Hand per-actuator parameter configurer (calibration interface).

Reference: /root/reference/robogym/robot/shadow_hand/mujoco/
parameter_manager.py:12-216 `MuJoCoParameterManager` — maps a flat
assignment dict per actuator onto MjModel fields (PID gain params, force
range, spring-tendon stiffness/rest-length/range, coupling-pulley radius,
per-joint damping and joint limits) and reads them back, with calibration
search bounds.

TPU-native shape: all the targets are RUNTIME `Model` arrays
(mjcf/model.py:307-381), so `set_parameters` is a pure `Model -> Model`
update usable inside jit (and thus per-env under vmap via
EnvState.model_fields); name->id resolution happens host-side here.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Model
from robogym_tpu.robot.shadow_hand import ACTUATOR_JOINT_MAPPING, ACTUATORS

# actuators whose distal joint pair is driven through a spring tendon
# (parameter_manager.py:208-216)
_SPRING_TENDON_ACTUATORS = ("A_FFJ1", "A_MFJ1", "A_RFJ1", "A_LFJ1")

_GAINPRM_KEYS = (
    "actuator_gainprm_kp", "actuator_gainprm_ti", "actuator_gainprm_iclamp",
    "actuator_gainprm_td", "actuator_gainprm_dsmooth",
    "actuator_gainprm_error_deadband",
)


def has_spring_tendon(actuator: str) -> bool:
    return actuator in _SPRING_TENDON_ACTUATORS


def spring_tendon_name(actuator: str) -> str:
    assert has_spring_tendon(actuator)
    return actuator.replace("A_", "")[:-2] + "T2"


class ShadowHandParameterManager:
    """Functional MuJoCoParameterManager: ids resolved once per model."""

    def __init__(self, model: Model, hand_prefix: str = "robot0:"):
        c = model.const
        self.prefix = hand_prefix
        self.actuator_id = {
            a: c.names["actuator"][hand_prefix + a] for a in ACTUATORS
        }
        self.joint_dof = {}
        self.joint_id = {}
        for joints in ACTUATOR_JOINT_MAPPING.values():
            for j in joints:
                jid = c.names["joint"][hand_prefix + j]
                self.joint_id[j] = jid
                self.joint_dof[j] = int(np.asarray(c.jnt_dofadr)[jid])
        self.tendon_id = {
            a: c.names["tendon"][hand_prefix + spring_tendon_name(a)]
            for a in _SPRING_TENDON_ACTUATORS
            if hand_prefix + spring_tendon_name(a) in c.names["tendon"]
        }
        self.pulley_geom = {}
        for a in _SPRING_TENDON_ACTUATORS:
            for j in ACTUATOR_JOINT_MAPPING[a]:
                g = f"{hand_prefix}coupling_{j}_pulley"
                if g in c.names["geom"]:
                    self.pulley_geom[j] = c.names["geom"][g]

    def set_parameters(self, m: Model, actuator: str,
                       assignments: Dict[str, float]) -> Model:
        """Apply one actuator's assignment dict (parameter_manager.py:15-77).
        biasprm[1] is kept at -kp for position actuators per the MuJoCo
        position-actuator convention noted there."""
        assert actuator in ACTUATORS
        aid = self.actuator_id[actuator]
        gp = m.actuator_gainprm
        for slot, key in enumerate(_GAINPRM_KEYS):
            if key in assignments:
                gp = gp.at[aid, slot].set(assignments[key])
        m = m.replace(actuator_gainprm=gp)
        if "actuator_forcerange" in assignments:
            fr = assignments["actuator_forcerange"]
            m = m.replace(actuator_forcerange=(
                m.actuator_forcerange.at[aid, 0].set(-fr).at[aid, 1].set(fr)
            ))

        if actuator in self.tendon_id:
            tid = self.tendon_id[actuator]
            if "tendon_stiffness" in assignments:
                m = m.replace(tendon_stiffness=m.tendon_stiffness.at[tid].set(
                    assignments["tendon_stiffness"]))
            if "tendon_lengthspring" in assignments:
                m = m.replace(
                    tendon_lengthspring=m.tendon_lengthspring.at[tid].set(
                        assignments["tendon_lengthspring"]))
            if "tendon_range" in assignments:
                m = m.replace(tendon_range=m.tendon_range.at[tid, 1].set(
                    assignments["tendon_range"]))
            for j in ACTUATOR_JOINT_MAPPING[actuator]:
                key = f"{j}_tendon_geom_0"
                if key in assignments and j in self.pulley_geom:
                    m = m.replace(geom_size=m.geom_size.at[
                        self.pulley_geom[j], 0].set(assignments[key]))

        for j in ACTUATOR_JOINT_MAPPING[actuator]:
            jid, dof = self.joint_id[j], self.joint_dof[j]
            if f"{j}_dof_damping" in assignments:
                m = m.replace(dof_damping=m.dof_damping.at[dof].set(
                    assignments[f"{j}_dof_damping"]))
            jr = m.jnt_range
            if f"{j}_jnt_range_0" in assignments:
                jr = jr.at[jid, 0].set(assignments[f"{j}_jnt_range_0"])
            if f"{j}_jnt_range_1" in assignments:
                jr = jr.at[jid, 1].set(assignments[f"{j}_jnt_range_1"])
            m = m.replace(jnt_range=jr)
        return m

    def current_parameters(self, m: Model, actuator: str) -> Dict[str, float]:
        """Read back the assignment dict (parameter_manager.py:79-136)."""
        assert actuator in ACTUATORS
        aid = self.actuator_id[actuator]
        gp = np.asarray(m.actuator_gainprm)
        out = {key: float(gp[aid, slot])
               for slot, key in enumerate(_GAINPRM_KEYS)}
        out["actuator_forcerange"] = float(
            np.asarray(m.actuator_forcerange)[aid, 1])
        if actuator in self.tendon_id:
            tid = self.tendon_id[actuator]
            out["tendon_stiffness"] = float(
                np.asarray(m.tendon_stiffness)[tid])
            out["tendon_lengthspring"] = float(
                np.asarray(m.tendon_lengthspring)[tid])
            out["tendon_range"] = float(np.asarray(m.tendon_range)[tid, 1])
            for j in ACTUATOR_JOINT_MAPPING[actuator]:
                if j in self.pulley_geom:
                    out[f"{j}_tendon_geom_0"] = float(
                        np.asarray(m.geom_size)[self.pulley_geom[j], 0])
        for j in ACTUATOR_JOINT_MAPPING[actuator]:
            out[f"{j}_dof_damping"] = float(
                np.asarray(m.dof_damping)[self.joint_dof[j]])
            jr = np.asarray(m.jnt_range)[self.joint_id[j]]
            out[f"{j}_jnt_range_0"] = float(jr[0])
            out[f"{j}_jnt_range_1"] = float(jr[1])
        return out

    def parameter_bounds(self, m: Model,
                         actuator: str) -> Dict[str, list]:
        """Calibration search bounds (parameter_manager.py:138-206)."""
        cur = self.current_parameters(m, actuator)
        b = {
            "actuator_gainprm_kp": [0.25 * cur["actuator_gainprm_kp"],
                                    4 * cur["actuator_gainprm_kp"]],
            "actuator_gainprm_ti": [0.25 * cur["actuator_gainprm_ti"],
                                    4 * cur["actuator_gainprm_ti"] + 10.0],
            "actuator_gainprm_iclamp": [
                0.25 * cur["actuator_gainprm_iclamp"],
                4 * cur["actuator_gainprm_iclamp"] + 10.0],
            "actuator_gainprm_td": [0.25 * cur["actuator_gainprm_td"],
                                    4 * cur["actuator_gainprm_td"] + 0.1],
            "actuator_gainprm_dsmooth": [0.0, 0.2],
            "actuator_gainprm_error_deadband": [0.0, 0.03],
            "actuator_forcerange": [0.25 * cur["actuator_forcerange"],
                                    4 * cur["actuator_forcerange"]],
        }
        if actuator in self.tendon_id:
            b["tendon_stiffness"] = [0.25 * cur["tendon_stiffness"],
                                     4 * cur["tendon_stiffness"]]
            b["tendon_lengthspring"] = [0.25 * cur["tendon_lengthspring"],
                                        4 * cur["tendon_lengthspring"]]
            b["tendon_range"] = [0.25 * cur["tendon_range"],
                                 4 * cur["tendon_range"]]
            for j in ACTUATOR_JOINT_MAPPING[actuator]:
                key = f"{j}_tendon_geom_0"
                if key in cur:
                    b[key] = [0.25 * cur[key], 4 * cur[key]]
        for j in ACTUATOR_JOINT_MAPPING[actuator]:
            b[f"{j}_dof_damping"] = [0.01, 0.75]
            b[f"{j}_jnt_range_0"] = [cur[f"{j}_jnt_range_0"] - 0.25,
                                     cur[f"{j}_jnt_range_0"] + 0.25]
            b[f"{j}_jnt_range_1"] = [cur[f"{j}_jnt_range_1"] - 0.25,
                                     cur[f"{j}_jnt_range_1"] + 0.25]
        return b
