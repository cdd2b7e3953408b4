"""Dactyl face-perpendicular Rubik env (TPU build).

Functional re-implementation of the reference face env
(/root/reference/robogym/envs/dactyl/face_perpendicular.py): a Rubik's cube
with only the two z-axis face driver joints actuated by physics (all other
cubelet joints removed from the XML), goals alternating between cube flips
and +-90-degree face rotations (FaceCurriculumGoal,
goals/face_curriculum.py:10-175).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.envs.dactyl import cube_env
from robogym_tpu.mjcf.model import Data
from robogym_tpu.mjcf.xml_tools import MjcfXML
from robogym_tpu.physics import step as physics
from robogym_tpu.robot import shadow_hand as hand
from robogym_tpu.utils import rotation as rot

# joints the face env removes from the perpendicular cube
# (face_perpendicular.py:77-129)
_REMOVED_DRIVERS = [
    "cubelet:driver:neg_x", "cubelet:driver:pos_x",
    "cubelet:driver:neg_y", "cubelet:driver:pos_y",
]
_REMOVED_ROTZ = [
    "cubelet:rotz:neg_x_pos_y", "cubelet:rotz:neg_x_neg_y",
    "cubelet:rotz:pos_x_pos_y", "cubelet:rotz:pos_x_neg_y",
]

# cubelets carried by each z face (face_perpendicular.py:275-296)
TOP_FACE_JOINTS = [
    "cubelet:driver:pos_z",
    "cubelet:rotz:neg_x_pos_y_pos_z", "cubelet:rotz:neg_x_neg_y_pos_z",
    "cubelet:rotz:neg_x_pos_z", "cubelet:rotz:pos_x_pos_z",
    "cubelet:rotz:pos_x_neg_y_pos_z", "cubelet:rotz:pos_x_pos_y_pos_z",
    "cubelet:rotz:neg_y_pos_z", "cubelet:rotz:pos_y_pos_z",
]
BOTTOM_FACE_JOINTS = [
    "cubelet:driver:neg_z",
    "cubelet:rotz:neg_x_pos_y_neg_z", "cubelet:rotz:neg_x_neg_y_neg_z",
    "cubelet:rotz:neg_x_neg_z", "cubelet:rotz:pos_x_neg_z",
    "cubelet:rotz:pos_x_neg_y_neg_z", "cubelet:rotz:pos_x_pos_y_neg_z",
    "cubelet:rotz:neg_y_neg_z", "cubelet:rotz:pos_y_neg_z",
]


def _face_cube_edits(xml: MjcfXML) -> MjcfXML:
    """(face_perpendicular.py:77-101)."""
    xml = (
        xml
        .remove_objects_by_prefix(prefix="cubelet:rotx:", tag="joint")
        .remove_objects_by_prefix(prefix="cubelet:roty:", tag="joint")
        .remove_objects_by_prefix(prefix="cubelet:spring:", tag="joint")
        .remove_objects_by_name(names=_REMOVED_ROTZ, tag="joint")
    )
    for n in _REMOVED_DRIVERS:
        xml = xml.remove_objects_by_name(n, tag="joint")
    return xml


def build_face_world_xml() -> MjcfXML:
    xml = MjcfXML()
    xml.add_default_compiler_directive()
    cube = _face_cube_edits(MjcfXML.parse("rubik/rubik_perpendicular.xml"))
    cube.add_name_prefix("cube:")
    cube.set_named_objects_attr("cube:middle", tag="body", pos=[1.0, 0.87, 0.2])
    xml.append(cube)
    # the reference also adds a non-colliding target clone for rendering
    # (face_perpendicular.py:104-129); goals are data here.
    xml.append(
        MjcfXML.parse("floor/basic_floor.xml").set_named_objects_attr(
            "floor", tag="body", pos=[1, 1, 0]
        )
    )
    xml.append(
        MjcfXML.parse("robot/shadowhand/main.xml")
        .add_name_prefix("robot0:")
        .set_named_objects_attr(
            "robot0:hand_mount", tag="body",
            pos=[1.0, 1.25, 0.15], euler=[np.pi / 2, 0, np.pi],
        )
        .remove_objects_by_name("robot0:annotation:outer_bound")
        .remove_objects_by_name("robot0:hand_base")
    )
    xml.append(MjcfXML.parse("light/default.xml"))
    return xml


@dataclasses.dataclass(frozen=True)
class FacePerpendicularEnvConstants(cube_env.DactylCubeEnvConstants):
    """(face_perpendicular.py:47-68)."""

    success_threshold_cube_quat: float = 0.4
    success_threshold_face_angle: float = 0.2
    goal_generation: str = "face_curr"
    goal_directions: Tuple[str, ...] = ("cw", "ccw")
    round_target_face: bool = True
    p_face_flip: float = 0.25


class FacePerpendicularEnv(cube_env.CubeEnvBase):
    """Pure-function face-perpendicular env."""

    CUBE_XML = "rubik/rubik_perpendicular.xml"

    def __init__(self, constants: Optional[FacePerpendicularEnvConstants] = None,
                 dtype=jnp.float32):
        self.constants = constants or FacePerpendicularEnvConstants()
        self.dtype = dtype
        from robogym_tpu.mjcf.compiler import compile_xml
        from robogym_tpu.mjcf.model import make_data

        model = compile_xml(build_face_world_xml(), dtype=dtype)
        model = model.replace(
            opt=model.opt.replace(
                timestep=jnp.asarray(self.constants.mujoco_timestep, dtype)
            )
        )
        self.model = model
        self.hand = hand.HandIndex.build(model)
        c = model.const
        jn = c.names["joint"]

        def qadr(name, n=1):
            a = int(c.jnt_qposadr[jn[name]])
            return np.arange(a, a + n, dtype=np.int32)

        # cube free joints: slides cube:cube:tx/ty/tz + ball cube:cube:rot
        self.cube = cube_env.CubeIndex(
            cube_pos_qpos=np.concatenate(
                [qadr(f"cube:cube:t{ax}") for ax in "xyz"]
            ),
            cube_rot_qpos=qadr("cube:cube:rot", 4),
            cube_pos_dof=np.concatenate(
                [np.arange(int(c.jnt_dofadr[jn[f"cube:cube:t{ax}"]]),
                           int(c.jnt_dofadr[jn[f"cube:cube:t{ax}"]]) + 1,
                           dtype=np.int32) for ax in "xyz"]
            ),
            cube_rot_dof=np.arange(
                int(c.jnt_dofadr[jn["cube:cube:rot"]]),
                int(c.jnt_dofadr[jn["cube:cube:rot"]]) + 3, dtype=np.int32
            ),
            target_pos_qpos=np.zeros(0, np.int32),
            target_rot_qpos=np.zeros(0, np.int32),
            cube_center_site=int(c.names["site"].get("cube:center", 0)),
        )
        self.driver_qpos = np.concatenate([
            qadr("cube:cubelet:driver:pos_z"), qadr("cube:cubelet:driver:neg_z")
        ])
        self.top_face_qpos = np.concatenate(
            [qadr(f"cube:{j}") for j in TOP_FACE_JOINTS]
        )
        self.bottom_face_qpos = np.concatenate(
            [qadr(f"cube:{j}") for j in BOTTOM_FACE_JOINTS]
        )
        self.action_size = 20

        # goal_quat_for_face: parallel quats putting each z face up
        # (cube_utils.face_up_quats analogue, host-side numpy: the face
        # geom's local +-z axis rotated to world +z)
        pq = cube_env.PARALLEL_QUATS
        ups = []
        for sign in (1.0, -1.0):  # pos_z face, neg_z face
            zs = []
            for q in pq:
                w, x, y, z = q
                # third column of R(q) z-component: rotation of local z
                Rz = np.array([
                    2 * (x * z + w * y), 2 * (y * z - w * x),
                    1 - 2 * (x * x + y * y),
                ])
                zs.append(sign * Rz[2])
            ups.append(pq[int(np.argmax(zs))])
        self.goal_quat_for_face = np.stack(ups)  # (2, 4)

        d0 = make_data(model, dtype=dtype)
        ctrl0 = hand.denormalize_position_control(
            self.hand, model, d0, hand.zero_control().astype(dtype),
            relative_action=False,
        )
        d0 = d0.replace(ctrl=ctrl0)
        settle = jax.jit(lambda d: physics.step_n(
            model, d,
            self.constants.reset_initial_steps * self.constants.mujoco_substeps))
        d0 = jax.block_until_ready(settle(d0))
        self._settled_data = d0.replace(time=jnp.zeros_like(d0.time))

    # ------------------------------------------------------------------
    def face_angles(self, d: Data) -> jax.Array:
        """(2,) driver angles (face_perpendicular.py:237-239)."""
        return d.qpos[jnp.asarray(self.driver_qpos)]

    @property
    def _thresholds(self) -> Dict[str, float]:
        return {
            "cube_quat": self.constants.success_threshold_cube_quat,
            "cube_face_angle": self.constants.success_threshold_face_angle,
        }

    def _goal_distance(self, goal, d: Data) -> Dict[str, jax.Array]:
        """(goals/face_curriculum.py:161-172)."""
        rel_quat = rot.quat_difference(
            goal["cube_quat"], cube_env.cube_quat(self.cube, d)
        )
        rel_face = rot.normalize_angles(
            goal["cube_face_angle"] - self.face_angles(d)
        )
        return {
            "cube_quat": rot.quat_magnitude(rel_quat),
            "cube_face_angle": jnp.linalg.norm(rel_face),
        }

    def _next_goal(self, key: jax.Array, d: Data) -> Dict[str, jax.Array]:
        """FaceCurriculumGoal.next_goal (goals/face_curriculum.py:59-132)."""
        cst = self.constants
        dtype = self.dtype
        k_flip, k_face, k_dir, k_z = jax.random.split(key, 4)

        cube_quat = cube_env.cube_quat(self.cube, d)
        cube_face = self.face_angles(d)
        rounded_face = rot.round_to_straight_angles(cube_face)
        face_diff = rot.normalize_angles(cube_face - rounded_face)
        face_aligned = (
            jnp.linalg.norm(face_diff) < cst.success_threshold_face_angle
        )
        z_aligned = rot.rot_z_aligned(
            cube_quat, cst.success_threshold_cube_quat
        )
        do_reorient = jax.random.uniform(k_flip, (), dtype) < cst.p_face_flip
        rotate_face = face_aligned & z_aligned & ~do_reorient

        # --- face rotation branch: rotate the face currently pointing up
        # (face 0 = pos_z up when cube z-axis up; else neg_z)
        mat = rot.quat2mat(cube_quat)
        face_up = jnp.where(mat[2, 2] > 0, 0, 1)  # local +z up -> pos_z face
        # direction: cw/ccw * (-1)^face (cube_utils.rotated_face_with_angle)
        clockwise = jnp.where(face_up == 0, 1.0, -1.0)
        dirs = []
        if "cw" in cst.goal_directions:
            dirs.append(jnp.pi / 2)
        if "ccw" in cst.goal_directions:
            dirs.append(-jnp.pi / 2)
        choices = jnp.asarray(dirs, dtype) * clockwise
        delta = choices[
            jax.random.randint(k_dir, (), 0, len(dirs))
        ]
        goal_face_rot = rot.normalize_angles(
            rounded_face.at[face_up].add(delta)
        )
        goal_quat_rot = rot.round_to_straight_quat(cube_quat)

        # --- flip branch: align faces, put a random face up
        face_choice = jax.random.randint(k_flip, (), 0, 2)
        z_quat = cube_env.uniform_z_aligned_quat(k_z, dtype)
        face_up_quat = jnp.asarray(self.goal_quat_for_face, dtype)[face_choice]
        goal_quat_flip = rot.quat_mul(z_quat, face_up_quat)
        goal_face_flip = rounded_face

        goal_quat = jnp.where(rotate_face, goal_quat_rot, goal_quat_flip)
        goal_face = jnp.where(rotate_face, goal_face_rot, goal_face_flip)
        return {
            "cube_quat": rot.quat_normalize(goal_quat),
            "cube_face_angle": goal_face,
            # 0 = flip, 1 = rotation (reference face_curriculum.py:131)
            "goal_type": rotate_face.astype(jnp.int32),
        }

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array):
        k_phys, k_goal, k_pause, k_state = jax.random.split(key, 4)
        d = self.reset_physics(k_phys)
        goal = self._next_goal(k_goal, d)
        tracker = core.TrackerState.zero(n_goal_types=2).replace(
            success_steps_required=core.sample_success_steps_required(
                k_pause, self.constants
            )
        )
        state = core.EnvState(
            physics=d, goal=goal, goal_aux=jnp.zeros((), self.dtype),
            prev_goal_distance=self._goal_distance(goal, d),
            tracker=tracker, key=k_state, t=jnp.zeros((), jnp.int32),
        )
        return state, self._observe(state)

    def step(self, state: core.EnvState, action: jax.Array):
        cst = self.constants
        m = core.apply_model_fields(self.model, state.model_fields)
        action = jnp.clip(action, -1.0, 1.0).astype(self.dtype)

        d = state.physics
        ctrl = hand.denormalize_position_control(
            self.hand, m, d, action,
            relative_action=cst.relative_action,
            max_position_change=cst.max_position_change,
        )
        d = d.replace(ctrl=ctrl)
        d = physics.step_n(m, d, cst.mujoco_substeps)
        d, crashed = core.divergence_guard(state.physics, d)

        dist = self._goal_distance(state.goal, d)
        goal_distance_reward = core.goal_distance_sum(
            state.prev_goal_distance
        ) - core.goal_distance_sum(dist)
        successful = core.is_successful(dist, self._thresholds)
        tracker, success_reward, done, need_new_goal = core.tracker_process(
            state.tracker, cst, successful, jnp.zeros((), bool),
            goal_type=state.goal["goal_type"],
        )

        env_reward = jnp.zeros((), self.dtype)
        if cst.stop_on_fall:
            fallen = ~cube_env.is_on_palm(self.cube, d)
            done = done | fallen
            env_reward = jnp.where(fallen, cst.drop_reward, 0.0).astype(self.dtype)

        key, k_goal, k_pause = jax.random.split(state.key, 3)

        def resample(_):
            return self._next_goal(k_goal, d), core.sample_success_steps_required(
                k_pause, cst
            )

        def keep(_):
            return state.goal, tracker.success_steps_required

        goal, succ_req = jax.lax.cond(need_new_goal, resample, keep, None)
        tracker = tracker.replace(
            success_steps_required=succ_req,
            consecutive_successes=jnp.where(
                need_new_goal, 0, tracker.consecutive_successes
            ),
        )
        dist_after = jax.lax.cond(
            need_new_goal, lambda _: self._goal_distance(goal, d),
            lambda _: dist, None,
        )

        new_state = core.EnvState(
            physics=d, goal=goal, goal_aux=state.goal_aux,
            prev_goal_distance=dist_after, tracker=tracker, key=key,
            t=state.t + 1, model_fields=state.model_fields,
        )
        reward = jnp.stack([
            env_reward, goal_distance_reward.astype(self.dtype),
            success_reward.astype(self.dtype),
        ])
        done = done | crashed
        info = {
            "env_crash": crashed,
            "is_successful": successful,
            "goal_dist_quat": dist["cube_quat"],
            "goal_dist_face": dist["cube_face_angle"],
        }
        info.update(core.tracker_info(
            tracker, cst, ("flip", "rotation"),
            goal_type=state.goal["goal_type"],
        ))
        return new_state, self._observe(new_state), reward, done, info

    def _observe(self, state: core.EnvState) -> Dict[str, jax.Array]:
        """(face_perpendicular.py:297-313 observation map)."""
        d = state.physics
        return {
            "cube_pos": cube_env.cube_pos(self.cube, d),
            "cube_quat": cube_env.cube_quat(self.cube, d),
            "cube_face_angle": self.face_angles(d),
            "qpos": d.qpos,
            "qvel": d.qvel,
            "hand_angle": hand.joint_positions(self.hand, d),
            "fingertip_pos": cube_env.relative_fingertip_positions(
                self.hand, self.model, d
            ),
            "goal_pos": jnp.zeros(3, self.dtype),
            "goal_quat": state.goal["cube_quat"],
            "goal_face_angle": state.goal["cube_face_angle"],
        }


def make_env(constants: Optional[dict] = None, dtype=jnp.float32):
    cst = FacePerpendicularEnvConstants(**(constants or {}))
    return FacePerpendicularEnv(cst, dtype=dtype)


make_simple_env = functools.partial(make_env)
