"""Shared dactyl cube-env machinery (TPU build).

Functional re-implementation of the reference CubeEnv base
(/root/reference/robogym/envs/dactyl/common/cube_env.py:31-388) and cube
utilities (/root/reference/robogym/envs/dactyl/common/cube_utils.py): world
XML composition (hand + cube + target), palm check, parallel-quat tables and
z-aligned goal-quat sampling, and the batched reset randomization loop
(locked.py:197-225: zero-control settle, cube pose wiggle, random warmup
steps, retry-until-on-palm).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import Data, Model, make_data
from robogym_tpu.mjcf.xml_tools import MjcfXML
from robogym_tpu.physics import step as physics
from robogym_tpu.robot import shadow_hand as hand
from robogym_tpu.utils import rotation as rot

# 24 proper rotations of the cube group (cube_utils.py:8-11); our
# get_parallel_rotations already returns sign-normalized unit quaternions
PARALLEL_QUATS = np.asarray(rot.get_parallel_rotations(), np.float64)


@dataclasses.dataclass(frozen=True)
class DactylCubeEnvConstants(core.EnvConstants):
    """(cube_env.py:57-135)."""

    successes_needed: int = 50
    max_timesteps_per_goal: int = 400
    reset_initial_steps: int = 20
    n_random_initial_steps: int = 10
    max_pose_resets: int = 8  # reference: 50; bounded for jit (hit ~never)
    cube_position_wiggle_std: float = 0.005
    drop_reward: float = -20.0
    stop_on_fall: bool = True
    # phasespace-style relative fingertips (hand_forward_kinematics.py:39-51)
    relative_fingertips: bool = True


REFERENCE_SITE_NAMES = ["phasespace_ref0", "phasespace_ref1", "phasespace_ref2"]


# Three fixed cameras looking at the on-palm cube from above/right/left.
# The reference's vision rig (DEFAULT_CAMERA_NAMES, cube_utils.py:14) lives
# in an internal cage model not shipped with the public assets, so the
# placements here are re-derived: cube rest pose is [1.0, 0.87, ~0.25]
# (build_cube_world_xml below); camera zaxis points from target to camera
# (MuJoCo cameras look along local -Z).
DACTYL_VISION_CAMERA_XML = """
<mujoco>
  <worldbody>
    <camera name="vision_cam_top" pos="1.0 0.87 0.75" zaxis="0 0 1"
            fovy="45"/>
    <camera name="vision_cam_right" pos="1.4 0.5 0.55"
            zaxis="0.4 -0.37 0.3" fovy="45"/>
    <camera name="vision_cam_left" pos="0.6 0.5 0.55"
            zaxis="-0.4 -0.37 0.3" fovy="45"/>
  </worldbody>
</mujoco>
"""


def build_cube_world_xml(cube_xml_path: str, cube_density: float = 421.0,
                         with_vision_cams: bool = False) -> MjcfXML:
    """World composition shared by all cube envs
    (cube_env.py:172-218 + locked.py:79-96)."""
    xml = MjcfXML()
    xml.add_default_compiler_directive()
    if with_vision_cams:
        xml.append(MjcfXML.from_string(DACTYL_VISION_CAMERA_XML))
    xml.append(
        MjcfXML.parse(cube_xml_path)
        .remove_objects_by_name("annotation:outer_bound")
        .add_name_prefix("cube:")
        .set_named_objects_attr("cube:middle", tag="body", pos=[1.0, 0.87, 0.2])
        .set_named_objects_attr("cube:middle", tag="geom", density=cube_density)
    )
    xml.append(
        MjcfXML.parse(cube_xml_path)
        .remove_objects_by_name("annotation:outer_bound")
        .add_name_prefix("target:")
        .set_named_objects_attr("target:middle", tag="body", pos=[1.0, 0.87, 0.2])
        .set_objects_attr(tag="geom", group="2", conaffinity="0", contype="0")
    )
    xml.append(
        MjcfXML.parse("floor/basic_floor.xml").set_named_objects_attr(
            "floor", tag="body", pos=[1, 1, 0]
        )
    )
    xml.append(
        MjcfXML.parse("robot/shadowhand/main.xml")
        .add_name_prefix("robot0:")
        .set_named_objects_attr(
            "robot0:hand_mount",
            tag="body",
            pos=[1.0, 1.25, 0.15],
            euler=[np.pi / 2, 0, np.pi],
        )
        .remove_objects_by_name("robot0:annotation:outer_bound")
        .remove_objects_by_name("robot0:hand_base")
    )
    xml.append(MjcfXML.parse("light/default.xml"))
    return xml


@dataclasses.dataclass(frozen=True)
class CubeIndex:
    """Static joint/site index tables for cube + target bodies."""

    cube_pos_qpos: np.ndarray   # (3,) slide joint qpos addresses
    cube_rot_qpos: np.ndarray   # (4,) ball joint quat qpos addresses
    cube_pos_dof: np.ndarray    # (3,)
    cube_rot_dof: np.ndarray    # (3,)
    target_pos_qpos: np.ndarray
    target_rot_qpos: np.ndarray
    cube_center_site: int

    @classmethod
    def build(cls, model: Model) -> "CubeIndex":
        c = model.const
        jn = c.names["joint"]

        def qadr(name, n):
            j = jn[name]
            a = int(c.jnt_qposadr[j])
            return np.arange(a, a + n, dtype=np.int32)

        def dadr(name, n):
            j = jn[name]
            a = int(c.jnt_dofadr[j])
            return np.arange(a, a + n, dtype=np.int32)

        cube_pos_qpos = np.concatenate(
            [qadr(f"cube:cube_t{ax}", 1) for ax in "xyz"]
        )
        cube_pos_dof = np.concatenate([dadr(f"cube:cube_t{ax}", 1) for ax in "xyz"])
        return cls(
            cube_pos_qpos=cube_pos_qpos,
            cube_rot_qpos=qadr("cube:cube_rot", 4),
            cube_pos_dof=cube_pos_dof,
            cube_rot_dof=dadr("cube:cube_rot", 3),
            target_pos_qpos=np.concatenate(
                [qadr(f"target:cube_t{ax}", 1) for ax in "xyz"]
            ),
            target_rot_qpos=qadr("target:cube_rot", 4),
            cube_center_site=int(c.names["site"]["cube:center"]),
        )


def cube_pos(idx: CubeIndex, d: Data) -> jax.Array:
    return d.qpos[jnp.asarray(idx.cube_pos_qpos)]


def cube_quat(idx: CubeIndex, d: Data) -> jax.Array:
    return rot.quat_normalize(d.qpos[jnp.asarray(idx.cube_rot_qpos)])


def is_on_palm(idx: CubeIndex, d: Data) -> jax.Array:
    """cube:center site above palm plane (cube_utils.py:18-24)."""
    return d.site_xpos[idx.cube_center_site, 2] > 0.04


def up_axis_with_sign(cube_quat: jax.Array):
    """Cube-frame axis (index + sign) closest to world up
    (reference cube_utils.py:157-165)."""
    mtx = rot.quat2mat(cube_quat)
    z_dots = mtx[2, :]                       # z_up . column_i
    axis_nr = jnp.argmax(jnp.abs(z_dots))
    sign = jnp.sign(z_dots[axis_nr])
    sign = jnp.where(sign == 0, 1.0, sign)
    return axis_nr, sign


def align_quat_up(cube_quat: jax.Array) -> jax.Array:
    """Rotate quat so the nearest-up face is exactly up
    (reference cube_utils.py:138-154)."""
    axis_nr, sign = up_axis_with_sign(cube_quat)
    mtx = rot.quat2mat(cube_quat)
    axis = jnp.take(mtx, axis_nr, axis=1) * sign
    z_up = jnp.asarray([0.0, 0.0, 1.0], cube_quat.dtype)
    dq = rot.vectors2quat(axis, z_up)
    return rot.quat_normalize(rot.quat_mul(dq, cube_quat))


def distance_quat_from_being_up(
    cube_quat: jax.Array, axis_nr: jax.Array, sign: jax.Array
) -> jax.Array:
    """Residual quat from having the given cube axis point up
    (reference cube_utils.py:168-181)."""
    mtx = rot.quat2mat(cube_quat)
    axis = jnp.take(mtx, axis_nr, axis=1) * sign
    z_up = jnp.asarray([0.0, 0.0, 1.0], cube_quat.dtype)
    return rot.quat_normalize(rot.vectors2quat(axis, z_up))


def uniform_z_aligned_quat(key: jax.Array, dtype) -> jax.Array:
    """Random rotation about z (cube_utils.py:26-31)."""
    angle = jax.random.uniform(key, (), dtype, minval=-np.pi, maxval=np.pi)
    return rot.quat_normalize(
        rot.quat_from_angle_and_axis(angle, jnp.asarray([0.0, 0.0, 1.0], dtype))
    )


def sample_parallel_goal_quat(key: jax.Array, dtype) -> jax.Array:
    """LockedParallelGoal.next_goal (goals/locked_parallel.py:32-47):
    z-aligned quat x random parallel (cube-group) quat."""
    kz, kp = jax.random.split(key)
    z_quat = uniform_z_aligned_quat(kz, dtype)
    choice = jax.random.randint(kp, (), 0, len(PARALLEL_QUATS))
    parallel = jnp.asarray(PARALLEL_QUATS, dtype)[choice]
    return rot.quat_mul(z_quat, parallel)


def relative_fingertip_positions(
    hand_idx: hand.HandIndex, model: Model, d: Data
) -> jax.Array:
    """Fingertips in the phasespace reference frame
    (hand_forward_kinematics.py:39-51): origin at ref1, basis
    [ref0_hat, ref0_hat x ref2_hat, ref2_hat]."""
    c = model.const
    ref_ids = jnp.asarray(
        [c.names["site"][hand_idx.prefix + s] for s in REFERENCE_SITE_NAMES]
    )
    refs = d.site_xpos[ref_ids]                       # (3, 3)
    tips = d.site_xpos[jnp.asarray(hand_idx.fingertip_site_ids)]  # (5, 3)
    origin = refs[1]
    r0 = refs[0] - origin
    r2 = refs[2] - origin
    r0 = r0 / jnp.linalg.norm(r0)
    r2 = r2 / jnp.linalg.norm(r2)
    ort = jnp.cross(r0, r2)
    mbasis = jnp.stack([r0, ort, r2], axis=1)          # columns
    return ((tips - origin) @ mbasis).reshape(-1)


class CubeEnvBase:
    """Shared construction + reset randomization for dactyl cube envs."""

    CUBE_XML: str = "rubik/rubik_locked.xml"

    def __init__(self, constants: DactylCubeEnvConstants, dtype=jnp.float32):
        self.constants = constants
        self.dtype = dtype
        needs_cams = getattr(
            constants, "vision_observation_provider", ""
        ) == "raycast"
        model = compile_xml(
            build_cube_world_xml(self.CUBE_XML, with_vision_cams=needs_cams),
            dtype=dtype,
        )
        model = model.replace(
            opt=model.opt.replace(
                timestep=jnp.asarray(constants.mujoco_timestep, dtype)
            )
        )
        self.model = model
        self.hand = hand.HandIndex.build(model)
        self.cube = CubeIndex.build(model)
        self.action_size = 20

        # zero-control settle (reset_initial_steps) is deterministic given the
        # XML initial state, so it is precomputed once (locked.py:197-206).
        d0 = make_data(model, dtype=dtype)
        ctrl0 = hand.denormalize_position_control(
            self.hand, model, d0, hand.zero_control().astype(dtype),
            relative_action=False,
        )
        d0 = d0.replace(ctrl=ctrl0)
        settle = jax.jit(
            lambda d: physics.step_n(
                model, d, constants.reset_initial_steps * constants.mujoco_substeps
            )
        )
        d0 = jax.block_until_ready(settle(d0))
        self._settled_data = d0.replace(time=jnp.zeros_like(d0.time))

    # ------------------------------------------------------------------
    def _randomize_cube_pose(self, key: jax.Array, d: Data) -> Data:
        """Wiggle cube position + uniform orientation (locked.py:207-217)."""
        cst = self.constants
        k_pos, k_quat = jax.random.split(key)
        wiggle = cst.cube_position_wiggle_std * jax.random.normal(
            k_pos, (3,), self.dtype
        )
        qpos = d.qpos.at[jnp.asarray(self.cube.cube_pos_qpos)].add(wiggle)
        quat = rot.uniform_quat(k_quat).astype(self.dtype)
        qpos = qpos.at[jnp.asarray(self.cube.cube_rot_qpos)].set(quat)
        return d.replace(qpos=qpos)

    def _random_warmup_steps(self, key: jax.Array, d: Data) -> Data:
        """n_random_initial_steps with one fixed random action
        (locked.py:218-225)."""
        cst = self.constants
        if cst.n_random_initial_steps <= 0:
            return physics.fwd_position(self.model, d)
        action = jax.random.uniform(
            key, (self.action_size,), self.dtype, minval=-1.0, maxval=1.0
        )
        ctrl = hand.denormalize_position_control(
            self.hand, self.model, d, action, relative_action=False
        )
        d = d.replace(ctrl=ctrl)
        return physics.step_n(
            self.model, d, cst.n_random_initial_steps * cst.mujoco_substeps
        )

    def reset_physics(self, key: jax.Array, initial: Data | None = None) -> Data:
        """Retry pose randomization until the cube rests on the palm
        (cube_env.py:330-355). Bounded lax.while_loop; identical instruction
        stream across the batch."""
        cst = self.constants
        base = self._settled_data if initial is None else initial

        def attempt(key):
            k1, k2 = jax.random.split(key)
            d = self._randomize_cube_pose(k1, base)
            d = self._random_warmup_steps(k2, d)
            return d

        def cond(carry):
            i, key, d = carry
            return (~is_on_palm(self.cube, d)) & (i < cst.max_pose_resets)

        def body(carry):
            i, key, d = carry
            key, k = jax.random.split(key)
            return (i + 1, key, attempt(k))

        key, k0 = jax.random.split(key)
        _, _, d = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), key, attempt(k0)))
        return d
