"""Rearrange blocks environment (TPU build).

Functional re-implementation of the reference blocks env
(/root/reference/robogym/envs/rearrange/blocks.py:22-40 on top of
common/base.py:218-995): a UR16e arm + Robotiq 2f-85 over a table with
`num_objects` blocks; goals are free placements of every block; reward is
the change in the number of objects within the success threshold; episode
ends when an object leaves the table (with penalty), after
`max_timesteps_per_goal_per_obj * num_objects` steps per goal, or after
`successes_needed` goals.

TPU-first: `max_num_objects` block slots compiled once; `num_objects` is a
per-episode mask (the reference rebuilds the MjSim per reset,
common/base.py:850-856); object size randomization writes `geom_size`/
`body_inertia` model fields.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.mjcf.model import Data, make_data
from robogym_tpu.physics import step as physics
from robogym_tpu.robot import composite as composite_lib
from robogym_tpu.robot import gripper as gripper_lib
from robogym_tpu.robot import tcp_solver
from robogym_tpu.robot import ur16e as arm_lib
from robogym_tpu.utils import rotation as rot


@dataclasses.dataclass(frozen=True)
class RearrangeEnvConstants(core.EnvConstants):
    """(common/base.py:103-205)."""

    mujoco_substeps: int = 40
    mujoco_timestep: float = 0.001
    success_threshold_obj_pos: float = 0.04
    success_threshold_obj_rot: float = 0.2
    max_timesteps_per_goal_per_obj: int = 200
    successes_needed: int = 1
    goal_reward_per_object: float = 1.0
    success_pause_range_s: Tuple[float, float] = (0.0, 0.5)
    # goal generation: state | reach | stack | pickandplace
    goal_generation: str = "state"
    stabilize_objects: bool = True
    stabilize_steps: int = 5   # reference: 100 zero-ctrl settle steps


@dataclasses.dataclass(frozen=True)
class RearrangeSimParameters:
    """(simulation/base.py:42-140, randomizable subset)."""

    num_objects: int = 5
    max_num_objects: int = 8
    object_size: float = 0.0254
    used_table_portion: float = 1.0
    goal_distance_ratio: float = 1.0
    penalty_table_collision: float = 0.0
    penalty_objects_off_table: float = 0.0
    penalty_wrist_collision: float = 0.0
    penalty_safety_stop: float = 0.0


@dataclasses.dataclass(frozen=True)
class RearrangeEnvParameters:
    simulation_params: RearrangeSimParameters = dataclasses.field(
        default_factory=RearrangeSimParameters
    )
    robot_control_params: composite_lib.RobotControlParameters = (
        dataclasses.field(
            default_factory=lambda: composite_lib.RobotControlParameters(
                control_mode=composite_lib.ControlMode.JOINT,
                tcp_solver_mode=composite_lib.TcpSolverMode.MOCAP,
            )
        )
    )
    n_random_initial_steps: int = 10


class BlocksRearrangeEnv:
    """Pure-function rearrange blocks env: reset(key) / step(state, action)."""

    GOAL_CLASSES = {
        "state": goals_lib.ObjectStateGoal,
        "reach": goals_lib.ObjectReachGoal,
        "stack": goals_lib.ObjectStackGoal,
        "pickandplace": goals_lib.PickAndPlaceGoal,
    }

    def __init__(
        self,
        constants: Optional[RearrangeEnvConstants] = None,
        parameters: Optional[RearrangeEnvParameters] = None,
        dtype=jnp.float32,
    ):
        self.constants = constants or RearrangeEnvConstants()
        self.parameters = parameters or RearrangeEnvParameters()
        self.dtype = dtype
        sp = self.parameters.simulation_params
        rcp = self.parameters.robot_control_params

        model, idx = sim_lib.compile_blocks_world(
            sp.max_num_objects, sp.object_size, rcp,
            self.constants.mujoco_timestep, dtype=dtype,
        )
        self.model = model
        self.idx = idx
        self.robot = composite_lib.CompositeIndex.build(model, rcp)
        self.action_size = self.robot.action_size

        # per-goal timeout scales with object count (common/base.py:425-427)
        self.constants = dataclasses.replace(
            self.constants,
            max_timesteps_per_goal=(
                self.constants.max_timesteps_per_goal_per_obj * sp.num_objects
            ),
        )

        goal_cls = self.GOAL_CLASSES[self.constants.goal_generation]
        if self.constants.goal_generation == "reach":
            self.goal_gen = goal_cls(
                idx, self.robot.arm, goals_lib.GoalArgs(), dtype=dtype,
                used_table_portion=sp.used_table_portion,
            )
        else:
            self.goal_gen = goal_cls(
                idx, goals_lib.GoalArgs(), dtype=dtype,
                used_table_portion=sp.used_table_portion,
            )

        # settled initial data: arm to tabletop pose, objects parked
        d0 = make_data(model, dtype=dtype)
        qpos = d0.qpos.at[jnp.asarray(self.robot.arm.joint_qpos_ids)].set(
            jnp.asarray(arm_lib.TABLETOP_EXPERIMENT_INITIAL_POS, dtype)
        )
        d0 = d0.replace(qpos=qpos)
        park = jnp.asarray(sim_lib.PARK_POSITION, dtype)
        pos0 = park[None, :] + jnp.asarray(
            [0.3, 0.0, 0.0], dtype
        )[None, :] * jnp.arange(sp.max_num_objects, dtype=dtype)[:, None]
        quat0 = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype),
                         (sp.max_num_objects, 1))
        d0 = sim_lib.set_object_poses(idx, d0, pos0, quat0)
        if rcp.is_tcp_controlled():
            # align the mocap weld target to the gripper before settling
            d0 = tcp_solver.reset_mocap_to_body(
                physics.fwd_position(model, d0), self.robot.arm.tcp_body_id
            )
        else:
            # hold arm at initial pose while settling
            d0 = d0.replace(ctrl=composite_lib.set_position_control_joint(
                self.robot, model, d0, jnp.zeros(self.action_size, dtype),
                relative_action=True,
            ))
        settle = jax.jit(lambda d: physics.step_n(
            model, d, 5 * self.constants.mujoco_substeps))
        d0 = jax.block_until_ready(settle(d0))
        self._initial_data = d0.replace(time=jnp.zeros_like(d0.time))

    # ------------------------------------------------------------------
    @property
    def num_objects(self) -> int:
        return self.parameters.simulation_params.num_objects

    @property
    def max_num_objects(self) -> int:
        return self.parameters.simulation_params.max_num_objects

    def _active_mask(self) -> jax.Array:
        return jnp.arange(self.max_num_objects) < self.num_objects

    def _object_half_sizes(self) -> jax.Array:
        return self.model.geom_size[jnp.asarray(self.idx.object_geom_ids)]

    @property
    def _thresholds(self) -> Dict[str, float]:
        cst = self.constants
        return {
            "obj_pos": cst.success_threshold_obj_pos,
            "obj_rot": cst.success_threshold_obj_rot,
        }

    def _num_success(self, dist: Dict[str, jax.Array]) -> jax.Array:
        """(common/base.py:824-841 _calculate_num_success)."""
        ok = jnp.ones(self.max_num_objects, bool)
        for k, thr in self._thresholds.items():
            ok = ok & (dist[k] < thr)
        return ok.sum() * self.constants.goal_reward_per_object

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array) -> Tuple[core.EnvState, Dict]:
        cst = self.constants
        sp = self.parameters.simulation_params
        k_place, k_rot, k_settle, k_goal, k_pause, k_state = (
            jax.random.split(key, 6)
        )
        active = self._active_mask()
        sizes = self._object_half_sizes()
        d = self._initial_data

        # place objects (grid/rejection placement, common/base.py:797-822)
        pos, valid = goals_lib.sample_goal_positions(
            k_place, self.idx, active, sizes, self.num_objects,
            sp.used_table_portion, dtype=self.dtype,
        )
        quat = goals_lib.sample_goal_rotations(
            k_rot, self.max_num_objects,
            goals_lib.GoalArgs(randomize_goal_rot=True), self.dtype,
        )
        d = sim_lib.set_object_poses(self.idx, d, pos, quat)

        # stabilize objects (common/utils.py:76-94)
        if cst.stabilize_objects:
            d = physics.step_n(
                self.model, d, cst.stabilize_steps * cst.mujoco_substeps
            )
        else:
            d = physics.fwd_position(self.model, d)

        goal = self.goal_gen.next_goal(
            k_goal, active, sizes, self.num_objects, d
        )
        tracker = core.TrackerState.zero().replace(
            success_steps_required=core.sample_success_steps_required(
                k_pause, cst
            )
        )
        state = core.EnvState(
            physics=d,
            goal=goal,
            goal_aux=jnp.zeros((), self.dtype),
            prev_goal_distance=self.goal_gen.goal_distance(goal, d, active),
            tracker=tracker,
            key=k_state,
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._observe(state)

    def step(
        self, state: core.EnvState, action: jax.Array
    ) -> Tuple[core.EnvState, Dict, jax.Array, jax.Array, Dict]:
        cst = self.constants
        sp = self.parameters.simulation_params
        m = core.apply_model_fields(self.model, state.model_fields)
        action = jnp.clip(action, -1.0, 1.0).astype(self.dtype)
        active = self._active_mask()

        d = state.physics
        rcp = self.parameters.robot_control_params
        if rcp.is_tcp_controlled():
            # TCP mocap mode (free_dof_tcp_arm.py): arm action advances the
            # mocap weld target; gripper action is the last dim
            d = tcp_solver.tcp_set_position_control(
                m, d, self.robot.arm.tcp_body_id, action[:-1],
                rcp.control_mode, rcp.default_max_position_change(),
            )
            ctrl = gripper_lib.denormalize_position_control(
                self.robot.gripper, m, d, action[-1:],
                relative_action=cst.relative_action,
            )
        else:
            ctrl = composite_lib.set_position_control_joint(
                self.robot, m, d, action, relative_action=cst.relative_action
            )
        d = d.replace(ctrl=ctrl)
        d = physics.step_n(m, d, cst.mujoco_substeps)

        dist = self.goal_gen.goal_distance(state.goal, d, active)
        goal_distance_reward = self._num_success(dist) - self._num_success(
            state.prev_goal_distance
        )
        successful = jnp.ones((), bool)
        for k, thr in self._thresholds.items():
            successful = successful & jnp.all(
                jnp.where(active, dist[k] < thr, True)
            )

        tracker, success_reward, done, need_new_goal = core.tracker_process(
            state.tracker, cst, successful, jnp.zeros((), bool)
        )

        # penalties + off-table termination (common/base.py:768-795)
        env_reward = jnp.zeros((), self.dtype)
        off_table = sim_lib.check_objects_off_table(
            self.idx, sim_lib.object_positions(self.idx, d),
            active_mask=active,
        )
        any_off = jnp.any(off_table)
        done = done | any_off
        env_reward = env_reward - jnp.where(
            any_off, sp.penalty_objects_off_table, 0.0
        ).astype(self.dtype)
        table_contact = sim_lib.gripper_table_contact(self.idx, m, d)
        env_reward = env_reward - jnp.where(
            table_contact, sp.penalty_table_collision, 0.0
        ).astype(self.dtype)

        key, k_goal, k_pause = jax.random.split(state.key, 3)
        sizes = self._object_half_sizes()

        def resample(_):
            goal = self.goal_gen.next_goal(
                k_goal, active, sizes, self.num_objects, d
            )
            req = core.sample_success_steps_required(k_pause, cst)
            return goal, req

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
            need_new_goal,
            lambda _: self.goal_gen.goal_distance(goal, d, active),
            lambda _: dist,
            None,
        )

        new_state = core.EnvState(
            physics=d, goal=goal, goal_aux=state.goal_aux,
            prev_goal_distance=dist_after, tracker=tracker, key=key,
            t=state.t + 1, model_fields=state.model_fields,
        )
        reward = jnp.stack([
            env_reward,
            goal_distance_reward.astype(self.dtype),
            success_reward.astype(self.dtype),
        ])
        info = {
            "successes_so_far": tracker.successes_so_far,
            "trial_success": tracker.trial_success,
            "objects_off_table": off_table,
            "gripper_table_contact": table_contact,
            "is_successful": successful,
        }
        return new_state, self._observe(new_state), reward, done, info

    def _observe(self, state: core.EnvState) -> Dict[str, jax.Array]:
        """Core subset of _observe_simple (common/base.py:376-421), padded
        to max_num_objects like the reference."""
        d = state.physics
        m = self.model
        active = self._active_mask()
        obj_pos = sim_lib.object_positions(self.idx, d)
        obj_quat = sim_lib.object_quats(self.idx, d)
        obj_vel = sim_lib.object_velocities(self.idx, d)
        mask = active[:, None].astype(self.dtype)
        tcp = arm_lib.tcp_xyz(self.robot.arm, d)
        dist = self.goal_gen.goal_distance(state.goal, d, active)
        return {
            "obj_pos": obj_pos * mask,
            "obj_rot": jax.vmap(rot.quat2euler)(obj_quat) * mask,
            "obj_vel_pos": obj_vel[:, 3:] * mask,
            "obj_vel_rot": obj_vel[:, :3] * mask,
            "goal_obj_pos": state.goal["obj_pos"] * mask,
            "goal_obj_rot": jax.vmap(rot.quat2euler)(state.goal["obj_rot"]) * mask,
            "rel_goal_obj_pos": (state.goal["obj_pos"] - obj_pos) * mask,
            "obj_gripper_contact": jnp.zeros(
                (self.max_num_objects, 2), self.dtype
            ),
            "gripper_pos": tcp,
            "gripper_velp": arm_lib.tcp_vel(self.robot.arm, m, d),
            "gripper_controls": d.ctrl[
                jnp.asarray(self.robot.gripper.actuator_id)
            ][None],
            "gripper_qpos": gripper_lib.joint_position(self.robot.gripper, d),
            "gripper_vel": gripper_lib.joint_velocity(self.robot.gripper, d),
            "qpos": d.qpos,
            "qpos_goal": d.qpos,
            "robot_joint_pos": arm_lib.joint_positions(self.robot.arm, d),
            "tcp_force": jnp.zeros(3, self.dtype),
            "tcp_torque": jnp.zeros(3, self.dtype),
            "safety_stop": jnp.zeros(1, self.dtype),
            "is_goal_achieved": jnp.zeros(1, self.dtype),
        }


def make_env(
    constants: Optional[dict] = None,
    parameters: Optional[dict] = None,
    dtype=jnp.float32,
) -> BlocksRearrangeEnv:
    """Factory mirroring the reference `make_env = RearrangeEnv.build`."""
    cst = RearrangeEnvConstants(**(constants or {}))
    par_kw = dict(parameters or {})
    sp = RearrangeSimParameters(**par_kw.pop("simulation_params", {}))
    rcp_kw = par_kw.pop("robot_control_params", None)
    if rcp_kw is None:
        rcp = composite_lib.RobotControlParameters(
            control_mode=composite_lib.ControlMode.JOINT,
            tcp_solver_mode=composite_lib.TcpSolverMode.MOCAP,
        )
    else:
        rcp = composite_lib.RobotControlParameters(**rcp_kw)
    par = RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    return BlocksRearrangeEnv(cst, par, dtype=dtype)
