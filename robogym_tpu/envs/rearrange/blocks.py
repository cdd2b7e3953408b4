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
from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import Data, make_data
from robogym_tpu.physics import step as physics
from robogym_tpu.robot import composite as composite_lib
from robogym_tpu.randomization import vision as vision_rand
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
    # goal generation: state | train | reach | det-reach | stack | pickandplace
    goal_generation: str = "state"
    # stack goal order (reference blocks_stack.py BlockStackEnvConstants)
    stack_fixed_order: bool = False
    # GoalArgs fields forwarded to the generator (common/base.py goal_args)
    goal_args: Tuple[Tuple[str, object], ...] = ()
    stabilize_objects: bool = True
    stabilize_steps: int = 5   # reference: 100 zero-ctrl settle steps
    # vision pathway (common/base.py:88-101 VisionArgs): raycast-rendered
    # camera observations (render/raycast.py). The reference's RESET_GOAL
    # cadence for goal images collapses into the jitted observe — the image
    # is a pure function of qpos_goal, so pixels are identical.
    # mask obs for objects / goals outside the placement area
    # (common/base.py:311-374, goal_args.mask_margin / soft_mask)
    mask_obs_outside_placement_area: bool = False
    vision: bool = False
    vision_image_size: int = 200
    vision_camera_names: Tuple[str, ...] = ("vision_cam_front",)
    vision_mobile_camera_names: Tuple[str, ...] = ("vision_cam_wrist",)
    goal_hide_robot: bool = True


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
    # vision DR (simulation/base.py:115-128; applied per reset as
    # model_fields, randomization/vision.py)
    camera_fovy_radius: float = 0.0
    camera_pos_radius: float = 0.0
    camera_quat_radius: float = 0.0
    light_pos_range: float = 0.0
    light_diffuse_intensity: float = 0.4
    light_ambient_intensity: float = 0.1


@dataclasses.dataclass(frozen=True)
class RearrangeEnvParameters:
    simulation_params: RearrangeSimParameters = dataclasses.field(
        default_factory=RearrangeSimParameters
    )
    robot_control_params: composite_lib.RobotControlParameters = (
        dataclasses.field(
            # reference default: tcp+roll+yaw control via mocap_ik dual-sim
            default_factory=composite_lib.RobotControlParameters
        )
    )
    n_random_initial_steps: int = 10
    # per-group material sampling (common/base.py:568-585): () disables;
    # ("all",) samples from every materials/*.jsonnet; otherwise the named
    # subset. Materials land as per-episode Model field rows (materials.py).
    material_names: Tuple[str, ...] = ()


class BlocksRearrangeEnv:
    """Pure-function rearrange blocks env: reset(key) / step(state, action)."""

    GOAL_CLASSES = {
        "state": goals_lib.ObjectStateGoal,
        "train": goals_lib.TrainStateGoal,
        "reach": goals_lib.ObjectReachGoal,
        "det-reach": goals_lib.DeterministicReachGoal,
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

        model, idx = self._compile_world(sp, rcp)
        self.model = model
        self.idx = idx
        self.robot = composite_lib.CompositeIndex.build(model, rcp)
        self.action_size = self.robot.action_size

        mat_names = self.parameters.material_names
        if mat_names:
            from robogym_tpu.envs.rearrange import materials as materials_lib
            if mat_names == ("all",):
                mat_names = tuple(materials_lib.load_all_materials())
            self._material_table = materials_lib.MaterialTable(mat_names)
        else:
            self._material_table = None

        # mocap_ik: second (solver) sim — joint-actuated main arm driven by
        # the mocap-weld solver arm's joint response, both inside one jitted
        # step (reference dual-sim: joint_controlled_tcp_arm.py:12-129)
        self._mocap_ik = rcp.requires_solver_sim()
        if self._mocap_ik:
            self.solver_model = sim_lib.compile_solver_world(
                rcp, self.constants.mujoco_timestep, dtype=dtype
            )
            self.solver_robot = composite_lib.CompositeIndex.build(
                self.solver_model, dataclasses.replace(
                    rcp, tcp_solver_mode=composite_lib.TcpSolverMode.MOCAP
                )
            )
            sd = make_data(self.solver_model, dtype=dtype)
            sd = sd.replace(qpos=sd.qpos.at[
                jnp.asarray(self.solver_robot.arm.joint_qpos_ids)
            ].set(jnp.asarray(arm_lib.TABLETOP_EXPERIMENT_INITIAL_POS, dtype)))
            sd = physics.fwd_position(self.solver_model, sd)
            sd = tcp_solver.reset_mocap_to_body(
                sd, self.solver_robot.arm.tcp_body_id
            )
            self._initial_solver_data = sd

        # per-goal timeout scales with object count (common/base.py:425-427)
        self.constants = dataclasses.replace(
            self.constants,
            max_timesteps_per_goal=(
                self.constants.max_timesteps_per_goal_per_obj * sp.num_objects
            ),
        )

        goal_cls = self.GOAL_CLASSES[self.constants.goal_generation]
        gargs = goals_lib.GoalArgs(**dict(self.constants.goal_args))
        goal_kw = dict(dtype=dtype, used_table_portion=sp.used_table_portion)
        if gargs.rot_dist_type == "icp":
            # box corner clouds for the icp rot-dist mode
            half = np.asarray(self._object_half_sizes_np())     # (O, 3)
            signs = np.array(
                [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                 for sz in (-1, 1)], np.float32,
            )
            goal_kw["icp_verts"] = half[:, None, :] * signs[None, :, :]
        gen = self.constants.goal_generation
        if gen == "stack":
            goal_kw["fixed_order"] = self.constants.stack_fixed_order
        if gen == "train":
            goal_kw["goal_distance_ratio"] = sp.goal_distance_ratio
        if gen in ("reach", "det-reach"):
            self.goal_gen = goal_cls(idx, self.robot.arm, gargs, **goal_kw)
        else:
            self.goal_gen = goal_cls(idx, gargs, **goal_kw)

        # goal stabilization runs in an objects-only scratch world: under
        # vmap the resample lax.cond lowers to select, so the settle
        # executes every step — shrinking its model (no arm dofs/pairs/
        # actuation) shrinks that standing cost ~10x. Mesh envs swap hull
        # banks per episode via model_fields, which a separately compiled
        # scratch world cannot see — they keep the full-model settle.
        self._settle_model = None
        self._settle_idx = None
        if self.goal_gen.args.stabilize_goal:
            from robogym_tpu.mjcf.model import GeomType

            obj_types = np.asarray(model.const.geom_type)[
                np.asarray(idx.object_geom_ids)
            ]
            if not np.any(obj_types == GeomType.MESH):
                sx = sim_lib.build_settle_world_xml(
                    model.const._source_xml
                )
                self._settle_model = compile_xml(sx, dtype=dtype)
                self._settle_idx = sim_lib.RearrangeIndex.build(
                    self._settle_model, sp.max_num_objects
                )
                self._settle_data = make_data(
                    self._settle_model, dtype=dtype
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
        if rcp.is_tcp_controlled() and not self._mocap_ik:
            # align the mocap weld target to the gripper before settling
            d0 = tcp_solver.reset_mocap_to_body(
                physics.fwd_position(model, d0), self.robot.arm.tcp_body_id
            )
        else:
            # hold arm at initial pose while settling (zero relative joint
            # action regardless of the runtime control mode's action dims)
            d0 = d0.replace(ctrl=composite_lib.set_position_control_joint(
                self.robot, model, d0, jnp.zeros(7, dtype),
                relative_action=True,
            ))
        settle = jax.jit(lambda d: physics.step_n(
            model, d, 5 * self.constants.mujoco_substeps))
        d0 = jax.block_until_ready(settle(d0))
        self._initial_data = d0.replace(time=jnp.zeros_like(d0.time))

    # ------------------------------------------------------------------
    def _compile_world(self, sp, rcp):
        """Subclass hook: compile the world Model + index (mesh envs build
        mesh-object slots here instead of blocks)."""
        model, idx = sim_lib.compile_blocks_world(
            sp.max_num_objects, sp.object_size, rcp,
            self.constants.mujoco_timestep, dtype=self.dtype,
        )
        return sim_lib.scale_contact_budgets(model, sp.max_num_objects), idx

    @property
    def num_objects(self) -> int:
        return self.parameters.simulation_params.num_objects

    @property
    def max_num_objects(self) -> int:
        return self.parameters.simulation_params.max_num_objects

    def _active_mask(self) -> jax.Array:
        return jnp.arange(self.max_num_objects) < self.num_objects

    def _object_half_sizes(self) -> jax.Array:
        return sim_lib.geom_bbox_half(self.model, self.idx.object_geom_ids)

    def _object_half_sizes_np(self) -> np.ndarray:
        return np.asarray(
            jax.device_get(self.model.geom_size)
        )[np.asarray(self.idx.object_geom_ids)]

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
    def _sample_object_groups(self, key: jax.Array):
        """Per-episode object-group partition + colors as data
        (common/base.py:498-601 _randomize_object_groups over
        common/utils.py:45-71 sample_group_counts: group sizes follow
        exponential decay with lam ~ U[1, 8); every object in a group gets
        the group's color). Returns (group_ids (O,), colors (O, 4))."""
        O = self.max_num_objects
        k_lam, k_cat, k_col = jax.random.split(key, 3)
        lam = jax.random.uniform(k_lam, (), self.dtype, 1.0, 8.0)
        sizes = jnp.arange(1, O + 1, dtype=self.dtype)
        cat_keys = jax.random.split(k_cat, O)

        def body(carry, k):
            gid, left, remaining = carry
            start_new = left == 0
            logits = -sizes * lam
            # keep >=1 finite entry: with no slots remaining the draw is
            # unused, but an all -inf categorical is undefined
            logits = jnp.where(
                jnp.arange(1, O + 1) <= jnp.maximum(remaining, 1),
                logits, -jnp.inf,
            )
            s = 1 + jax.random.categorical(k, logits)
            gid = jnp.where(start_new, gid + 1, gid)
            left = jnp.where(start_new, s, left)
            remaining = jnp.where(start_new, remaining - s, remaining)
            return (gid, left - 1, remaining), gid

        (_, _, _), group_ids = jax.lax.scan(
            body,
            (jnp.asarray(-1), jnp.asarray(0), jnp.asarray(self.num_objects)),
            cat_keys,
        )
        group_colors = jax.random.uniform(k_col, (O, 3), self.dtype)
        colors = jnp.concatenate(
            [group_colors, jnp.ones((O, 1), self.dtype)], axis=1
        )[jnp.clip(group_ids, 0, O - 1)]
        return group_ids, colors

    def _reset_model_fields(self, key: jax.Array):
        """Subclass hook for per-episode Model randomization (the TPU
        replacement for sim recreation, e.g. mesh-candidate selection in
        mesh.py). Returns (model_fields-or-None, object half sizes)."""
        k_grp, k_mat, k_vis = jax.random.split(key, 3)
        group_ids, colors = self._sample_object_groups(k_grp)
        fields = {
            "geom_rgba": self.model.geom_rgba.at[
                jnp.asarray(self.idx.object_geom_ids)
            ].set(colors)
        }
        sp = self.parameters.simulation_params
        vis_p = vision_rand.VisionRandomizationParams(
            camera_fovy_radius=sp.camera_fovy_radius,
            camera_pos_radius=sp.camera_pos_radius,
            camera_quat_radius=sp.camera_quat_radius,
            light_pos_range=sp.light_pos_range,
            light_diffuse_intensity=sp.light_diffuse_intensity,
            light_ambient_intensity=sp.light_ambient_intensity,
        )
        if vis_p.any_active():
            fields.update(
                vision_rand.sample_vision_fields(k_vis, self.model, vis_p)
            )
        if self._material_table is not None:
            # one material per GROUP (base.py:568-585), gathered per object
            tbl = self._material_table
            O = self.max_num_objects
            group_mat = jax.random.randint(k_mat, (O,), 0, len(tbl.names))
            mat_idx = group_mat[jnp.clip(group_ids, 0, O - 1)]
            fields.update(tbl.model_fields(
                self.model, self.idx.object_geom_ids,
                self.idx.object_body_ids, mat_idx,
            ))
        return fields, self._object_half_sizes(), group_ids

    def reset(self, key: jax.Array) -> Tuple[core.EnvState, Dict]:
        cst = self.constants
        sp = self.parameters.simulation_params
        k_place, k_rot, k_settle, k_goal, k_pause, k_state, k_model = (
            jax.random.split(key, 7)
        )
        active = self._active_mask()
        model_fields, sizes, group_ids = self._reset_model_fields(k_model)
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

        # stabilize objects (common/utils.py:76-94), under the per-episode
        # randomized model (mesh selection etc.)
        m = core.apply_model_fields(self.model, model_fields)
        if cst.stabilize_objects:
            d = physics.step_n(m, d, cst.stabilize_steps * cst.mujoco_substeps)
        else:
            d = physics.fwd_position(m, d)

        goal = self.goal_gen.next_goal(
            k_goal, active, sizes, self.num_objects, d
        )
        if self.goal_gen.args.stabilize_goal:
            goal = self._stabilize_goal(goal, m, d)
        goal = self._with_placement_info(goal, active, k_goal, group_ids)
        tracker = core.TrackerState.zero().replace(
            success_steps_required=core.sample_success_steps_required(
                k_pause, cst
            )
        )
        state = core.EnvState(
            physics=d,
            goal=goal,
            goal_aux=(
                self._initial_solver_data if self._mocap_ik
                else jnp.zeros((), self.dtype)
            ),
            prev_goal_distance=self.goal_gen.goal_distance(goal, d, active),
            tracker=tracker,
            key=k_state,
            t=jnp.zeros((), jnp.int32),
            model_fields=model_fields,
            robot_aux=self._initial_regrasp(d),
        )
        return state, self._observe(state)

    def _initial_regrasp(self, d):
        """Fresh gripper regrasp state when enabled
        (mujoco_robotiq_gripper.py:62-68 builds RegraspHelper at reset)."""
        if not self.parameters.robot_control_params.enable_gripper_regrasp:
            return None
        g = self.robot.gripper
        return gripper_lib.init_regrasp(
            d.qpos[g.joint_qpos_id], d.ctrl[g.actuator_id]
        )

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
        solver_d = state.goal_aux
        arm_action = action[:-1]
        if self._mocap_ik and rcp.use_force_limiter:
            # force-based TCP control limiter
            # (force_based_tcp_control_limiter.py:30-86): per-axis scaling
            # of the TCP command from the measured |F|/|T|
            from robogym_tpu.robot import tcp_force_limiter as limiter

            tcp_f, tcp_t = sim_lib.contact_wrench_on_geoms(
                self.idx.gripper_geom_ids,
                arm_lib.tcp_xyz(self.robot.arm, d), m, d,
            )
            ft6 = jnp.concatenate([jnp.abs(tcp_f), jnp.abs(tcp_t)])
            scales, _ = limiter.get_element_wise_tcp_control_limits(ft6)
            n_rot = self.action_size - 4  # xyz + rot dofs + gripper
            scale_vec = jnp.concatenate(
                [scales[:3], scales[3 : 3 + n_rot]]
            ).astype(arm_action.dtype)
            arm_action = arm_action * scale_vec
        if self._mocap_ik:
            # dual-sim mocap_ik (joint_controlled_tcp_arm.py:90-129 +
            # free_dof_tcp_arm.py:182-206): 1) sync solver arm to observed
            # main-sim joints and solver gripper to main gripper; 2) TCP
            # action drives the solver sim's mocap weld; 3) solver sim
            # steps the same substeps; 4) its joint response becomes the
            # main sim's PID position targets.
            sm = self.solver_model
            sarm = self.solver_robot.arm
            sgrip = self.solver_robot.gripper
            sq = solver_d.qpos
            if rcp.arm_reset_controller_error:
                # solver arm re-anchored to the observed main-sim joints
                # (joint_controlled_tcp_arm.py:92-95 sync gated on
                # robot_interface.py:66 arm_reset_controller_error)
                sq = sq.at[jnp.asarray(sarm.joint_qpos_ids)].set(
                    arm_lib.joint_positions(self.robot.arm, d)
                )
            sq = sq.at[sgrip.joint_qpos_id].set(
                d.qpos[self.robot.gripper.joint_qpos_id]
            )
            sctrl = solver_d.ctrl.at[sgrip.actuator_id].set(
                d.ctrl[self.robot.gripper.actuator_id]
            )
            solver_d = solver_d.replace(qpos=sq, ctrl=sctrl)
            solver_d = physics.fwd_position(sm, solver_d)
            solver_d = tcp_solver.tcp_set_position_control(
                sm, solver_d, sarm.tcp_body_id, arm_action,
                rcp.control_mode, rcp.default_max_position_change(),
            )
            solver_d = physics.step_n(sm, solver_d, cst.mujoco_substeps)
            # solver joint response -> main-sim PID targets
            target = arm_lib.joint_positions(sarm, solver_d)
            aids = jnp.asarray(self.robot.arm.actuator_ids)
            cr = m.actuator_ctrlrange[aids]
            ctrl = d.ctrl.at[aids].set(
                jnp.clip(target.astype(d.ctrl.dtype), cr[:, 0], cr[:, 1])
            )
            d = d.replace(ctrl=ctrl)
            ctrl = gripper_lib.denormalize_position_control(
                self.robot.gripper, m, d, action[-1:],
                relative_action=cst.relative_action,
            )
        elif rcp.is_tcp_controlled():
            # TCP mocap mode (free_dof_tcp_arm.py): arm action advances the
            # mocap weld target; gripper action is the last dim
            d = tcp_solver.tcp_set_position_control(
                m, d, self.robot.arm.tcp_body_id, arm_action,
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
        robot_aux = state.robot_aux
        if robot_aux is not None and cst.relative_action:
            # gripper regrasp override (mujoco_robotiq_gripper.py:142-172):
            # the denormalized gripper target already in `ctrl` is the
            # reference's `default_control`
            g = self.robot.gripper
            out, robot_aux = gripper_lib.compute_regrasp_control(
                robot_aux, action[-1], ctrl[g.actuator_id],
                d.qpos[g.joint_qpos_id],
            )
            ctrl = ctrl.at[g.actuator_id].set(out)
        d = d.replace(ctrl=ctrl)
        d = physics.step_n(m, d, cst.mujoco_substeps)
        d, crashed = core.divergence_guard(state.physics, d)

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
        # safety-stop penalty (common/base.py:793-794 + arm_interface.py:43-46)
        tcp_force, _ = sim_lib.contact_wrench_on_geoms(
            self.idx.gripper_geom_ids, arm_lib.tcp_xyz(self.robot.arm, d), m, d
        )
        in_safety_stop = (
            jnp.linalg.norm(tcp_force) > arm_lib.SAFETY_STOP_FORCE_THRESHOLD
        )
        env_reward = env_reward - jnp.where(
            in_safety_stop, sp.penalty_safety_stop, 0.0
        ).astype(self.dtype)

        key, k_goal, k_pause = jax.random.split(state.key, 3)
        sizes = sim_lib.geom_bbox_half(m, self.idx.object_geom_ids)

        def resample(_):
            goal = self.goal_gen.next_goal(
                k_goal, active, sizes, self.num_objects, d
            )
            if self.goal_gen.args.stabilize_goal:
                goal = self._stabilize_goal(goal, m, d)
            goal = self._with_placement_info(
                goal, active, k_goal, state.goal["group_ids"]
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
            physics=d, goal=goal,
            goal_aux=solver_d if self._mocap_ik else state.goal_aux,
            prev_goal_distance=dist_after, tracker=tracker, key=key,
            t=state.t + 1, model_fields=state.model_fields,
            robot_aux=robot_aux,
        )
        reward = jnp.stack([
            env_reward,
            goal_distance_reward.astype(self.dtype),
            success_reward.astype(self.dtype),
        ])
        done = done | crashed
        info = {
            "env_crash": crashed,
            "objects_off_table": off_table,
            "gripper_table_contact": table_contact,
            "is_successful": successful,
        }
        info.update(core.tracker_info(tracker, self.constants))
        return new_state, self._observe(new_state), reward, done, info

    def _stabilize_goal(
        self, goal: Dict[str, jax.Array], m, d: Data
    ) -> Dict[str, jax.Array]:
        """Physics-settle the goal poses so goals are statically achievable
        (goals/object_state.py:292-330 _stablize_goal_objects): teleport the
        objects to the sampled goal in a SCRATCH Data, run settle steps, and
        read the rested poses back as the goal. Enabled by
        goal_args.stabilize_goal (reference default: composer only —
        composer.py:25).

        Under vmap the goal-resample lax.cond lowers to select, so the
        settle executes every env step; to keep that standing cost small
        the settle runs in the objects-only scratch world compiled in
        __init__ (no arm dofs / collision pairs / actuators) whenever the
        objects are primitives. Mesh envs fall back to the full model."""
        n_sub = self.constants.stabilize_steps * self.constants.mujoco_substeps
        if self._settle_model is not None:
            sm, sidx = self._settle_model, self._settle_idx
            dg = sim_lib.set_object_poses(
                sidx, self._settle_data, goal["obj_pos"], goal["obj_rot"]
            )
            dg = physics.step_n(sm, dg, n_sub)
            goal = dict(goal)
            goal["obj_pos"] = sim_lib.object_positions(sidx, dg)
            goal["obj_rot"] = sim_lib.object_quats(sidx, dg)
            return goal
        dg = sim_lib.set_object_poses(
            self.idx, d, goal["obj_pos"], goal["obj_rot"]
        )
        dg = physics.step_n(m, dg, n_sub)
        goal = dict(goal)
        goal["obj_pos"] = sim_lib.object_positions(self.idx, dg)
        goal["obj_rot"] = sim_lib.object_quats(self.idx, dg)
        return goal

    def _with_placement_info(
        self, goal: Dict[str, jax.Array], active: jax.Array, key: jax.Array,
        group_ids: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """Attach goal_objects_in_placement_area / goal_in_placement_area
        (goals/object_state.py:376-405) and the episode's duplicate-object
        group partition (consumed by greedy goal matching,
        goals/object_state.py:520-560) to a freshly sampled goal."""
        gargs = self.goal_gen.args
        inside = sim_lib.in_placement_area(
            self.idx, goal["obj_pos"], self.num_objects,
            self.parameters.simulation_params.used_table_portion,
            margin=gargs.mask_margin, soft=gargs.soft_mask,
            key=jax.random.fold_in(key, 7), active_mask=active,
        )
        goal = dict(goal)
        goal["goal_objects_in_placement_area"] = inside
        goal["goal_in_placement_area"] = jnp.all(inside)
        if group_ids is not None:
            goal["group_ids"] = group_ids
        return goal

    def _observe(self, state: core.EnvState) -> Dict[str, jax.Array]:
        """Core subset of _observe_simple (common/base.py:376-421), padded
        to max_num_objects like the reference."""
        d = state.physics
        m = core.apply_model_fields(self.model, state.model_fields)
        active = self._active_mask()
        obj_pos = sim_lib.object_positions(self.idx, d)
        obj_quat = sim_lib.object_quats(self.idx, d)
        obj_vel = sim_lib.object_velocities(self.idx, d)
        mask = active[:, None].astype(self.dtype)
        tcp = arm_lib.tcp_xyz(self.robot.arm, d)
        dist = self.goal_gen.goal_distance(state.goal, d, active)
        rel_goal = self.goal_gen.relative_goal(state.goal, d, active)
        # wrist F/T readout + safety stop (joint_controlled_arm.py:79-85,
        # arm_interface.py:43-46)
        tcp_force, tcp_torque = sim_lib.contact_wrench_on_geoms(
            self.idx.gripper_geom_ids, tcp, m, d
        )
        safety_stop = (
            jnp.linalg.norm(tcp_force) > arm_lib.SAFETY_STOP_FORCE_THRESHOLD
        )
        goal_achieved = jnp.ones((), bool)
        for k, thr in self._thresholds.items():
            goal_achieved = goal_achieved & jnp.all(
                jnp.where(active, dist[k] < thr, True)
            )
        obs = {
            "obj_pos": obj_pos * mask,
            "obj_rel_pos": (obj_pos - tcp[None, :]) * mask,
            "obj_rot": jax.vmap(rot.quat2euler)(obj_quat) * mask,
            "obj_vel_pos": obj_vel[:, 3:] * mask,
            "obj_vel_rot": obj_vel[:, :3] * mask,
            "goal_obj_pos": state.goal["obj_pos"] * mask,
            "goal_obj_rot": jax.vmap(rot.quat2euler)(state.goal["obj_rot"]) * mask,
            "rel_goal_obj_pos": rel_goal["obj_pos"] * mask,
            "rel_goal_obj_rot": rel_goal["obj_rot"] * mask,
            "obj_colors": m.geom_rgba[
                jnp.asarray(self.idx.object_geom_ids)
            ] * mask,
            "obj_bbox_size": m.geom_size[
                jnp.asarray(self.idx.object_geom_ids)
            ] * mask,
            "obj_gripper_contact": (
                sim_lib.object_gripper_contact(self.idx, d).astype(self.dtype)
                * mask
            ),
            "gripper_pos": tcp,
            "gripper_velp": arm_lib.tcp_vel(self.robot.arm, m, d),
            "gripper_controls": d.ctrl[
                jnp.asarray(self.robot.gripper.actuator_id)
            ][None],
            "gripper_qpos": gripper_lib.joint_position(self.robot.gripper, d),
            "gripper_vel": gripper_lib.joint_velocity(self.robot.gripper, d),
            "qpos": d.qpos,
            "qpos_goal": sim_lib.goal_qpos(
                self.idx, d, state.goal["obj_pos"], state.goal["obj_rot"]
            ),
            "robot_joint_pos": arm_lib.joint_positions(self.robot.arm, d),
            "tcp_force": tcp_force.astype(self.dtype),
            "tcp_torque": tcp_torque.astype(self.dtype),
            "safety_stop": safety_stop.astype(self.dtype)[None],
            "is_goal_achieved": goal_achieved.astype(self.dtype)[None],
        }
        if self.constants.mask_obs_outside_placement_area:
            obs.update(self._masked_obs(state, obs, obj_pos, active))
        if self.constants.vision:
            obs.update(self._observe_vision(m, d, obs["qpos_goal"]))
        return obs

    def _masked_obs(
        self, state: core.EnvState, obs: Dict[str, jax.Array],
        obj_pos: jax.Array, active: jax.Array,
    ) -> Dict[str, jax.Array]:
        """masked_* / placement_mask obs for objects and goals outside the
        placement area (common/base.py:311-374 _mask_goal_observation +
        _mask_object_observation). Padding slots mask to 1.0 like the
        reference (simulation/base.py:894-897)."""
        gargs = self.goal_gen.args
        sp = self.parameters.simulation_params
        inside = sim_lib.in_placement_area(
            self.idx, obj_pos, self.num_objects, sp.used_table_portion,
            margin=gargs.mask_margin, soft=gargs.soft_mask,
            key=jax.random.fold_in(state.key, 13), active_mask=active,
        )
        pmask = inside.astype(self.dtype)[:, None]              # (O, 1)
        gmask = state.goal["goal_objects_in_placement_area"].astype(
            self.dtype
        )[:, None]
        out = {"placement_mask": pmask, "goal_placement_mask": gmask}
        for k in ("obj_pos", "obj_rot", "obj_rel_pos", "obj_vel_pos",
                  "obj_vel_rot", "obj_gripper_contact", "obj_bbox_size",
                  "obj_colors"):
            out[f"masked_{k}"] = obs[k] * pmask
        for k in ("goal_obj_pos", "goal_obj_rot", "rel_goal_obj_pos",
                  "rel_goal_obj_rot"):
            out[f"masked_{k}"] = obs[k] * gmask
        return out

    def _observe_vision(self, m, d, qpos_goal) -> Dict[str, jax.Array]:
        """vision_obs / vision_obs_mobile / vision_goal image observations
        (common/base.py:230-296 provider wiring, keys base.py:61-63)."""
        from robogym_tpu.observation import vision as vision_lib

        cst = self.constants
        size = cst.vision_image_size
        out = {
            "vision_obs": vision_lib.render_cameras(
                m, d, cst.vision_camera_names, size
            ),
            "vision_obs_mobile": vision_lib.render_cameras(
                m, d, cst.vision_mobile_camera_names, size
            ),
        }
        d_goal = d.replace(qpos=qpos_goal)
        d_goal = physics.fwd_position(m, d_goal)
        vis = (
            vision_lib.robot_hidden_mask(
                m, ("robot0:",) + tuple(self.idx.GRIPPER_BODIES)
            )
            if cst.goal_hide_robot else None
        )
        out["vision_goal"] = vision_lib.render_cameras(
            m, d_goal, cst.vision_camera_names, size, geom_visible=vis
        )
        return out


def make_env(
    constants: Optional[dict] = None,
    parameters: Optional[dict] = None,
    dtype=jnp.float32,
) -> BlocksRearrangeEnv:
    """Factory mirroring the reference `make_env = RearrangeEnv.build`."""
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = RearrangeEnvConstants(**cst_kw)
    par_kw = dict(parameters or {})
    sp = RearrangeSimParameters(**par_kw.pop("simulation_params", {}))
    rcp_kw = par_kw.pop("robot_control_params", None)
    if rcp_kw is None:
        # reference default: TCP control through the mocap_ik dual-sim
        # (robot_interface.py:33-128 defaults)
        rcp = composite_lib.RobotControlParameters()
    else:
        rcp = composite_lib.RobotControlParameters(**rcp_kw)
    par = RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    return BlocksRearrangeEnv(cst, par, dtype=dtype)
