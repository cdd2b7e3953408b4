"""Shadow-hand fingertip reach environment (TPU build).

Functional re-implementation of the reference reach env
(/root/reference/robogym/envs/dactyl/reach.py): five fingertip position
targets, goals sampled in joint space around the previous goal and made
feasible by briefly stabilizing a goal configuration, success when all
fingertips are within 2.5 cm.

Everything (physics substeps, goal generation, tracker bookkeeping) lives in
one jitted step function; the env batch axis is added with `jax.vmap` /
sharded with pjit by the caller (see robogym_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import Data, Model, make_data
from robogym_tpu.mjcf.xml_tools import MjcfXML
from robogym_tpu.physics import step as physics
from robogym_tpu.robot import shadow_hand as hand


@dataclasses.dataclass(frozen=True)
class ReachEnvConstants(core.EnvConstants):
    """(reference reach.py:44-56)."""

    success_threshold: float = 0.025
    successes_needed: int = 50
    max_timesteps_per_goal: int = 150
    # reference stabilizes sampled goals with 2 goal-sim steps
    # (shadow_hand_reach_fingertip_pos.py:56-66); 0 = FK-only goals (fast path)
    goal_stabilize_steps: int = 2
    # success_pause_range set by reach._reset (reach.py:208-211)
    success_pause_range_s: Tuple[float, float] = (0.0, 0.5)


def build_reach_xml() -> MjcfXML:
    """World composition (reference reach.py:86-135)."""
    xml = MjcfXML()
    xml.add_default_compiler_directive()
    xml.append(
        MjcfXML.parse("floor/basic_floor.xml").set_named_objects_attr(
            "floor", tag="body", pos=[1, 1, 0]
        )
    )
    xml.append(MjcfXML.parse("shadowhand_reach/target.xml"))
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


class ReachEnv:
    """Pure-function env. Construct once (host), then jit/vmap reset & step."""

    def __init__(
        self,
        constants: Optional[ReachEnvConstants] = None,
        dtype=jnp.float32,
    ):
        self.constants = constants or ReachEnvConstants()
        self.dtype = dtype
        model = compile_xml(build_reach_xml(), dtype=dtype)
        model = model.replace(
            opt=model.opt.replace(
                timestep=jnp.asarray(self.constants.mujoco_timestep, dtype)
            )
        )
        self.model = model
        self.hand = hand.HandIndex.build(model)
        self.action_size = 20

        # initial settled state (reference ReachSimulation.build steps the sim
        # 20 env-steps with centered control before use, reach.py:128-135)
        d0 = make_data(model, dtype=dtype)
        ctrl0 = hand.denormalize_position_control(
            self.hand, model, d0, hand.zero_control().astype(dtype),
            relative_action=False,
        )
        d0 = d0.replace(ctrl=ctrl0)
        settle = jax.jit(
            lambda d: physics.step_n(model, d, 20 * self.constants.mujoco_substeps)
        )
        d0 = jax.block_until_ready(settle(d0))
        self._initial_data = d0.replace(time=jnp.zeros_like(d0.time))

    # ------------------------------------------------------------------
    # goal generation (FingertipPosGoal, shadow_hand_reach_fingertip_pos.py)
    # ------------------------------------------------------------------

    def _next_goal(
        self, key: jax.Array, goal_joint_pos: jax.Array, d: Data
    ) -> Tuple[Dict[str, jax.Array], jax.Array]:
        m = self.model
        jr = m.jnt_range[jnp.asarray(self.hand.joint_ids)]
        lo, hi = jr[:, 0], jr[:, 1]
        sample = goal_joint_pos + 0.1 * (hi - lo) * jax.random.normal(
            key, (24,), dtype=lo.dtype
        )
        sample = jnp.clip(sample, lo, hi)

        # goal sim: set qpos, stabilize a couple of steps holding position
        dg = self._initial_data.replace(
            qpos=self._initial_data.qpos.at[
                jnp.asarray(self.hand.joint_qpos_ids)
            ].set(sample)
        )
        if self.constants.goal_stabilize_steps > 0:
            ctrl = hand.denormalize_position_control(
                self.hand, m, dg, jnp.zeros(20, lo.dtype), relative_action=True,
            )
            dg = dg.replace(ctrl=ctrl)
            dg = physics.step_n(
                m, dg, self.constants.goal_stabilize_steps * self.constants.mujoco_substeps
            )
        else:
            dg = physics.fwd_position(m, dg)

        goal = {"fingertip_pos": hand.fingertip_positions(self.hand, dg)}
        new_goal_joint_pos = hand.joint_positions(self.hand, dg)
        return goal, new_goal_joint_pos

    def _goal_distance(self, goal, d: Data) -> Dict[str, jax.Array]:
        cur = hand.fingertip_positions(self.hand, d)
        return {
            "fingertip_pos": jnp.linalg.norm(goal["fingertip_pos"] - cur)
        }

    # ------------------------------------------------------------------
    # env API
    # ------------------------------------------------------------------

    def reset(self, key: jax.Array) -> Tuple[core.EnvState, Dict[str, jax.Array]]:
        k_goal, k_pause, k_state = jax.random.split(key, 3)
        d = physics.fwd_position(self.model, self._initial_data)
        goal_joint_pos0 = hand.joint_positions(self.hand, d)
        goal, gjp = self._next_goal(k_goal, goal_joint_pos0, d)
        tracker = core.TrackerState.zero().replace(
            success_steps_required=core.sample_success_steps_required(
                k_pause, self.constants
            )
        )
        state = core.EnvState(
            physics=d,
            goal=goal,
            goal_aux=gjp,
            prev_goal_distance=self._goal_distance(goal, d),
            tracker=tracker,
            key=k_state,
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._observe(state)

    def step(
        self, state: core.EnvState, action: jax.Array
    ) -> Tuple[core.EnvState, Dict[str, jax.Array], jax.Array, jax.Array, Dict]:
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
        successful = core.is_successful(
            dist, {"fingertip_pos": cst.success_threshold}
        )

        tracker, success_reward, done, need_new_goal = core.tracker_process(
            state.tracker, cst, successful, jnp.zeros((), bool)
        )

        key, k_goal, k_pause = jax.random.split(state.key, 3)

        def resample(_):
            goal, gjp = self._next_goal(k_goal, state.goal_aux, d)
            req = core.sample_success_steps_required(k_pause, cst)
            return goal, gjp, req

        def keep(_):
            return state.goal, state.goal_aux, tracker.success_steps_required

        goal, gjp, succ_req = jax.lax.cond(need_new_goal, resample, keep, None)
        tracker = tracker.replace(
            success_steps_required=succ_req,
            consecutive_successes=jnp.where(
                need_new_goal, 0, tracker.consecutive_successes
            ),
        )
        dist_after = jax.lax.cond(
            need_new_goal,
            lambda _: self._goal_distance(goal, d),
            lambda _: dist,
            None,
        )

        new_state = core.EnvState(
            physics=d,
            goal=goal,
            goal_aux=gjp,
            prev_goal_distance=dist_after,
            tracker=tracker,
            key=key,
            t=state.t + 1,
            model_fields=state.model_fields,
        )
        reward = jnp.stack(
            [jnp.zeros((), self.dtype),
             goal_distance_reward.astype(self.dtype),
             success_reward.astype(self.dtype)]
        )
        done = done | crashed
        info = {
            "env_crash": crashed,
            "goal_dist": dist["fingertip_pos"],
            "is_successful": successful,
        }
        info.update(core.tracker_info(tracker, cst))
        return new_state, self._observe(new_state), reward, done, info

    def _observe(self, state: core.EnvState) -> Dict[str, jax.Array]:
        """Default observation map (reference reach.py:160-171)."""
        d = state.physics
        dist = self._goal_distance(state.goal, d)
        return {
            "qpos": hand.joint_positions(self.hand, d),
            "qvel": hand.joint_velocities(self.hand, d),
            "fingertip_pos": hand.fingertip_positions(self.hand, d),
            "goal_fingertip_pos": state.goal["fingertip_pos"],
            "is_goal_achieved": core.is_successful(
                dist, {"fingertip_pos": self.constants.success_threshold}
            )[None].astype(self.dtype),
        }


def make_env(constants: Optional[dict] = None, dtype=jnp.float32) -> ReachEnv:
    """Factory mirroring the reference `make_env = ReachEnv.build`."""
    cst = ReachEnvConstants(**(constants or {}))
    return ReachEnv(cst, dtype=dtype)


make_simple_env = functools.partial(make_env)
