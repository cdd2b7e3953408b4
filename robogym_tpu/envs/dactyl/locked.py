"""Dactyl locked-cube flip environment (TPU build).

Functional re-implementation of the reference locked env
(/root/reference/robogym/envs/dactyl/locked.py): Shadow Hand reorients a
rigid textured cube to sampled axis-aligned ("parallel") orientation goals.

Reference semantics preserved:
- goal generation: LockedParallelGoal (goals/locked_parallel.py:32-80) —
  uniform z-aligned quat x random cube-group quat; distance =
  quat_magnitude(quat_difference(goal, cube)); success at 0.4 rad
  (locked.py:59 success_threshold).
- episode: 50 successes needed, 400 steps/goal timeout
  (common/cube_env.py:67-78), drop detection done+drop_reward
  (wrappers/cube.py:106 StopOnFallWrapper folded into the jitted step).
- reset: zero-ctrl settle, pose wiggle/uniform quat, random warmup steps,
  retry until on palm (locked.py:197-225, cube_env.py:330-355).

The whole env step (nsubsteps physics + goal bookkeeping) is one jitted pure
function; batch via vmap, shard via pjit (robogym_tpu.parallel).
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
from robogym_tpu.physics import step as physics
from robogym_tpu.robot import shadow_hand as hand
from robogym_tpu.utils import rotation as rot


@dataclasses.dataclass(frozen=True)
class LockedEnvConstants(cube_env.DactylCubeEnvConstants):
    """(locked.py:51-68)."""

    success_threshold_cube_quat: float = 0.4
    goal_generation: str = "state"
    # vision pathway: "" (off), "dummy_vision" (the reference's default for
    # locked configs, cube_env.py:295-306, observation/dummy_vision.py:11-53)
    # or "raycast" (real on-device rendered images, render/raycast.py — the
    # analogue of the locked real-image vision configs)
    vision_observation_provider: str = ""
    vision_image_size: int = 200
    # vision DR for the raycast path (same sampler as rearrange,
    # randomization/vision.py; the reference randomizes ORRB cameras/lights
    # equivalently for the dactyl vision configs)
    camera_fovy_radius: float = 0.0
    camera_pos_radius: float = 0.0
    camera_quat_radius: float = 0.0
    light_pos_range: float = 0.0
    light_diffuse_intensity: float = 0.4
    light_ambient_intensity: float = 0.1


class LockedEnv(cube_env.CubeEnvBase):
    """Pure-function locked-cube env. reset(key) / step(state, action)."""

    CUBE_XML = "rubik/rubik_locked.xml"

    def __init__(
        self,
        constants: Optional[LockedEnvConstants] = None,
        dtype=jnp.float32,
    ):
        super().__init__(constants or LockedEnvConstants(), dtype=dtype)
        self.obs_stack = None
        if self.constants.vision_observation_provider == "raycast":
            # real rendered images via render/raycast.py — the TPU analogue
            # of the reference's locked real-image vision configs
            from robogym_tpu.observation import common as obs_common
            from robogym_tpu.observation import dummy_vision
            from robogym_tpu.observation import vision as vision_lib

            cams = tuple(dummy_vision.DEFAULT_CAMERA_NAMES)
            size = self.constants.vision_image_size
            hide_tgt = vision_lib.robot_hidden_mask(self.model, ("target:",))
            hide_all = vision_lib.robot_hidden_mask(
                self.model, ("target:", "robot0:")
            )

            def read_vision(env, state):
                from robogym_tpu.envs import core as env_core

                m = env_core.apply_model_fields(env.model, state.model_fields)
                return {"vision": vision_lib.render_cameras(
                    m, state.physics, cams, size, geom_visible=hide_tgt
                )}

            def read_goal_vision(env, state):
                from robogym_tpu.envs import core as env_core
                from robogym_tpu.physics import step as phys

                m = env_core.apply_model_fields(env.model, state.model_fields)
                qpos = state.physics.qpos.at[
                    jnp.asarray(env.cube.cube_rot_qpos)
                ].set(state.goal["cube_quat"])
                d_goal = phys.fwd_position(
                    m, state.physics.replace(qpos=qpos)
                )
                return {"vision_goal": vision_lib.render_cameras(
                    m, d_goal, cams, size, geom_visible=hide_all
                )}

            self.obs_stack = obs_common.ObservationStack({
                "vision": obs_common.ObservationProvider(
                    name="vision", read=read_vision,
                    sync_type=obs_common.SyncType.STEP,
                ),
                "goal_vision": obs_common.ObservationProvider(
                    name="goal_vision", read=read_goal_vision,
                    sync_type=obs_common.SyncType.RESET_GOAL,
                ),
            })
        elif self.constants.vision_observation_provider == "dummy_vision":
            from robogym_tpu.observation import common as obs_common
            from robogym_tpu.observation import dummy_vision

            self.obs_stack = obs_common.ObservationStack({
                "dummy_vision": dummy_vision.make_dummy_vision_provider(
                    image_size=self.constants.vision_image_size
                ),
                "goal_dummy_vision":
                    dummy_vision.make_dummy_goal_vision_provider(
                        image_size=self.constants.vision_image_size
                    ),
            })

    # ------------------------------------------------------------------
    # goal generation (LockedParallelGoal)
    # ------------------------------------------------------------------

    def _next_goal(self, key: jax.Array, d: Data,
                   prev_goal=None) -> Dict[str, jax.Array]:
        goal_quat = cube_env.sample_parallel_goal_quat(key, self.dtype)
        return {"cube_quat": goal_quat}

    def _goal_distance(self, goal, d: Data) -> Dict[str, jax.Array]:
        rel = rot.quat_difference(goal["cube_quat"], cube_env.cube_quat(self.cube, d))
        return {"cube_quat": rot.quat_magnitude(rel)}

    @property
    def _thresholds(self) -> Dict[str, float]:
        return {"cube_quat": self.constants.success_threshold_cube_quat}

    # ------------------------------------------------------------------
    # env API
    # ------------------------------------------------------------------

    def _sample_vision_fields(self, key: jax.Array):
        """Per-episode camera/light jitter as model_fields (vision DR)."""
        cst = self.constants
        from robogym_tpu.randomization import vision as vision_rand

        p = vision_rand.VisionRandomizationParams(
            camera_fovy_radius=cst.camera_fovy_radius,
            camera_pos_radius=cst.camera_pos_radius,
            camera_quat_radius=cst.camera_quat_radius,
            light_pos_range=cst.light_pos_range,
            light_diffuse_intensity=cst.light_diffuse_intensity,
            light_ambient_intensity=cst.light_ambient_intensity,
        )
        if not (self.constants.vision_observation_provider
                and p.any_active()):
            return None
        return vision_rand.sample_vision_fields(key, self.model, p)

    def reset(self, key: jax.Array) -> Tuple[core.EnvState, Dict[str, jax.Array]]:
        k_phys, k_goal, k_pause, k_state, k_vis = jax.random.split(key, 5)
        d = self.reset_physics(k_phys)
        goal = self._next_goal(k_goal, d, prev_goal=None)
        tracker = core.TrackerState.zero().replace(
            success_steps_required=core.sample_success_steps_required(
                k_pause, self.constants
            )
        )
        goal_aux = jnp.zeros((), self.dtype)
        state = core.EnvState(
            physics=d,
            goal=goal,
            goal_aux=goal_aux,
            prev_goal_distance=self._goal_distance(goal, d),
            tracker=tracker,
            key=k_state,
            t=jnp.zeros((), jnp.int32),
            model_fields=self._sample_vision_fields(k_vis),
        )
        if self.obs_stack is not None:
            # RESET cadence: every provider runs; the cache rides in state
            from robogym_tpu.observation.common import SyncType

            cache = self.obs_stack.sync(self, state, None, SyncType.RESET)
            state = state.replace(goal_aux=(goal_aux, cache))
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
        successful = core.is_successful(dist, self._thresholds)

        tracker, success_reward, done, need_new_goal = core.tracker_process(
            state.tracker, cst, successful, jnp.zeros((), bool)
        )

        # StopOnFallWrapper (wrappers/cube.py:106-150): drop -> done + penalty
        env_reward = jnp.zeros((), self.dtype)
        if cst.stop_on_fall:
            fallen = ~cube_env.is_on_palm(self.cube, d)
            done = done | fallen
            env_reward = jnp.where(fallen, cst.drop_reward, 0.0).astype(self.dtype)

        key, k_goal, k_pause = jax.random.split(state.key, 3)

        def resample(_):
            goal = self._next_goal(k_goal, d, prev_goal=state.goal)
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
            lambda _: self._goal_distance(goal, d),
            lambda _: dist,
            None,
        )

        goal_aux = state.goal_aux
        if self.obs_stack is not None:
            # RESET_GOAL-cadence provider data refreshes only when the goal
            # resamples; otherwise the cached value carries forward
            # (reference SyncType staging, observation/common.py:8-33)
            from robogym_tpu.observation.common import SyncType

            inner_aux, cache = goal_aux
            # sync sees the POST-step state with the freshly resampled goal
            # (rendering the old goal here was invisible with dummy
            # providers but wrong for real goal images)
            synced_state = state.replace(physics=d, goal=goal)
            cache = jax.lax.cond(
                need_new_goal,
                lambda c: self.obs_stack.sync(
                    self, synced_state, c, SyncType.RESET_GOAL
                ),
                lambda c: {k: v for k, v in c.items()},
                cache,
            )
            goal_aux = (inner_aux, cache)
        new_state = core.EnvState(
            physics=d,
            goal=goal,
            goal_aux=goal_aux,
            prev_goal_distance=dist_after,
            tracker=tracker,
            key=key,
            t=state.t + 1,
            model_fields=state.model_fields,
        )
        reward = jnp.stack(
            [env_reward,
             goal_distance_reward.astype(self.dtype),
             success_reward.astype(self.dtype)]
        )
        done = done | crashed
        info = {
            "goal_dist": dist["cube_quat"],
            "is_successful": successful,
            "env_crash": crashed,
        }
        info.update(core.tracker_info(tracker, cst))
        return new_state, self._observe(new_state), reward, done, info

    def _observe(self, state: core.EnvState) -> Dict[str, jax.Array]:
        """Default observation map (locked.py:133-147)."""
        d = state.physics
        dist = self._goal_distance(state.goal, d)
        if self.constants.relative_fingertips:
            tips = cube_env.relative_fingertip_positions(self.hand, self.model, d)
        else:
            tips = hand.fingertip_positions(self.hand, d)
        obs = {
            "cube_pos": cube_env.cube_pos(self.cube, d),
            "cube_quat": cube_env.cube_quat(self.cube, d),
            "qpos": d.qpos,
            "qvel": d.qvel,
            "hand_angle": hand.joint_positions(self.hand, d),
            "fingertip_pos": tips,
            "goal_pos": jnp.zeros(3, self.dtype),
            "goal_quat": state.goal["cube_quat"],
            "is_goal_achieved": core.is_successful(dist, self._thresholds)[
                None
            ].astype(self.dtype),
        }
        if self.obs_stack is not None and isinstance(state.goal_aux, tuple):
            from robogym_tpu.observation.common import SyncType

            _, cache = state.goal_aux
            # STEP-cadence providers refresh at observe time; RESET/RESET_
            # GOAL values come from the staged cache (robot_env.py:273-301)
            for name, p in self.obs_stack.providers.items():
                data = (
                    p.read(self, state) if p.sync_type == SyncType.STEP
                    else cache[name]
                )
                obs.update(data)
        return obs


def make_env(
    constants: Optional[dict] = None, dtype=jnp.float32
) -> LockedEnv:
    """Factory mirroring the reference `make_env = LockedEnv.build`."""
    cst = LockedEnvConstants(**(constants or {}))
    return LockedEnv(cst, dtype=dtype)


make_simple_env = functools.partial(make_env)
