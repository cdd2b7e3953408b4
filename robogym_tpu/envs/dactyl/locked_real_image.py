"""Dactyl locked-cube env with image-pool goals — the TPU analogue of the
reference's LockedRealImageGoal
(/root/reference/robogym/envs/dactyl/goals/locked_real_image.py:9-41).

The reference iterates through a sequence of goal images captured from the
REAL robot rig and loaded from an `.npz` (keys: "quats" + one image array
per camera in DEFAULT_CAMERA_NAMES), concatenating the per-camera images
per goal. No such captures exist in this repo, so the default pool is a
SIM STAND-IN: `goal_pool_size` goal quats are sampled up front and
pre-rendered with the analytic raycaster (render/raycast.py) from the same
three vision cameras, with the hand hidden — exactly the reference's
goal-image convention (observation/goal.py hide_robot). A reference-format
`.npz` can still be supplied via `goal_data_path` and is used verbatim.

Goal cadence matches the reference: goals are consumed SEQUENTIALLY from
the pool (goal_idx increments per goal, wrapping), not resampled randomly;
the pooled image is served on the RESET_GOAL cadence as `vision_goal`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.envs.dactyl import cube_env
from robogym_tpu.envs.dactyl.locked import LockedEnv, LockedEnvConstants
from robogym_tpu.mjcf.model import Data


@dataclasses.dataclass(frozen=True)
class LockedRealImageEnvConstants(LockedEnvConstants):
    goal_generation: str = "real_image"
    vision_observation_provider: str = "raycast"
    # reference-format npz of real captures; empty -> sim-rendered pool
    goal_data_path: str = ""
    goal_pool_size: int = 16


class LockedRealImageEnv(LockedEnv):
    """Locked env whose goals iterate a fixed (quat, image) pool."""

    def __init__(
        self,
        constants: Optional[LockedRealImageEnvConstants] = None,
        dtype=jnp.float32,
    ):
        cst = constants or LockedRealImageEnvConstants()
        super().__init__(cst, dtype=dtype)
        if cst.goal_data_path:
            data = np.load(cst.goal_data_path)
            quats = np.asarray(data["quats"], np.float64)
            from robogym_tpu.observation.dummy_vision import (
                DEFAULT_CAMERA_NAMES,
            )

            # (N, ncam, S, S, 3): reference concatenates per-camera images
            # along axis 0 per goal (locked_real_image.py:25-32)
            imgs = np.stack(
                [np.asarray(data[cam]) for cam in DEFAULT_CAMERA_NAMES],
                axis=1,
            )
        else:
            quats, imgs = self._render_sim_pool(cst.goal_pool_size)
        self.pool_quats = jnp.asarray(quats, self.dtype)
        self.pool_images = jnp.asarray(imgs)

        # serve the pooled image instead of re-rendering the goal pose
        if self.obs_stack is not None:
            from robogym_tpu.observation import common as obs_common

            def read_pool_goal(env, state):
                return {"vision_goal": state.goal["vision_goal"]}

            providers = dict(self.obs_stack.providers)
            providers["goal_vision"] = obs_common.ObservationProvider(
                name="goal_vision", read=read_pool_goal,
                sync_type=obs_common.SyncType.RESET_GOAL,
            )
            self.obs_stack = obs_common.ObservationStack(providers)

    def _render_sim_pool(self, n: int):
        """Pre-render n goal images with the raycaster (hand + target
        hidden, the goal-image convention)."""
        from robogym_tpu.observation import dummy_vision, vision as vision_lib
        from robogym_tpu.physics import step as physics_step

        cams = tuple(dummy_vision.DEFAULT_CAMERA_NAMES)
        size = self.constants.vision_image_size
        hide = vision_lib.robot_hidden_mask(
            self.model, ("target:", "robot0:")
        )
        keys = jax.random.split(jax.random.key(17), n)
        quats = jax.vmap(
            lambda k: cube_env.sample_parallel_goal_quat(k, self.dtype)
        )(keys)

        d0 = self._settled_data

        def render_one(q):
            qpos = d0.qpos.at[jnp.asarray(self.cube.cube_rot_qpos)].set(q)
            d = physics_step.fwd_position(self.model, d0.replace(qpos=qpos))
            return vision_lib.render_cameras(
                self.model, d, cams, size, geom_visible=hide
            )

        imgs = jax.jit(jax.vmap(render_one))(quats)
        return np.asarray(quats), np.asarray(imgs)

    def _next_goal(self, key: jax.Array, d: Data,
                   prev_goal=None) -> Dict[str, jax.Array]:
        n = self.pool_quats.shape[0]
        if prev_goal is None:
            idx = jnp.zeros((), jnp.int32)
        else:
            idx = (prev_goal["goal_idx"] + 1) % n
        return {
            "cube_quat": self.pool_quats[idx],
            "vision_goal": self.pool_images[idx],
            "goal_idx": idx,
        }


def make_env(constants: Optional[dict] = None, dtype=jnp.float32):
    cst = LockedRealImageEnvConstants(**(constants or {}))
    return LockedRealImageEnv(cst, dtype=dtype)
