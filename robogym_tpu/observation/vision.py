"""Raycast-rendered vision observation providers.

The TPU-native counterpart of the reference's MuJoCo-offscreen image
providers (robogym/envs/rearrange/observation/common.py:12-95 Mujoco[Goal]
ImageObservationProvider and robogym/observation/goal.py:46-82): images are
produced by render/raycast.py inside the jitted observe path, batched over
envs by the same vmap as the physics — no host GL round-trip.

Obs-key contract matches the reference rearrange base
(common/base.py:61-63): `vision_obs` (fixed cameras), `vision_obs_mobile`
(wrist camera), `vision_goal` (goal-state render with the robot hidden).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from robogym_tpu.observation.common import ObservationProvider, SyncType
from robogym_tpu.render import raycast


def render_cameras(m, d, camera_names: Sequence[str], image_size: int,
                   geom_visible=None):
    """(ncam, S, S, 3) uint8 stack, mirroring the reference's np.array of
    sim.render() calls (observation/common.py:30-43)."""
    return jnp.stack(
        [
            raycast.render_camera(m, d, name, image_size, geom_visible)
            for name in camera_names
        ]
    )


def robot_hidden_mask(m, robot_body_prefixes: Sequence[str] = ("robot0:",)):
    """(ngeom,) visibility mask hiding every geom on a robot body — the
    goal-image `hide_robot` semantics (observation/goal.py:66-82)."""
    names = m.const.names["body"]
    hidden_bodies = {
        bid for name, bid in names.items()
        if any(name.startswith(p) for p in robot_body_prefixes)
    }
    gb = np.asarray(m.const.geom_bodyid)
    vis = np.asarray([0.0 if int(b) in hidden_bodies else 1.0 for b in gb],
                     np.float32)
    return jnp.asarray(vis)


def make_vision_provider(
    camera_names: Sequence[str], image_size: int,
    key: str = "vision_obs",
) -> ObservationProvider:
    """STEP-cadence camera images of the live state."""

    def read(env, state):
        from robogym_tpu.envs import core as env_core

        m = env_core.apply_model_fields(env.model, state.model_fields)
        return {key: render_cameras(m, state.physics, camera_names,
                                    image_size)}

    return ObservationProvider(name=key, read=read, sync_type=SyncType.STEP)


def make_goal_vision_provider(
    camera_names: Sequence[str], image_size: int,
    goal_qpos_fn, hide_robot: bool = True,
    robot_body_prefixes: Sequence[str] = ("robot0:",),
    key: str = "vision_goal",
) -> ObservationProvider:
    """RESET_GOAL-cadence render of the goal state: qpos := goal qpos,
    forward kinematics, render with the robot hidden
    (MujocoGoalImageObservationProvider, observation/common.py:52-108)."""

    def read(env, state):
        from robogym_tpu.envs import core as env_core
        from robogym_tpu.physics import step as S

        m = env_core.apply_model_fields(env.model, state.model_fields)
        d_goal = state.physics.replace(qpos=goal_qpos_fn(env, state))
        d_goal = S.fwd_position(m, d_goal)
        vis = robot_hidden_mask(m, robot_body_prefixes) if hide_robot else None
        return {key: render_cameras(m, d_goal, camera_names, image_size,
                                    geom_visible=vis)}

    return ObservationProvider(
        name=key, read=read, sync_type=SyncType.RESET_GOAL
    )
