"""Dummy vision providers (TPU build).

Re-implements /root/reference/robogym/observation/dummy_vision.py:11-53:
zero-filled image observations matching the configured cameras/image size —
the default "vision" pathway used when no renderer is attached (the
reference ships this as the default for locked-env vision configs,
envs/dactyl/common/cube_env.py:295-306).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from robogym_tpu.observation.common import ObservationProvider, SyncType

DEFAULT_CAMERA_NAMES = ["vision_cam_top", "vision_cam_right", "vision_cam_left"]


def zero_images(camera_names: Sequence[str], image_size: int, dtype=jnp.uint8):
    return jnp.zeros((len(camera_names), image_size, image_size, 3), dtype)


def make_dummy_vision_provider(
    camera_names: Sequence[str] = tuple(DEFAULT_CAMERA_NAMES),
    image_size: int = 200,
) -> ObservationProvider:
    """(dummy_vision.py:11-33 DummyVisionObservationProvider)."""
    return ObservationProvider(
        name="dummy_vision",
        read=lambda env, state: {"vision": zero_images(camera_names, image_size)},
        sync_type=SyncType.STEP,
    )


def make_dummy_goal_vision_provider(
    camera_names: Sequence[str] = tuple(DEFAULT_CAMERA_NAMES),
    image_size: int = 200,
) -> ObservationProvider:
    """(dummy_vision.py:36-53 DummyVisionGoalObservationProvider)."""
    return ObservationProvider(
        name="goal_dummy_vision",
        read=lambda env, state: {
            "vision_goal": zero_images(camera_names, image_size)
        },
        sync_type=SyncType.RESET_GOAL,
    )
