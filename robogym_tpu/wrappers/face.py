"""Rubik-face wrappers (/root/reference/robogym/wrappers/face.py)."""

from __future__ import annotations

from robogym_tpu.wrappers.randomizations import RandomizedDampingWrapper


class RandomizedFaceDampingWrapper(RandomizedDampingWrapper):
    """Per-episode loguniform damping on the cube's face driver joints
    (/root/reference/robogym/wrappers/face.py:4-9; reference joint set =
    env.face_joint_names with the cube prefix)."""

    def __init__(self, env=None, damping_range=(1 / 3.0, 3.0),
                 object_name="cube"):
        if hasattr(env, "face_joint_names"):
            names = [f"{object_name}:{n}" for n in env.face_joint_names]
        else:
            prefix = f"{object_name}:cubelet:driver:"
            names = [
                n for n in env.model.const.names["joint"]
                if n.startswith(prefix)
            ]
        super().__init__(env, damping_range, names)
