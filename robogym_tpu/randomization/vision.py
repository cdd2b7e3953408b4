"""Camera + lighting domain randomization (vision DR).

Pure-function re-implementation of the reference's per-reset jitters
(/root/reference/robogym/envs/rearrange/common/base.py:637-730
`_randomize_camera` / `_randomize_lighting` and
simulation/base.py:774-801 `set_lighting` / `reset_camera`): instead of
mutating MjModel in place, it samples a `model_fields` dict
(envs/core.apply_model_fields) overriding the traced Model fields
`cam_pos/cam_quat/cam_fovy/light_pos/light_dir/headlight_*` inside the
jitted reset.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from robogym_tpu.mjcf.model import Model
from robogym_tpu.utils import rotation as rot


@dataclasses.dataclass(frozen=True)
class VisionRandomizationParams:
    """(rearrange/simulation/base.py:115-128 randomizable params, same
    defaults: all off until ADR/curriculum raises them)."""

    camera_fovy_radius: float = 0.0   # deg, uniform +-
    camera_pos_radius: float = 0.0    # m, on a sphere
    camera_quat_radius: float = 0.0   # rad, fixed angle, uniform axis
    light_pos_range: float = 0.0      # fraction of the valid position range
    light_diffuse_intensity: float = 0.4   # headlight diffuse (set, not sampled)
    light_ambient_intensity: float = 0.1   # headlight ambient

    def any_active(self) -> bool:
        return (
            self.camera_fovy_radius > 0 or self.camera_pos_radius > 0
            or self.camera_quat_radius > 0 or self.light_pos_range > 0
            or self.light_diffuse_intensity != 0.4
            or self.light_ambient_intensity != 0.1
        )


def sample_vision_fields(
    key: jax.Array, m: Model, p: VisionRandomizationParams
) -> dict:
    """model_fields dict jittering cameras and lights for one episode."""
    out = {}
    dtype = m.cam_pos.dtype if m.const.ncam else jnp.float32
    k_fovy, k_pos, k_axis, k_light = jax.random.split(key, 4)

    nc = m.const.ncam
    if nc:
        # fovy: uniform +- radius (base.py:647-650)
        fovy_delta = jax.random.uniform(
            k_fovy, (nc,), dtype, -1.0, 1.0
        ) * p.camera_fovy_radius
        out["cam_fovy"] = m.cam_fovy + fovy_delta

        # pos: point on the camera_pos_radius sphere (base.py:652-660)
        vec = jax.random.normal(k_pos, (nc, 3), dtype)
        vec = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 1e-12)
        out["cam_pos"] = m.cam_pos + vec * p.camera_pos_radius

        # quat: fixed-angle rotation about a uniformly random axis
        # (base.py:662-677: axis = uniform_quat * up)
        up = jnp.asarray([0.0, 1.0, 0.0], dtype)
        keys = jax.random.split(k_axis, nc)
        uq = jax.vmap(lambda k: rot.uniform_quat(k).astype(dtype))(keys)
        axis = jax.vmap(rot.quat_rot_vec)(uq, jnp.tile(up, (nc, 1)))
        qd = jax.vmap(
            lambda a: rot.quat_from_angle_and_axis(
                jnp.asarray(p.camera_quat_radius, dtype), a
            )
        )(axis)
        out["cam_quat"] = jax.vmap(rot.quat_mul)(m.cam_quat, qd)

    nl = m.const.nlight
    if nl:
        # lights stay 4 m from the origin; the reachable cap grows with
        # range_fraction (base.py:680-717)
        f = p.light_pos_range
        ks = jax.random.split(k_light, nl)

        def one(k):
            kx, ky, kz = jax.random.split(k, 3)
            ldt = m.light_pos.dtype
            x = jax.random.uniform(kx, (), ldt, -0.25 * f, 0.75 * f)
            y = f * jax.random.uniform(ky, (), ldt, -4.0, 4.0)
            z = jax.random.uniform(kz, (), ldt, 4.0 - 4.0 * f, 4.0)
            raw = jnp.stack([x, y, z])
            nrm = jnp.linalg.norm(raw) + 1e-12
            return raw / nrm * 4.0, -raw / nrm

        pos, dirs = jax.vmap(one)(ks)
        out["light_pos"] = pos
        out["light_dir"] = dirs

    # headlight intensities are SET to the (possibly ADR-driven) param
    # values, not sampled (base.py:719-730)
    out["headlight_diffuse"] = jnp.asarray(
        p.light_diffuse_intensity, dtype
    )
    out["headlight_ambient"] = jnp.asarray(
        p.light_ambient_intensity, dtype
    )
    return out
