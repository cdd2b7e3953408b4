"""Rubik's-cube qpos manipulation (TPU build).

Pure-function re-implementation of the reference CubeManipulator
(/root/reference/robogym/envs/dactyl/common/cube_manipulator.py:61-413):
the perpendicular cube model parameterizes each of the 20 cubelets by a
(rotx, roty, rotz) euler hinge triple plus 6 face driver hinges; rotating a
face is qpos surgery — compose the face rotation into the euler triples of
the cubelets currently on that face and advance the driver.

All operations are batched over the 20 cubelets and jit/vmap-safe (used
inside reset scrambles and goal generation).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Model
from robogym_tpu.utils import rotation as rot

DRIVER_NAMES = [
    "cubelet:driver:neg_x", "cubelet:driver:pos_x",
    "cubelet:driver:neg_y", "cubelet:driver:pos_y",
    "cubelet:driver:neg_z", "cubelet:driver:pos_z",
]
# driver order above maps (axis, side): index = axis*2 + side, side 0=neg
DRIVER_COORDS = np.array(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
    np.float64,
)


def _cubelet_names():
    """20 cubelets (8 corners + 12 edges) in the reference naming scheme
    (cube_manipulator.py:97-141)."""
    out = []
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            for k in (-1, 0, 1):
                pieces = []
                for key, v in (("x", i), ("y", j), ("z", k)):
                    if v == -1:
                        pieces.append(f"neg_{key}")
                    elif v == 1:
                        pieces.append(f"pos_{key}")
                if len(pieces) > 1:
                    out.append(("_".join(pieces), np.array([i, j, k], np.float64)))
    return out


@dataclasses.dataclass(frozen=True)
class CubeletIndex:
    """Static tables binding a prefixed perpendicular cube to the Model."""

    prefix: str
    euler_qpos: np.ndarray     # (20, 3) qpos addresses (rotx, roty, rotz)
    coords: np.ndarray         # (20, 3) home coordinates in {-1,0,1}
    driver_qpos: np.ndarray    # (6,) qpos addresses, DRIVER_NAMES order

    @classmethod
    def build(cls, model: Model, prefix: str = "cube:") -> "CubeletIndex":
        c = model.const
        jn = c.names["joint"]

        def adr(name):
            return int(c.jnt_qposadr[jn[prefix + name]])

        euler_qpos, coords = [], []
        for name, xyz in _cubelet_names():
            euler_qpos.append([
                adr(f"cubelet:rotx:{name}"),
                adr(f"cubelet:roty:{name}"),
                adr(f"cubelet:rotz:{name}"),
            ])
            coords.append(xyz)
        driver_qpos = [adr(n) for n in DRIVER_NAMES]
        return cls(
            prefix=prefix,
            euler_qpos=np.asarray(euler_qpos, np.int32),
            coords=np.asarray(coords),
            driver_qpos=np.asarray(driver_qpos, np.int32),
        )


def cubelet_eulers(idx: CubeletIndex, qpos: jax.Array) -> jax.Array:
    return qpos[jnp.asarray(idx.euler_qpos)]                 # (20, 3)


def driver_angles(idx: CubeletIndex, qpos: jax.Array) -> jax.Array:
    return qpos[jnp.asarray(idx.driver_qpos)]                # (6,)


def rotate_face(
    idx: CubeletIndex, qpos: jax.Array, axis: jax.Array, side: jax.Array,
    angle: jax.Array,
) -> jax.Array:
    """Pure rotate_face (cube_manipulator.py:148-189). axis in {0,1,2},
    side in {0,1}, angle in radians; traced values allowed."""
    dtype = qpos.dtype
    angle = rot.normalize_angles(jnp.asarray(angle, dtype))
    sidesign = side.astype(dtype) * 2.0 - 1.0
    axis = jnp.asarray(axis, jnp.int32)

    eulers = cubelet_eulers(idx, qpos)                        # (20, 3)
    mtx = jax.vmap(rot.euler2mat)(eulers)                     # (20, 3, 3)
    coords = jnp.asarray(idx.coords, dtype)
    cur = jnp.einsum("cij,cj->ci", mtx, coords)               # (20, 3)
    selected = jnp.take_along_axis(cur, axis[None, None].repeat(20, 0), 1)[
        :, 0
    ] * sidesign > 0.5

    axis_vec = jax.nn.one_hot(axis, 3, dtype=dtype)
    face_euler = axis_vec * angle
    R = rot.euler2mat(face_euler)                             # (3, 3)
    combined = jnp.einsum("ij,cjk->cik", R, mtx)
    new_eulers = jax.vmap(rot.mat2euler)(combined)
    eulers_out = jnp.where(selected[:, None], new_eulers, eulers)
    qpos = qpos.at[jnp.asarray(idx.euler_qpos)].set(
        eulers_out.astype(dtype)
    )

    # driver: index = axis*2 + side
    didx = jnp.asarray(idx.driver_qpos)[axis * 2 + side]
    qpos = qpos.at[didx].add(angle)
    return qpos


def snap_cubelets(idx: CubeletIndex, qpos: jax.Array) -> jax.Array:
    """Round every cubelet rotation matrix to the nearest signed permutation
    matrix (cube_manipulator.py:404-413)."""
    eulers = cubelet_eulers(idx, qpos)
    mtx = jax.vmap(rot.euler2mat)(eulers)
    snapped = jnp.round(mtx)
    new_eulers = jax.vmap(rot.mat2euler)(snapped)
    return qpos.at[jnp.asarray(idx.euler_qpos)].set(
        new_eulers.astype(qpos.dtype)
    )


def soft_align_faces(idx: CubeletIndex, qpos: jax.Array) -> jax.Array:
    """Align all faces to the nearest straight angles
    (cube_manipulator.py:387-413). Applies each face's residual rotation in
    a fixed order (the reference orders by magnitude; for near-aligned
    states the result is identical), then snaps cubelet matrices."""
    dtype = qpos.dtype
    angles = driver_angles(idx, qpos)
    straight = rot.round_to_straight_angles(angles)
    diff = rot.normalize_angles(straight - angles)

    def body(i, q):
        axis = i // 2
        side = i % 2
        return rotate_face(idx, q, axis, side, diff[i])

    qpos = jax.lax.fori_loop(0, 6, body, qpos)
    return snap_cubelets(idx, qpos)


def scramble(
    idx: CubeletIndex, qpos: jax.Array, key: jax.Array, num_steps: int
) -> jax.Array:
    """Random +-90-degree face rotations (full_perpendicular.py scramble on
    reset, num_scramble_steps)."""

    def body(carry, k):
        q = carry
        k1, k2, k3 = jax.random.split(k, 3)
        axis = jax.random.randint(k1, (), 0, 3)
        side = jax.random.randint(k2, (), 0, 2)
        sign = jnp.where(jax.random.bernoulli(k3), 1.0, -1.0)
        q = rotate_face(idx, q, axis, side, sign * jnp.pi / 2)
        return q, ()

    qpos, _ = jax.lax.scan(
        body, qpos, jax.random.split(key, num_steps)
    )
    return snap_cubelets(idx, qpos)
