"""Iterative closest point (TPU build).

Re-implements /root/reference/robogym/utils/icp.py:15-158 in pure JAX:
brute-force nearest neighbours (point sets are <=500 vertices,
goals/object_state.py:142) instead of sklearn KD-trees, SVD-based best-fit
rotation, fixed iteration count under jit. Used for the `icp` rotation
distance mode of mesh goals.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def best_fit_transform(A: jax.Array, B: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Least-squares rigid transform mapping A onto B (icp.py:15-58).
    Returns (R (3,3), t (3,))."""
    ca, cb = A.mean(axis=0), B.mean(axis=0)
    AA, BB = A - ca, B - cb
    H = AA.T @ BB
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, d], A.dtype))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    return R, t


def nearest_neighbor(src: jax.Array, dst: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Brute-force NN (replaces sklearn NearestNeighbors, icp.py:90-103)."""
    d2 = jnp.sum((src[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
    idx = jnp.argmin(d2, axis=-1)
    return jnp.sqrt(d2[jnp.arange(src.shape[0]), idx]), idx


def icp(
    A: jax.Array, B: jax.Array, max_iterations: int = 20
) -> Tuple[jax.Array, jax.Array]:
    """ICP aligning A to B (icp.py:106-158). Fixed iterations (jit-friendly;
    the reference's tolerance early-exit becomes a no-op improvement check).
    Returns (T (4,4) homogeneous transform, mean_error)."""
    dtype = A.dtype
    n = A.shape[0]
    src0 = jnp.concatenate([A, jnp.ones((n, 1), dtype)], axis=1)  # (n,4)

    def body(carry, _):
        src = carry
        dist, idx = nearest_neighbor(src[:, :3], B)
        R, t = best_fit_transform(src[:, :3], B[idx])
        T = jnp.eye(4, dtype=dtype).at[:3, :3].set(R).at[:3, 3].set(t)
        return src @ T.T, dist.mean()

    src, errs = jax.lax.scan(body, src0, None, length=max_iterations)
    R, t = best_fit_transform(A, src[:, :3])
    Tfull = jnp.eye(4, dtype=dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    return Tfull, errs[-1]


def icp_rotation_distance(
    verts: jax.Array, q1: jax.Array, q2: jax.Array, max_iterations: int = 20
) -> jax.Array:
    """Rotation distance between two orientations of the same vertex cloud
    via ICP residual rotation (goals/object_state.py icp rot_dist_type)."""
    from robogym_tpu.utils import rotation as rot

    A = verts @ rot.quat2mat(q1).T
    B = verts @ rot.quat2mat(q2).T
    T, _ = icp(A, B, max_iterations)
    resid = rot.mat2quat(T[:3, :3])
    return rot.quat_magnitude(rot.quat_normalize(resid))
