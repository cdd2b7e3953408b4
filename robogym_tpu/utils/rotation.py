"""Batched rotation math for TPU (JAX).

Re-implements the semantics of the reference rotation library
(/root/reference/robogym/utils/rotation.py:86-553) as pure, batched,
jit/vmap-friendly JAX functions.

Conventions (identical to the reference / MuJoCo):
  * Quaternions are [w, x, y, z].
  * Euler angles follow the reference's convention (the "rxyz"-derived
    formulas of rotation.py:86-128): `euler2mat`/`euler2quat`/`mat2euler`
    reproduce the exact component formulas so trajectories can be compared
    at 1e-5 tolerance against the numpy implementation.
  * All functions broadcast over leading batch dimensions.

Everything here is differentiable and free of data-dependent control flow,
so it traces into a single XLA computation (VPU element-wise work; no
gather/scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_FLOAT_EPS = float(np.finfo(np.float64).eps)
_EPS4 = _FLOAT_EPS * 4.0


def euler2mat(euler: jax.Array) -> jax.Array:
    """Euler angles -> rotation matrix (reference rotation.py:86-107)."""
    euler = jnp.asarray(euler)
    ai, aj, ak = -euler[..., 2], -euler[..., 1], -euler[..., 0]
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    row0 = jnp.stack([cj * ci, cj * si, -sj], axis=-1)
    row1 = jnp.stack([sj * cs - sc, sj * ss + cc, cj * sk], axis=-1)
    row2 = jnp.stack([sj * cc + ss, sj * sc - cs, cj * ck], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler2quat(euler: jax.Array) -> jax.Array:
    """Euler angles -> quaternion [w,x,y,z] (reference rotation.py:110-126)."""
    euler = jnp.asarray(euler)
    ai, aj, ak = euler[..., 2] / 2.0, -euler[..., 1] / 2.0, euler[..., 0] / 2.0
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    w = cj * cc + sj * ss
    x = cj * cs - sj * sc
    y = -(cj * ss + sj * cc)
    z = cj * sc - sj * cs
    return jnp.stack([w, x, y, z], axis=-1)


def mat2euler(mat: jax.Array) -> jax.Array:
    """Rotation matrix -> euler angles (reference rotation.py:129-148)."""
    mat = jnp.asarray(mat)
    cy = jnp.sqrt(mat[..., 2, 2] ** 2 + mat[..., 1, 2] ** 2)
    condition = cy > _EPS4
    e2 = jnp.where(
        condition,
        -jnp.arctan2(mat[..., 0, 1], mat[..., 0, 0]),
        -jnp.arctan2(-mat[..., 1, 0], mat[..., 1, 1]),
    )
    e1 = -jnp.arctan2(-mat[..., 0, 2], cy)
    e0 = jnp.where(
        condition, -jnp.arctan2(mat[..., 1, 2], mat[..., 2, 2]), 0.0
    )
    return jnp.stack([e0, e1, e2], axis=-1)


def quat2mat(quat: jax.Array) -> jax.Array:
    """Quaternion -> rotation matrix (reference rotation.py:202-225)."""
    quat = jnp.asarray(quat)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    nq = jnp.sum(quat * quat, axis=-1)
    s = 2.0 / jnp.where(nq > _FLOAT_EPS, nq, 1.0)
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    row0 = jnp.stack([1.0 - (yY + zZ), xY - wZ, xZ + wY], axis=-1)
    row1 = jnp.stack([xY + wZ, 1.0 - (xX + zZ), yZ - wX], axis=-1)
    row2 = jnp.stack([xZ - wY, yZ + wX, 1.0 - (xX + yY)], axis=-1)
    mat = jnp.stack([row0, row1, row2], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=mat.dtype), mat.shape)
    return jnp.where((nq > _FLOAT_EPS)[..., None, None], mat, eye)


def mat2quat(mat: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion, w >= 0 (reference rotation.py:151-185).

    Branch-free Shepperd's method (jnp.where-select over the four cases)
    instead of the reference's per-element eigendecomposition loop; yields
    the same quaternion up to the shared w>=0 sign convention.
    """
    mat = jnp.asarray(mat)
    m00, m01, m02 = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
    m10, m11, m12 = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
    m20, m21, m22 = mat[..., 2, 0], mat[..., 2, 1], mat[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate branches; each is safe to evaluate everywhere because the
    # sqrt argument is clamped positive.
    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-18))

    s0 = _safe_sqrt(tr + 1.0) * 2.0  # = 4w
    q0 = jnp.stack(
        [0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1
    )
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0  # = 4x
    q1 = jnp.stack(
        [(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1
    )
    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0  # = 4y
    q2 = jnp.stack(
        [(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1
    )
    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0  # = 4z
    q3 = jnp.stack(
        [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1
    )

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quat_normalize(q)


def quat2euler(quat: jax.Array) -> jax.Array:
    return mat2euler(quat2mat(quat))


def subtract_euler(e1: jax.Array, e2: jax.Array) -> jax.Array:
    q1 = euler2quat(e1)
    q2 = euler2quat(e2)
    return quat2euler(quat_mul(q1, quat_conjugate(q2)))


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(q0: jax.Array, q1: jax.Array) -> jax.Array:
    w0, x0, y0, z0 = q0[..., 0], q0[..., 1], q0[..., 2], q0[..., 3]
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w = w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1
    x = w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1
    y = w0 * y1 + y0 * w1 + z0 * x1 - x0 * z1
    z = w0 * z1 + z0 * w1 + x0 * y1 - y0 * x1
    return jnp.stack([w, x, y, z], axis=-1)


def quat_rot_vec(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q. Broadcasts over batch dims."""
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_difference(q: jax.Array, p: jax.Array) -> jax.Array:
    return quat_normalize(quat_mul(q, quat_conjugate(p)))


def quat_magnitude(q: jax.Array) -> jax.Array:
    w = q[..., 0]
    return 2.0 * jnp.arccos(jnp.clip(w, -1.0, 1.0))


def quat_normalize(q: jax.Array) -> jax.Array:
    """Flip sign so w >= 0 (reference rotation.py:281-287). NOT unit-norming."""
    sign = jnp.sign(q[..., :1])
    sign = jnp.where(sign == 0, 1.0, sign)
    return q * sign


def quat_unit(q: jax.Array) -> jax.Array:
    """Normalize to unit length (MuJoCo's mju_normalize4 analogue)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(n > 0, q / jnp.maximum(n, 1e-15), quat_identity(q.dtype))


def quat2axisangle(quat: jax.Array) -> jax.Array:
    """Quaternion -> axis * angle (reference rotation.py:310-320)."""
    theta = 2.0 * jnp.arccos(jnp.clip(quat[..., :1], -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - quat[..., :1] ** 2, 0.0))
    axis = quat[..., 1:] / jnp.where(sin_half < 1e-9, 1.0, sin_half)
    small = (jnp.abs(theta) < 1e-9) | (sin_half < 1e-9)
    return jnp.where(small, jnp.zeros_like(axis), axis * theta)


def quat_from_angle_and_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """(reference rotation.py:427-437)."""
    angle = jnp.asarray(angle)
    axis = jnp.asarray(axis)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle[..., None] / 2.0
    quat = jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)
    return quat_unit(quat)


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by angular velocity `omega` (local frame) over dt.

    Matches MuJoCo's mju_quatIntegrate: q' = q * exp(0.5 * omega * dt).
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True) * dt
    safe = jnp.where(angle < 1e-12, 1.0, jnp.linalg.norm(omega, axis=-1, keepdims=True))
    axis = omega / safe
    half = angle / 2.0
    dq = jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)
    dq = jnp.where(angle < 1e-12, quat_identity(q.dtype), dq)
    return quat_unit(quat_mul(q, dq))


def normalize_angles(angles: jax.Array, low=-np.pi, high=np.pi) -> jax.Array:
    """(reference rotation.py:372-378)."""
    angles = jnp.asarray(angles)
    return (angles - low) % (high - low) + low


def round_to_straight_angles(angles: jax.Array) -> jax.Array:
    """Round to nearest multiple of pi/2 (reference rotation.py:381-384)."""
    angles = jnp.round(angles / (jnp.pi / 2)) * (jnp.pi / 2)
    return normalize_angles(angles)


def round_to_straight_quat(quat: jax.Array) -> jax.Array:
    angles = round_to_straight_angles(quat2euler(quat))
    return euler2quat(angles)


def get_parallel_rotations() -> np.ndarray:
    """The 24 rotations mapping a cube onto itself, as quaternions.

    Host-side constant (reference rotation.py:393-407); returned as a
    (24, 4) float64 numpy array for embedding into Model constants.
    """
    return _unique_euler_quats([0, np.pi / 2, -np.pi / 2, np.pi], expect=24)


def get_parallel_rotations_180() -> np.ndarray:
    """Subset using only multiples of pi (reference rotation.py:410-424)."""
    return _unique_euler_quats([0, np.pi], expect=4)


def _np_euler2mat(euler: np.ndarray) -> np.ndarray:
    """Host-side euler->mat (XYZ extrinsic, same convention as euler2mat)."""
    ai, aj, ak = -euler[2], -euler[1], -euler[0]
    si, sj, sk = np.sin(ai), np.sin(aj), np.sin(ak)
    ci, cj, ck = np.cos(ai), np.cos(aj), np.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    mat = np.empty((3, 3))
    mat[0, 0] = cj * ck
    mat[0, 1] = sj * sc - cs
    mat[0, 2] = sj * cc + ss
    mat[1, 0] = cj * sk
    mat[1, 1] = sj * ss + cc
    mat[1, 2] = sj * cs - sc
    mat[2, 0] = -sj
    mat[2, 1] = cj * si
    mat[2, 2] = cj * ci
    return mat


def _np_mat2quat(mat: np.ndarray) -> np.ndarray:
    """Host-side mat->quat (Shepperd's method, matches mat2quat)."""
    Qxx, Qyx, Qzx = mat[0, 0], mat[0, 1], mat[0, 2]
    Qxy, Qyy, Qzy = mat[1, 0], mat[1, 1], mat[1, 2]
    Qxz, Qyz, Qzz = mat[2, 0], mat[2, 1], mat[2, 2]
    K = np.array([
        [Qxx - Qyy - Qzz, 0, 0, 0],
        [Qyx + Qxy, Qyy - Qxx - Qzz, 0, 0],
        [Qzx + Qxz, Qzy + Qyz, Qzz - Qxx - Qyy, 0],
        [Qyz - Qzy, Qzx - Qxz, Qxy - Qyx, Qxx + Qyy + Qzz],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


def _unique_euler_quats(vals, expect: int) -> np.ndarray:
    """Pure numpy: must not touch jnp — this runs at import time and eager
    jnp ops would initialize the (possibly remote) default backend."""
    quats: list = []
    for e1 in vals:
        for e2 in vals:
            for e3 in vals:
                euler = np.array([e1, e2, e3], dtype=np.float64)
                mat = _np_euler2mat(euler)
                q = _np_mat2quat(mat)
                q = np.where(np.abs(q) < 1e-9, 0.0, q)
                if q[np.argmax(np.abs(q))] < 0:
                    q = -q
                q /= np.linalg.norm(q)
                # q and -q are the same rotation: dedup up to sign.
                if not any(
                    np.allclose(q, e, atol=1e-7) or np.allclose(q, -e, atol=1e-7)
                    for e in quats
                ):
                    quats.append(q)
    out = np.array(quats)
    assert out.shape == (expect, 4), out.shape
    return out


def uniform_quat(key: jax.Array) -> jax.Array:
    """Uniform random unit quaternion (reference rotation.py:440-446)."""
    k1, k2, k3 = jax.random.split(key, 3)
    s = jax.random.uniform(k1)
    s1, s2 = jnp.sqrt(1.0 - s), jnp.sqrt(s)
    t1 = 2.0 * jnp.pi * jax.random.uniform(k2)
    t2 = 2.0 * jnp.pi * jax.random.uniform(k3)
    return quat_normalize(
        jnp.stack(
            [jnp.cos(t2) * s2, jnp.sin(t1) * s1, jnp.cos(t1) * s1, jnp.sin(t2) * s2]
        )
    )


def uniform_z_quat(key: jax.Array) -> jax.Array:
    """Random rotation around the z axis (cube_utils.uniform_z_aligned_quat)."""
    angle = jax.random.uniform(key, (), minval=-jnp.pi, maxval=jnp.pi)
    return quat_from_angle_and_axis(angle, jnp.asarray([0.0, 0.0, 1.0]))


def any_orthogonal(vec: jax.Array) -> jax.Array:
    """An arbitrary vector orthogonal to vec (reference rotation.py:461-466)."""
    v = jnp.asarray(vec)
    helper = jnp.where(
        jnp.abs(v[..., :1]) < 0.5,
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], v.dtype), v.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], v.dtype), v.shape),
    )
    orth = jnp.cross(v, helper)
    return orth / jnp.linalg.norm(orth, axis=-1, keepdims=True)


def vectors2quat(v_from: jax.Array, v_to: jax.Array) -> jax.Array:
    """Minimal rotation taking v_from to v_to (reference rotation.py:469-486)."""
    v_from = jnp.asarray(v_from)
    v_to = jnp.asarray(v_to)
    dot = jnp.sum(v_from * v_to, axis=-1, keepdims=True)
    w = jnp.sqrt(
        jnp.maximum(
            jnp.sum(v_from**2, axis=-1, keepdims=True)
            * jnp.sum(v_to**2, axis=-1, keepdims=True),
            0.0,
        )
    ) + dot
    xyz = jnp.cross(v_from, v_to)
    q = jnp.concatenate([w, xyz], axis=-1)
    # Antiparallel: rotate pi around any orthogonal axis.
    anti = (w <= 1e-9).squeeze(-1)
    orth = any_orthogonal(v_from)
    q_pi = jnp.concatenate([jnp.zeros_like(w), orth], axis=-1)
    q = jnp.where(anti[..., None], q_pi, q)
    return quat_normalize(quat_unit(q))


def rot_z_aligned(cube_quat: jax.Array, quat_threshold, include_flip: bool = True):
    """Is the cube within `quat_threshold` of a z-aligned orientation
    (reference rotation.py:489-515)."""
    cube_angles = quat2euler(cube_quat)
    target_angle = cube_angles * jnp.asarray([0.0, 0.0, 1.0], cube_angles.dtype)
    x_flip = jnp.asarray([jnp.pi, 0.0, 0.0], cube_angles.dtype)
    d0 = quat_magnitude(quat_difference(cube_quat, euler2quat(target_angle)))
    d1 = quat_magnitude(quat_difference(cube_quat, euler2quat(target_angle + x_flip)))
    ok = d0 < quat_threshold
    if include_flip:
        ok = ok | (d1 < quat_threshold)
    return ok


def rot_xyz_aligned(cube_quat: jax.Array, quat_threshold) -> jax.Array:
    """Is some local axis of the cube pointing straight up, within threshold
    (reference rotation.py:518-538)."""
    z_up = jnp.asarray([0.0, 0.0, 1.0])
    mtx = quat2mat(cube_quat)
    dots = jnp.einsum("...ij,j->...i", jnp.swapaxes(mtx, -1, -2), z_up)
    axis_nr = jnp.argmax(jnp.abs(dots), axis=-1)
    axis = jnp.take_along_axis(mtx, axis_nr[..., None, None], axis=-1)[..., 0]
    axis = axis * jnp.sign(jnp.sum(axis * z_up, axis=-1, keepdims=True))
    difference_quat = vectors2quat(axis, jnp.broadcast_to(z_up, axis.shape))
    return quat_magnitude(difference_quat) < quat_threshold


def random_unity2(key: jax.Array) -> jax.Array:
    """Uniform random 3D unit vector (reference rotation.py:541-553)."""
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (), minval=0.0, maxval=2.0 * jnp.pi)
    costheta = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta**2, 0.0))
    return jnp.stack([sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta])


def quat_average2(q1: jax.Array, q2: jax.Array, w1) -> jax.Array:
    """Weighted average of two unit quaternions (weights w1, 1-w1).

    Matches the reference's eigendecomposition-based `quat_average`
    (reference rotation.py:425-445) for the two-quaternion case: sign-align
    then normalized chordal mean, which equals the dominant eigenvector of
    the weighted outer-product sum for two quats.
    """
    q2 = jnp.where(jnp.dot(q1, q2) < 0, -q2, q2)
    avg = w1 * q1 + (1.0 - w1) * q2
    return quat_normalize(avg)
