"""Property tests for robogym_tpu.utils.rotation.

Semantics baseline: /root/reference/robogym/utils/rotation.py (same
conventions: [w,x,y,z] quats, the reference's euler convention). Since the
reference stack (gym 0.15 / mujoco-py) is not importable here, parity is
checked via (a) hand-computed known values, (b) algebraic round trips, and
(c) cross-consistency between representations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.utils import rotation as rot


def random_eulers(n, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-np.pi, np.pi, size=(n, 3)))


def random_quats(n, seed=1):
    rng = np.random.RandomState(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.sign(q[:, :1] + (q[:, :1] == 0))
    return jnp.asarray(q)


def test_euler2mat_known_values():
    # Rotation by +90deg about z: the reference convention maps
    # euler [0,0,pi/2] to the matrix computed by its formula.
    m = rot.euler2mat(jnp.asarray([0.0, 0.0, np.pi / 2]))
    # From the reference formula (rotation.py:92-107) with ai=-pi/2, aj=ak=0:
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(m), expected, atol=1e-12)

    m = rot.euler2mat(jnp.asarray([np.pi / 2, 0.0, 0.0]))
    expected = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(m), expected, atol=1e-12)


def test_euler_mat_quat_consistency():
    e = random_eulers(256)
    m_direct = rot.euler2mat(e)
    m_via_quat = rot.quat2mat(rot.euler2quat(e))
    np.testing.assert_allclose(np.asarray(m_direct), np.asarray(m_via_quat), atol=1e-9)


def test_euler_roundtrip():
    # Stay away from gimbal lock.
    rng = np.random.RandomState(3)
    e = jnp.asarray(rng.uniform(-1.4, 1.4, size=(256, 3)))
    e2 = rot.mat2euler(rot.euler2mat(e))
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e), atol=1e-9)


def test_mat2quat_roundtrip():
    q = random_quats(512)
    q2 = rot.mat2quat(rot.quat2mat(q))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-7)


def test_quat_mul_matches_matmul():
    qa, qb = random_quats(64, 5), random_quats(64, 6)
    m = rot.quat2mat(rot.quat_mul(qa, qb))
    m2 = jnp.einsum("...ij,...jk->...ik", rot.quat2mat(qa), rot.quat2mat(qb))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-9)


def test_quat_rot_vec_matches_mat():
    q = random_quats(128, 7)
    rng = np.random.RandomState(8)
    v = jnp.asarray(rng.normal(size=(128, 3)))
    out = rot.quat_rot_vec(q, v)
    out2 = jnp.einsum("...ij,...j->...i", rot.quat2mat(q), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-9)


def test_quat_conjugate_inverse():
    q = random_quats(64, 9)
    ident = rot.quat_mul(q, rot.quat_conjugate(q))
    expected = np.tile(np.array([1.0, 0, 0, 0]), (64, 1))
    np.testing.assert_allclose(np.asarray(ident), expected, atol=1e-9)


def test_quat_magnitude_and_difference():
    q = rot.quat_from_angle_and_axis(
        jnp.asarray(0.3), jnp.asarray([0.0, 0.0, 1.0])
    )
    assert np.isclose(float(rot.quat_magnitude(q)), 0.3, atol=1e-9)
    p = rot.quat_identity()
    d = rot.quat_difference(q, p)
    assert np.isclose(float(rot.quat_magnitude(d)), 0.3, atol=1e-9)


def test_parallel_rotations():
    quats = rot.get_parallel_rotations()
    assert quats.shape == (24, 4)
    quats180 = rot.get_parallel_rotations_180()
    assert quats180.shape == (4, 4)


def test_uniform_quat_unit_norm():
    keys = jax.random.split(jax.random.key(0), 100)
    qs = jax.vmap(rot.uniform_quat)(keys)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(qs), axis=-1), 1.0, atol=1e-6
    )
    assert np.all(np.asarray(qs)[:, 0] >= 0)


def test_vectors2quat():
    rng = np.random.RandomState(11)
    v1 = rng.normal(size=(64, 3))
    v2 = rng.normal(size=(64, 3))
    v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
    v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
    q = rot.vectors2quat(jnp.asarray(v1), jnp.asarray(v2))
    rotated = rot.quat_rot_vec(q, jnp.asarray(v1))
    np.testing.assert_allclose(np.asarray(rotated), v2, atol=1e-6)


def test_vectors2quat_antiparallel():
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    q = rot.vectors2quat(v, -v)
    rotated = rot.quat_rot_vec(q, v)
    np.testing.assert_allclose(np.asarray(rotated), np.asarray(-v), atol=1e-6)


def test_normalize_angles():
    a = jnp.asarray([3 * np.pi, -3 * np.pi, 0.5])
    out = np.asarray(rot.normalize_angles(a))
    np.testing.assert_allclose(out, [-np.pi, -np.pi, 0.5], atol=1e-9)


def test_rot_z_aligned():
    q_z = rot.quat_from_angle_and_axis(jnp.asarray(0.7), jnp.asarray([0.0, 0.0, 1.0]))
    assert bool(rot.rot_z_aligned(q_z, 0.1))
    q_x = rot.quat_from_angle_and_axis(jnp.asarray(0.7), jnp.asarray([1.0, 0.0, 0.0]))
    assert not bool(rot.rot_z_aligned(q_x, 0.1))
    # x-flip plus z-rotation counts when include_flip
    q_flip = rot.quat_mul(
        q_z, rot.quat_from_angle_and_axis(jnp.asarray(np.pi), jnp.asarray([1.0, 0.0, 0.0]))
    )
    assert bool(rot.rot_z_aligned(q_flip, 0.1, include_flip=True))
    assert not bool(rot.rot_z_aligned(q_flip, 0.1, include_flip=False))


def test_rot_xyz_aligned():
    # Any 90-degree-aligned orientation should pass with small threshold.
    for q in rot.get_parallel_rotations()[:8]:
        assert bool(rot.rot_xyz_aligned(jnp.asarray(q), 0.05))
    q_tilt = rot.quat_from_angle_and_axis(
        jnp.asarray(0.5), jnp.asarray([1.0, 0.0, 0.0])
    )
    assert not bool(rot.rot_xyz_aligned(q_tilt, 0.05))


def test_quat_integrate():
    q0 = rot.quat_identity(jnp.float64)
    omega = jnp.asarray([0.0, 0.0, 1.0])
    q1 = rot.quat_integrate(q0, omega, 0.5)
    expected = rot.quat_from_angle_and_axis(jnp.asarray(0.5), omega)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(expected), atol=1e-9)


def test_jit_and_vmap():
    e = random_eulers(32)
    f = jax.jit(jax.vmap(lambda x: rot.quat2euler(rot.euler2quat(x))))
    out = f(e)
    assert out.shape == (32, 3)
