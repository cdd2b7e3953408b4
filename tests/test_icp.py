"""ICP rotation-distance mode (reference goals/object_state.py:142-170 +
utils/icp.py) — the mesh-goal `rot_dist_type="icp"` path."""

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import goals as goals_lib
from robogym_tpu.utils import icp as icp_lib
from robogym_tpu.utils import rotation as rot


def _cube_verts(dtype=jnp.float64):
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    ) * 0.03
    return jnp.asarray(corners, dtype)


def _lshape_verts(dtype=jnp.float64):
    """An asymmetric cloud: no nontrivial rotation maps it onto itself."""
    pts = np.array(
        [
            [0, 0, 0], [1, 0, 0], [2, 0, 0], [0, 1, 0], [0, 2, 0],
            [0, 0, 1], [1, 1, 0.5], [0.3, 1.7, 0.2],
        ],
        np.float64,
    ) * 0.02
    return jnp.asarray(pts, dtype)


def test_best_fit_transform_recovers_rotation():
    verts = _lshape_verts()
    q = rot.euler2quat(jnp.asarray([0.3, -0.2, 0.5], jnp.float64))
    R = rot.quat2mat(q)
    A = verts
    B = verts @ R.T + jnp.asarray([0.1, -0.05, 0.02])
    R_fit, t_fit = icp_lib.best_fit_transform(A, B)
    assert np.allclose(np.asarray(R_fit), np.asarray(R), atol=1e-8)
    B_fit = A @ R_fit.T + t_fit
    assert np.allclose(np.asarray(B_fit), np.asarray(B), atol=1e-8)


def test_icp_distance_small_angle():
    """For an asymmetric mesh, icp distance tracks the true rotation angle."""
    verts = _lshape_verts()
    angle = 0.15
    q1 = rot.euler2quat(jnp.zeros(3, jnp.float64))
    q2 = rot.euler2quat(jnp.asarray([0.0, 0.0, angle], jnp.float64))
    d = icp_lib.icp_rotation_distance(verts, q1, q2)
    assert abs(float(d) - angle) < 0.02, float(d)


def test_icp_distance_symmetric_mesh_mod90():
    """A cube rotated 90deg about z: full distance is pi/2 but ICP finds the
    symmetry-equivalent alignment -> ~0 (the point of the icp mode,
    goals/object_state.py:258-295)."""
    verts = _cube_verts()
    q1 = rot.euler2quat(jnp.zeros(3, jnp.float64))
    q2 = rot.euler2quat(jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float64))
    full = goals_lib.rot_distance(q1[None], q2[None], "full")
    assert abs(float(full[0]) - np.pi / 2) < 1e-6
    d = goals_lib.rot_distance(
        q1[None], q2[None], "icp", verts=verts[None]
    )
    assert float(d[0]) < 0.05, float(d[0])


def test_rot_distance_mod90_mod180():
    q1 = rot.euler2quat(jnp.zeros(3, jnp.float64))
    q90 = rot.euler2quat(jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float64))
    q180 = rot.euler2quat(jnp.asarray([0.0, 0.0, np.pi], jnp.float64))
    assert float(goals_lib.rot_distance(q1[None], q90[None], "mod90")[0]) < 1e-6
    assert float(goals_lib.rot_distance(q1[None], q180[None], "mod180")[0]) < 1e-6
    # mod180 does NOT forgive a 90-degree rotation
    assert float(
        goals_lib.rot_distance(q1[None], q90[None], "mod180")[0]
    ) > 0.5
