"""Native two-phase solver tests (reference test analogue:
envs/dactyl/tests/test_rubik_solvers.py solver-sequence checks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robogym_tpu.utils import rubik_utils as R


@pytest.fixture(scope="module")
def lib():
    return R.get_library()


def test_selftest(lib):
    assert lib.rubik_selftest(5000, 123) == 0


def test_solved_is_zero_moves(lib):
    assert R.solve_fast(R.SOLVED_FACELETS) == ""


def test_random_scrambles_solve(lib):
    rng = np.random.RandomState(1)
    moves = ["U", "U'", "U2", "R", "R'", "R2", "F", "F'", "F2",
             "D", "D'", "D2", "L", "L'", "L2", "B", "B'", "B2"]
    for _ in range(5):
        scramble = " ".join(rng.choice(moves) for _ in range(30))
        scrambled = R.apply_moves(R.SOLVED_FACELETS, scramble)
        sol = R.solve_fast(scrambled)
        assert sol is not None
        assert len(sol.split()) <= 24
        assert R.apply_moves(scrambled, sol) == R.SOLVED_FACELETS


def test_cubelet_roundtrip():
    """Scramble the cubelet (euler-hinge) representation with the pure
    manipulator, convert to facelets, solve natively, and apply the solution
    back through the manipulator: the cube must return to identity."""
    from robogym_tpu.envs.dactyl import cube_manipulator as manip
    from robogym_tpu.utils import rotation as rot

    coords = np.asarray([c for _, c in manip._cubelet_names()])
    n = len(coords)
    # fake qpos layout: 20*3 eulers + 6 drivers
    idx = manip.CubeletIndex(
        prefix="cube:",
        euler_qpos=np.arange(n * 3, dtype=np.int32).reshape(n, 3),
        coords=coords,
        driver_qpos=np.arange(n * 3, n * 3 + 6, dtype=np.int32),
    )
    qpos = jnp.zeros(n * 3 + 6, jnp.float64)

    key = jax.random.key(3)
    qpos = manip.scramble(idx, qpos, key, 15)

    eul = manip.cubelet_eulers(idx, qpos)
    mats = np.asarray(jax.vmap(rot.euler2mat)(eul))
    facelets = R.cubelets_to_facelets(idx.coords, mats)
    assert len(facelets) == 54
    sol = R.solve_fast(facelets)
    assert sol is not None

    for axis, side, angle in R.moves_to_face_rotations(sol):
        qpos = manip.rotate_face(
            idx, qpos, jnp.asarray(axis), jnp.asarray(side), jnp.asarray(angle)
        )
    qpos = manip.snap_cubelets(idx, qpos)
    eul = manip.cubelet_eulers(idx, qpos)
    mats = np.asarray(jax.vmap(rot.euler2mat)(jnp.asarray(eul)))
    for m in mats:
        np.testing.assert_allclose(m, np.eye(3), atol=1e-6)
