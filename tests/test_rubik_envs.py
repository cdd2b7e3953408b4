"""Rubik face/full perpendicular env tests.

Mirrors the reference tests (envs/dactyl/tests/test_locked.py style smoke +
cube_manipulator semantics checks from test_rubik_solvers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs.dactyl import cube_manipulator as manip
from robogym_tpu.utils import rotation as rot

SMALL = dict(
    mujoco_substeps=2, n_random_initial_steps=0, reset_initial_steps=2,
    max_pose_resets=1,
)


class _Shared:
    def __init__(self, make_env, extra=None):
        self.env = make_env(dict(SMALL, **(extra or {})), dtype=jnp.float64)
        self.reset = jax.jit(self.env.reset)
        self.step = jax.jit(self.env.step)

    def __getattr__(self, name):
        return getattr(self.env, name)


@pytest.fixture(scope="module")
def face_env():
    from robogym_tpu.envs.dactyl.face_perpendicular import make_env
    return _Shared(make_env)


@pytest.fixture(scope="module")
def full_env():
    from robogym_tpu.envs.dactyl.full_perpendicular import make_env
    return _Shared(make_env, dict(num_scramble_steps=6))


def test_face_env_smoke(face_env):
    state, obs = face_env.reset(jax.random.key(0))
    assert obs["cube_face_angle"].shape == (2,)
    assert obs["goal_face_angle"].shape == (2,)
    state, obs, reward, done, info = face_env.step(state, jnp.zeros(20))
    assert reward.shape == (3,)
    assert bool(jnp.isfinite(state.physics.qpos).all())


def test_face_goal_semantics(face_env):
    """Goals either flip the cube (straight faces) or rotate a face by 90
    degrees (goals/face_curriculum.py:59-132)."""
    state, _ = face_env.reset(jax.random.key(1))
    gf = np.asarray(state.goal["cube_face_angle"])
    straight = np.round(gf / (np.pi / 2)) * (np.pi / 2)
    np.testing.assert_allclose(gf, straight, atol=1e-5)
    gq = np.asarray(state.goal["cube_quat"])
    np.testing.assert_allclose(np.linalg.norm(gq), 1.0, atol=1e-6)


def test_full_env_smoke(full_env):
    state, obs = full_env.reset(jax.random.key(0))
    assert obs["cube_face_angle"].shape == (6,)
    state, obs, reward, done, info = full_env.step(state, jnp.zeros(20))
    assert bool(jnp.isfinite(state.physics.qpos).all())


def test_full_scramble_differs_by_seed(full_env):
    s1, o1 = full_env.reset(jax.random.key(2))
    s2, o2 = full_env.reset(jax.random.key(3))
    assert not np.allclose(np.asarray(o1["qpos"]), np.asarray(o2["qpos"]))


# ---- cube manipulator semantics ------------------------------------------


def test_rotate_face_four_turns_identity(full_env):
    """Four quarter turns of the same face return cubelets to identity
    (cube_manipulator.py rotate_face semantics)."""
    idx = full_env.cubelets
    q = full_env.env._settled_data.qpos
    q0 = manip.snap_cubelets(idx, q)
    qq = q0
    for _ in range(4):
        qq = manip.rotate_face(idx, qq, jnp.asarray(2), jnp.asarray(1),
                               jnp.asarray(jnp.pi / 2))
    e0 = np.asarray(manip.cubelet_eulers(idx, q0))
    e4 = np.asarray(manip.cubelet_eulers(idx, manip.snap_cubelets(idx, qq)))
    m0 = np.asarray(jax.vmap(rot.euler2mat)(jnp.asarray(e0)))
    m4 = np.asarray(jax.vmap(rot.euler2mat)(jnp.asarray(e4)))
    np.testing.assert_allclose(m0, m4, atol=1e-5)
    # driver advanced by 2*pi
    d4 = np.asarray(manip.driver_angles(idx, qq))
    assert d4[5] == pytest.approx(2 * np.pi, abs=1e-5)


def test_rotate_face_selects_nine_cubelets(full_env):
    """A face rotation moves exactly the 8 cubelets on that face (plus the
    driver; centers have no euler joints)."""
    idx = full_env.cubelets
    q0 = manip.snap_cubelets(idx, full_env.env._settled_data.qpos)
    q1 = manip.rotate_face(idx, q0, jnp.asarray(0), jnp.asarray(0),
                           jnp.asarray(jnp.pi / 2))
    e0 = np.asarray(manip.cubelet_eulers(idx, q0))
    e1 = np.asarray(manip.cubelet_eulers(idx, q1))
    moved = (~np.isclose(e0, e1, atol=1e-6)).any(axis=1)
    assert moved.sum() == 8
    # the moved cubelets are those with x == -1 home coords rotated... at
    # identity state: home coords x == -1
    assert (full_env.cubelets.coords[moved][:, 0] == -1).all()


def test_scramble_preserves_permutation(full_env):
    idx = full_env.cubelets
    q0 = manip.snap_cubelets(idx, full_env.env._settled_data.qpos)
    q1 = manip.scramble(idx, q0, jax.random.key(7), 12)
    eul = manip.cubelet_eulers(idx, q1)
    mats = np.asarray(jax.vmap(rot.euler2mat)(eul))
    # every cubelet matrix is a signed permutation (rows sum of abs == 1)
    np.testing.assert_allclose(np.abs(mats).sum(axis=2), 1.0, atol=1e-5)
    # the 20 cubelets occupy 20 distinct positions
    pos = np.einsum("cij,cj->ci", mats, full_env.cubelets.coords)
    pos_set = {tuple(np.round(p).astype(int)) for p in pos}
    assert len(pos_set) == 20


# ---- goal_generation switch parity (full_perpendicular.py:201-267) --------


def _mk_full(goal_generation, extra=None):
    from robogym_tpu.envs.dactyl.full_perpendicular import make_env

    return make_env(
        dict(SMALL, num_scramble_steps=4, goal_generation=goal_generation,
             **(extra or {})),
        dtype=jnp.float64,
    )


@pytest.mark.parametrize("mode", [
    "face_curr", "face_free", "full_unconstrained",
    "face_cube_solver", "unconstrained_cube_solver",
    "release_cube_solver", "fixed_fair_scramble",
])
def test_all_goal_generation_modes_construct_and_step(mode):
    """All 7 reference goal_generation values construct, reset, and step
    (reference build_goal_generation switch)."""
    env = _mk_full(mode)
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    assert set(state.goal.keys()) >= {
        "cube_quat", "cube_face_angle", "goal_type", "axis_nr", "axis_sign",
    }
    state, obs, reward, done, info = jax.jit(env.step)(state, jnp.zeros(20))
    assert bool(jnp.isfinite(reward).all())
    if mode in ("face_cube_solver", "unconstrained_cube_solver",
                "release_cube_solver"):
        # host-hop contract: plan not attached -> flagged, not silent
        assert bool(info["solver_plan_empty"])
    if mode == "fixed_fair_scramble":
        assert not bool(info["solver_plan_empty"])
        # plan is the fixed fair scramble (18 moves, 8 half-turns split)
        plan, length, _ = state.goal_aux
        assert int(length) == 26


def test_full_unconstrained_no_orientation_objective():
    """full_unconstrained: quat distance is identically zero
    (goals/full_unconstrained.py: no orientation objective)."""
    env = _mk_full("full_unconstrained")
    state, _ = jax.jit(env.reset)(jax.random.key(1))
    dist = env._goal_distance(state.goal, state.physics)
    assert float(dist["cube_quat"]) == 0.0


def test_face_free_rotation_distance_ignores_z():
    """face_free rotation goals measure only target-face-up distance: a pure
    z rotation of the cube leaves the distance unchanged
    (cube_utils.distance_quat_from_being_up)."""
    from robogym_tpu.envs.dactyl import cube_env

    q = rot.quat_from_angle_and_axis(
        jnp.asarray(0.3), jnp.asarray([1.0, 0.0, 0.0])
    )
    axis_nr, sign = cube_env.up_axis_with_sign(q)
    d0 = rot.quat_magnitude(cube_env.distance_quat_from_being_up(q, axis_nr, sign))
    zrot = rot.quat_from_angle_and_axis(
        jnp.asarray(1.1), jnp.asarray([0.0, 0.0, 1.0])
    )
    q2 = rot.quat_mul(zrot, q)
    d1 = rot.quat_magnitude(cube_env.distance_quat_from_being_up(q2, axis_nr, sign))
    np.testing.assert_allclose(float(d0), float(d1), atol=1e-6)


def test_solver_host_hop_attaches_plan(full_env):
    """goals_solver.solve_and_attach fills a real plan for a scrambled cube
    and the env then reports solver_plan_empty=False."""
    from robogym_tpu.envs.dactyl import goals_solver

    env = _mk_full("face_cube_solver")
    state, _ = jax.jit(env.reset)(jax.random.key(5))
    state = goals_solver.solve_and_attach(env, state)
    plan, length, step = state.goal_aux
    assert int(length) > 0
    state, obs, reward, done, info = jax.jit(env.step)(state, jnp.zeros(20))
    assert not bool(info["solver_plan_empty"])
    assert int(info["solver_plan_step"]) == 0


def test_face_damping_wrapper(full_env):
    """RandomizedFaceDampingWrapper scales exactly the 6 face-driver dofs
    (/root/reference/robogym/wrappers/face.py:4-9)."""
    from robogym_tpu.wrappers import RandomizedFaceDampingWrapper

    env = full_env.env
    t = RandomizedFaceDampingWrapper(env=env, damping_range=(2.0, 2.0))
    m2 = t.model(None, env.model, jax.random.key(0))
    d0 = np.asarray(env.model.dof_damping)
    d1 = np.asarray(m2.dof_damping)
    changed = np.nonzero(np.abs(d1 - d0) > 1e-12)[0]
    assert len(changed) == 6
    np.testing.assert_allclose(d1[changed], 2.0 * d0[changed], rtol=1e-6)


def test_perpendicular_cube_size_wrapper(full_env):
    """Cubelet geoms/body offsets scale by the sampled multiplier
    (/root/reference/robogym/wrappers/parametric.py:24-38)."""
    from robogym_tpu.wrappers import RandomizedPerpendicularCubeSizeWrapper

    env = full_env.env
    t = RandomizedPerpendicularCubeSizeWrapper(
        env=env, cube_size_range=(1.1, 1.1)
    )
    m2 = t.model(None, env.model, jax.random.key(0))
    gs0 = np.asarray(env.model.geom_size)[t.geom_ids]
    gs1 = np.asarray(m2.geom_size)[t.geom_ids]
    np.testing.assert_allclose(gs1, 1.1 * gs0, rtol=1e-6)
    bp0 = np.asarray(env.model.body_pos)[t.body_ids]
    bp1 = np.asarray(m2.body_pos)[t.body_ids]
    np.testing.assert_allclose(bp1, 1.1 * bp0, rtol=1e-6)
