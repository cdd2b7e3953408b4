"""f32 coverage for goal-generation math (VERDICT r4 #10).

The suite's conftest forces JAX_ENABLE_X64, so every goal/rot-distance/
placement assertion normally runs in f64 — while bench and the multichip
dryrun run f32, where silent precision issues (like the round-4 default
bf16-matmul surprise) live. These tests re-run the key numeric contracts
under `jax.enable_x64(False)` with f32-appropriate tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.utils import rotation as rot


@pytest.fixture(autouse=True)
def _f32():
    with jax.enable_x64(False):
        yield


def test_rotation_roundtrips_f32():
    rng = np.random.RandomState(0)
    for _ in range(20):
        e = rng.uniform(-np.pi, np.pi, 3).astype(np.float32)
        q = rot.euler2quat(jnp.asarray(e))
        assert q.dtype == jnp.float32
        m = rot.quat2mat(q)
        q2 = rot.mat2quat(m)
        d = float(rot.quat_magnitude(
            rot.quat_normalize(rot.quat_difference(q, q2))
        ))
        # f32 floor: the angle comes out of acos(w) with w ~ 1, whose
        # derivative is infinite at 1 — a 6e-8 ulp on w reads as
        # sqrt(2*eps) ~ 3e-4 rad. ~1e-3 is the genuine f32 contract
        # (measured 6.9e-4 max over 20 random orientations); rearrange
        # success thresholds are 0.2 rad, so this noise is 200x below use.
        assert d < 2e-3, d


def test_rot_distance_modes_f32():
    from robogym_tpu.envs.rearrange.goals import rot_distance

    rng = np.random.RandomState(1)
    # identical orientations -> 0 for every mode
    q = jnp.asarray(
        np.stack([np.asarray(rot.uniform_quat(jax.random.key(i))) for i in range(3)]), jnp.float32
    )
    for mode in ("full", "mod90", "mod180"):
        d = rot_distance(q, q, mode)
        assert d.dtype == jnp.float32
        # same acos-near-1 f32 floor as the roundtrip test
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=5e-3)
    # a 90-degree z rotation is invisible to mod90 but not to full
    qz = jax.vmap(rot.quat_mul)(
        q, jnp.broadcast_to(
            rot.euler2quat(jnp.asarray([0.0, 0, np.pi / 2], jnp.float32)),
            q.shape,
        )
    )
    d_full = np.asarray(rot_distance(q, qz, "full"))
    d_m90 = np.asarray(rot_distance(q, qz, "mod90"))
    assert (d_full > 1.0).all()
    np.testing.assert_allclose(d_m90, 0.0, atol=5e-3)


def test_icp_rotation_distance_f32():
    from robogym_tpu.utils.icp import icp_rotation_distance

    rng = np.random.RandomState(2)
    verts = jnp.asarray(rng.uniform(-0.03, 0.03, (40, 3)), jnp.float32)
    q1 = rot.uniform_quat(jax.random.key(7)).astype(jnp.float32)
    # small 0.2 rad z rotation: ICP should recover ~the residual angle
    dq = rot.euler2quat(jnp.asarray([0.0, 0, 0.2], jnp.float32))
    q2 = rot.quat_mul(dq, q1)
    d = float(icp_rotation_distance(verts, q1, q2))
    assert abs(d - 0.2) < 0.05, d
    d0 = float(icp_rotation_distance(verts, q1, q1))
    assert d0 < 1e-2, d0


def test_placement_sampling_f32():
    from robogym_tpu.envs.rearrange import simulation as sim_lib
    from robogym_tpu.envs.rearrange.goals import sample_goal_positions
    from robogym_tpu.envs.rearrange.blocks import make_env

    env = make_env(
        dict(mujoco_substeps=1),
        dict(simulation_params=dict(num_objects=3, max_num_objects=3)),
        dtype=jnp.float32,
    )
    size = jnp.full((3, 3), 0.0254, jnp.float32)
    active = jnp.ones(3, bool)
    pos, valid = jax.jit(
        lambda k: sample_goal_positions(k, env.idx, active, size, 3)
    )(jax.random.key(0))
    assert pos.dtype == jnp.float32
    assert bool(valid)
    p = np.asarray(pos)
    lo, hi = env.idx.placement_bounds(3)
    assert (p[:, 0] >= lo[0] - 1e-4).all() and (p[:, 0] <= hi[0] + 1e-4).all()
    # pairwise non-overlap in xy (half-extent sum 2*0.0254)
    for i in range(3):
        for j in range(i + 1, 3):
            assert np.abs(p[i, :2] - p[j, :2]).max() > 2 * 0.0254 - 1e-5
