"""Mesh/YCB rearrange tier tests (reference ycb.py:1-93 + common/mesh.py).

The TPU design swaps mesh identity per episode as model-field DATA instead
of recompiling the sim — these tests check the bank, the swap, and that the
env steps with mesh-mesh contacts live.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs.rearrange import mesh as mesh_lib


@pytest.fixture(scope="module")
def ycb_env():
    # 3 candidate meshes, 2 object slots, joint control for cheap stepping
    return mesh_lib.make_env(
        dict(mujoco_substeps=2, stabilize_steps=1),
        dict(
            simulation_params=dict(num_objects=2, max_num_objects=2),
            robot_control_params=dict(
                control_mode="joint", tcp_solver_mode="mocap"
            ),
        ),
        mesh_names=["005_tomato_soup_can", "011_banana", "004_sugar_box"],
    )


def test_bank_shapes(ycb_env):
    bank = ycb_env.bank
    assert bank.num_candidates == 3
    V = ycb_env.model.mesh_convex_vert.shape[1]
    assert bank.hull_vert.shape == (3, V, 3)
    # normalized: max half-extent == normalized_mesh_size
    for c in range(3):
        hv = np.asarray(bank.hull_vert[c])
        mk = np.asarray(bank.hull_mask[c]) > 0
        half = (hv[mk].max(0) - hv[mk].min(0)) / 2
        assert abs(half.max() - ycb_env.constants.normalized_mesh_size) < 1e-6
    assert np.all(np.asarray(bank.mass) > 0)
    assert np.all(np.asarray(bank.inertia) > 0)


def test_mesh_selection_is_model_data(ycb_env):
    """Different reset keys select different candidate hulls without any
    recompilation (the _recreate_sim replacement)."""
    env = ycb_env
    reset = jax.jit(env.reset)
    s1, _ = reset(jax.random.key(0))
    hulls = []
    for seed in range(6):
        s, _ = reset(jax.random.key(seed))
        hulls.append(np.asarray(
            s.model_fields["mesh_convex_vert"][env._slot_mesh_ids[0]]
        ))
    # at least two distinct hulls drawn across seeds
    distinct = {h.tobytes() for h in hulls}
    assert len(distinct) >= 2
    assert "body_mass" in s1.model_fields
    assert "geom_size" in s1.model_fields


def test_ycb_steps_with_contacts(ycb_env):
    env = ycb_env
    state, obs = jax.jit(env.reset)(jax.random.key(1))
    _, _, table_h = env.idx.table_dimensions()
    pos = np.asarray(obs["obj_pos"])[: env.num_objects]
    assert (pos[:, 2] > table_h - 0.01).all(), pos
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, reward, done, info = step(
            state, jnp.zeros(env.action_size)
        )
    assert bool(jnp.isfinite(state.physics.qpos).all())
    assert np.isfinite(np.asarray(reward)).all()
    # objects rest ON the table (mesh-table contact resolved, not sunk)
    pos = np.asarray(obs["obj_pos"])[: env.num_objects]
    assert (pos[:, 2] > table_h - 0.05).all(), pos


def test_ycb_determinism(ycb_env):
    env = ycb_env
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)

    def run():
        state, obs = reset(jax.random.key(9))
        for _ in range(2):
            state, obs, r, dn, info = step(
                state, jnp.full((env.action_size,), 0.2)
            )
        return obs

    o1, o2 = run(), run()
    for k in o1:
        np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]), err_msg=k)
