"""Smoke-step every rearrange env flavor (the reference's highest-value test
tier: _list_rearrange_envs globs every env module and steps each,
/root/reference/robogym/envs/rearrange/tests/test_rearrange_envs.py:71-113)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SMALL_CST = dict(mujoco_substeps=2, stabilize_steps=1)
SMALL_PAR = dict(
    simulation_params=dict(num_objects=2, max_num_objects=2),
    robot_control_params=dict(control_mode="joint", tcp_solver_mode="mocap"),
)

FLAVORS = [
    "blocks",
    "blocks_train",
    "blocks_duplicate",
    "blocks_reach",
    "blocks_stack",
    "blocks_pickandplace",
    "ycb",
    "ycb_pickandplace",
    "composer",
]


@pytest.mark.parametrize("flavor", FLAVORS)
def test_rearrange_flavor_smoke(flavor):
    mod = importlib.import_module(f"robogym_tpu.envs.rearrange.{flavor}")
    kwargs = {}
    if flavor in ("ycb", "ycb_pickandplace", "composer"):
        kwargs["mesh_names"] = ["005_tomato_soup_can", "011_banana"]
    env = mod.make_env(dict(SMALL_CST), dict(SMALL_PAR), **kwargs)
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    assert "obj_pos" in obs and "tcp_force" in obs and "obj_colors" in obs
    step = jax.jit(env.step)
    for _ in range(2):
        state, obs, reward, done, info = step(
            state, jnp.zeros(env.action_size)
        )
    assert reward.shape == (3,)
    assert bool(jnp.isfinite(state.physics.qpos).all()), flavor
    for k, v in obs.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), (flavor, k)
    assert "env_crash" in info


def test_stack_goal_is_tower():
    from robogym_tpu.envs.rearrange import blocks_stack

    env = blocks_stack.make_env(dict(SMALL_CST), dict(SMALL_PAR))
    state, _ = jax.jit(env.reset)(jax.random.key(1))
    gp = np.asarray(state.goal["obj_pos"])[: env.num_objects]
    # same xy, increasing z
    np.testing.assert_allclose(gp[0, :2], gp[1, :2], atol=1e-6)
    assert abs(abs(gp[1, 2] - gp[0, 2]) - 2 * 0.0254) < 1e-5


def test_pickandplace_goal_in_air():
    from robogym_tpu.envs.rearrange import blocks_pickandplace

    env = blocks_pickandplace.make_env(dict(SMALL_CST), dict(SMALL_PAR))
    state, _ = jax.jit(env.reset)(jax.random.key(2))
    gp = np.asarray(state.goal["obj_pos"])
    _, _, table_h = env.idx.table_dimensions()
    assert gp[0, 2] > table_h + 0.05 - 0.01   # lifted by >= height_range[0]


def test_duplicate_single_color():
    from robogym_tpu.envs.rearrange import blocks_duplicate

    env = blocks_duplicate.make_env(dict(SMALL_CST), dict(SMALL_PAR))
    state, obs = jax.jit(env.reset)(jax.random.key(3))
    cols = np.asarray(obs["obj_colors"])[: env.num_objects]
    np.testing.assert_allclose(cols[0], cols[1], atol=1e-6)


def test_train_goal_distance_ratio():
    from robogym_tpu.envs.rearrange import blocks_train

    par = dict(SMALL_PAR)
    par["simulation_params"] = dict(
        num_objects=2, max_num_objects=2, goal_distance_ratio=0.0
    )
    env = blocks_train.make_env(dict(SMALL_CST, goal_generation="train"), par)
    state, obs = jax.jit(env.reset)(jax.random.key(4))
    # ratio 0 -> goals sit exactly at the current object positions
    cur = np.asarray(obs["obj_pos"])[: env.num_objects]
    gp = np.asarray(state.goal["obj_pos"])[: env.num_objects]
    np.testing.assert_allclose(cur, gp, atol=1e-5)


@pytest.mark.parametrize("flavor", [
    "table_setting", "dominos", "wordblocks", "chessboard",
])
def test_rearrange_flavor_smoke_round2(flavor):
    mod = importlib.import_module(f"robogym_tpu.envs.rearrange.{flavor}")
    par = dict(SMALL_PAR)
    if flavor in ("table_setting", "wordblocks", "chessboard"):
        par = dict(par)
        par.pop("simulation_params", None)  # these fix their own slot counts
    env = mod.make_env(dict(SMALL_CST), par)
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    step = jax.jit(env.step)
    for _ in range(3):
        state, obs, reward, done, info = step(
            state, jnp.zeros(env.action_size)
        )
    assert bool(jnp.isfinite(state.physics.qpos).all()), flavor
    assert np.isfinite(np.asarray(reward)).all()


@pytest.mark.parametrize("flavor", ["blocks_stack", "ycb"])
def test_flavor_smoke_default_control_mode(flavor):
    """Zoo flavors in the TRUE default control config — mocap_ik dual-sim
    TCP control with the force limiter, i.e. RobotControlParameters()
    untouched (only substeps/object counts are shrunk for wall-time)."""
    mod = importlib.import_module(f"robogym_tpu.envs.rearrange.{flavor}")
    kwargs = {}
    if flavor == "ycb":
        kwargs["mesh_names"] = ["005_tomato_soup_can", "011_banana"]
    env = mod.make_env(
        dict(SMALL_CST),
        dict(simulation_params=dict(num_objects=2, max_num_objects=2)),
        **kwargs,
    )
    rcp = env.parameters.robot_control_params
    assert rcp.tcp_solver_mode == "mocap_ik" and rcp.use_force_limiter
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    step = jax.jit(env.step)
    for _ in range(2):
        state, obs, reward, done, info = step(
            state, 0.1 * jnp.ones(env.action_size)
        )
    assert bool(jnp.isfinite(state.physics.qpos).all()), flavor
    for k, v in obs.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), (flavor, k)


def test_mixture_dataset_sampling():
    """Mixture env: candidate pool spans multiple object datasets and the
    envstate-dataset mixture drives per-reset mesh selection
    (reference mixture.py:17-60 + datasets/)."""
    from robogym_tpu.envs.rearrange import mixture

    obj_cfg = {
        "ycb": {
            "function":
                "robogym.envs.rearrange.datasets.objects.local_mesh:create",
            "args": {"mesh_dirname": "ycb"},
        },
    }
    ds_cfg = {
        "ycb_dataset": {
            "function":
                "robogym.envs.rearrange.datasets.envstates.random:create",
            "args": {"object_sample_prob": {"ycb": 1.0}},
        },
    }
    env = mixture.make_env(
        dict(SMALL_CST, object_config=obj_cfg, dataset_config=ds_cfg,
             dataset_sampling_config={"ycb_dataset": 1.0}),
        dict(SMALL_PAR),
    )
    assert env.bank.num_candidates > 10  # the whole ycb pool
    state, obs = jax.jit(env.reset)(jax.random.key(0))
    assert "mesh_convex_vert" in state.model_fields
    state, obs, reward, done, info = jax.jit(env.step)(
        state, jnp.zeros(env.action_size)
    )
    assert bool(jnp.isfinite(state.physics.qpos).all())


def test_table_setting_fixed_goal():
    from robogym_tpu.envs.rearrange import table_setting

    env = table_setting.make_env(dict(SMALL_CST), dict(
        robot_control_params=SMALL_PAR["robot_control_params"]))
    s1, _ = jax.jit(env.reset)(jax.random.key(0))
    s2, _ = jax.jit(env.reset)(jax.random.key(9))
    # fixed-state goals: identical across resets
    np.testing.assert_allclose(
        np.asarray(s1.goal["obj_pos"]), np.asarray(s2.goal["obj_pos"]),
        atol=1e-6,
    )


def test_dominos_arc_goal():
    from robogym_tpu.envs.rearrange import dominos

    env = dominos.make_env(
        dict(SMALL_CST, is_holdout=True),
        dict(SMALL_PAR, simulation_params=dict(num_objects=4,
                                               max_num_objects=4)),
    )
    state, _ = jax.jit(env.reset)(jax.random.key(1))
    gp = np.asarray(state.goal["obj_pos"])[:4]
    gq = np.asarray(state.goal["obj_rot"])[:4]
    # arc invariants: consecutive dominos uniformly spaced...
    seg = np.linalg.norm(np.diff(gp[:, :2], axis=0), axis=1)
    assert seg.std() / seg.mean() < 0.05, seg
    # ...with uniform heading increments (tangential orientation)
    from robogym_tpu.utils import rotation as rot
    import jax.numpy as jnp

    dq = [
        float(rot.quat_magnitude(rot.quat_normalize(rot.quat_difference(
            jnp.asarray(gq[i + 1]), jnp.asarray(gq[i])
        ))))
        for i in range(3)
    ]
    assert np.std(dq) < 0.05 and np.mean(dq) > 0.01, dq


def test_blocks_attached_goal_pattern():
    """Attached-blocks goal: every block's goal touches at least one other
    block (2*size spacing on a grid — goals/attached_block_state.py)."""
    from robogym_tpu.envs.rearrange import blocks_attached

    env = blocks_attached.make_env(
        dict(SMALL_CST),
        dict(SMALL_PAR, simulation_params=dict(num_objects=4,
                                               max_num_objects=4)),
    )
    state, _ = jax.jit(env.reset)(jax.random.key(0))
    gp = np.asarray(state.goal["obj_pos"])[:4]
    size = 0.0254
    # pairwise min distance == 2*size (attached), on a grid
    dmin = min(
        np.linalg.norm(gp[i, :2] - gp[j, :2])
        for i in range(4) for j in range(i + 1, 4)
    )
    assert abs(dmin - 2 * size) < 1e-5, dmin
    state, obs, reward, done, info = jax.jit(env.step)(
        state, jnp.zeros(env.action_size)
    )
    assert bool(jnp.isfinite(state.physics.qpos).all())
