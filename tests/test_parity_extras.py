"""Parity tests for the small reference-inventory extras: the Modifier
registry (mujoco/modifiers), Shadow-Hand effort control + parameter manager
(mujoco_shadow_hand.py:139-156, parameter_manager.py:12-216), mesh
subdivision (utils/mesh.py:16-32), assert_dict_match (utils/testing.py), and
rearrange material sampling (common/utils.py:1023-1046 +
common/base.py:568-585)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.mjcf import mesh as mesh_lib
from robogym_tpu.mjcf import modifiers as modifiers_lib
from robogym_tpu.utils.testing import assert_dict_match


@pytest.fixture(scope="module")
def hand_env():
    from robogym_tpu.envs.dactyl.reach import make_env
    return make_env()


# ---------------------------------------------------------------- modifiers

def test_timestep_modifier(hand_env):
    m = hand_env.model
    m2 = modifiers_lib.TimestepModifier()(m, 0.004)
    assert float(m2.opt.timestep) == pytest.approx(0.004)
    assert float(m.opt.timestep) != pytest.approx(0.004)


def test_field_rows_modifier_and_apply(hand_env):
    m = hand_env.model
    name = next(iter(m.const.names["geom"]))
    gid = m.const.names["geom"][name]
    mods = [
        ("sim_timestep", modifiers_lib.TimestepModifier()),
        ("geom_scale",
         modifiers_lib.FieldRowsModifier("geom_size", "geom", [name])),
    ]
    m2 = modifiers_lib.apply_modifiers(
        m, mods, {"sim_timestep": 0.005, "geom_scale": 2.0}
    )
    np.testing.assert_allclose(
        np.asarray(m2.geom_size)[gid], 2.0 * np.asarray(m.geom_size)[gid]
    )
    assert float(m2.opt.timestep) == pytest.approx(0.005)
    # unknown parameter names are skipped
    m3 = modifiers_lib.apply_modifiers(m, mods, {"other": 1.0})
    assert float(m3.opt.timestep) == pytest.approx(float(m.opt.timestep))


# ------------------------------------------------------------ effort control

def test_effort_control_force_passthrough(hand_env):
    """In effort mode ctrl IS normalized force: actuator_force after one
    actuation equals control denormalized by forcerange
    (mujoco_shadow_hand.py:139-156)."""
    from robogym_tpu.mjcf.model import make_data
    from robogym_tpu.physics import step as phys
    from robogym_tpu.robot import shadow_hand as hand

    idx = hand.HandIndex.build(hand_env.model)
    m_eff = hand.effort_control_model(idx, hand_env.model)
    d = make_data(m_eff, dtype=jnp.float32)
    d = d.replace(qpos=hand_env.model.qpos0.astype(jnp.float32))
    control = jnp.asarray(np.linspace(-1.0, 1.0, len(idx.actuator_ids)),
                          jnp.float32)
    d = d.replace(ctrl=hand.set_effort_control(idx, m_eff, d, control))
    d = jax.jit(lambda dd: phys.step(m_eff, dd))(d)
    ids = np.asarray(idx.actuator_ids)
    expect = np.asarray(
        hand.denormalize_by_limit(
            control, m_eff.actuator_forcerange[jnp.asarray(ids)]
        )
    )
    got = np.asarray(d.actuator_force)[ids]
    np.testing.assert_allclose(got, expect, atol=1e-5)
    # observation channel normalizes back to the command
    eff = np.asarray(hand.actuator_effort(idx, m_eff, d))
    np.testing.assert_allclose(eff, np.asarray(control), atol=1e-5)


def test_denormalize_normalize_roundtrip():
    from robogym_tpu.robot import shadow_hand as hand
    limits = jnp.asarray([[-3.0, 5.0], [-1.0, 1.0], [-10.0, 2.0]])
    x = jnp.asarray([-0.7, 0.3, 0.9])
    f = hand.denormalize_by_limit(x, limits)
    np.testing.assert_allclose(np.asarray(f), [-2.1, 0.3, 1.8], atol=1e-6)
    back = hand.normalize_by_limits(f, limits)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


# --------------------------------------------------------- parameter manager

def test_parameter_manager_roundtrip(hand_env):
    from robogym_tpu.robot.parameter_manager import ShadowHandParameterManager

    pm = ShadowHandParameterManager(hand_env.model)
    for actuator in ("A_FFJ1", "A_WRJ1"):
        cur = pm.current_parameters(hand_env.model, actuator)
        # perturb every reported parameter and read it back
        new = {k: v * 1.5 + 0.01 for k, v in cur.items()}
        m2 = pm.set_parameters(hand_env.model, actuator, new)
        got = pm.current_parameters(m2, actuator)
        for k, v in new.items():
            assert got[k] == pytest.approx(v, rel=1e-5), (actuator, k)
        # original model untouched (pure update)
        again = pm.current_parameters(hand_env.model, actuator)
        assert_dict_match(again, cur, eps=1e-6)
        b = pm.parameter_bounds(m2, actuator)
        assert set(b.keys()) == set(got.keys())


def test_spring_tendon_names():
    from robogym_tpu.robot import parameter_manager as pmgr
    assert pmgr.spring_tendon_name("A_FFJ1") == "FFT2"
    assert not pmgr.has_spring_tendon("A_WRJ1")


# ------------------------------------------------------------------- meshes

def test_subdivide_mesh_shrinks_edges():
    # unit right triangle pair (a square)
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64
    )
    faces = np.asarray([[0, 1, 2], [0, 2, 3]])
    out = mesh_lib.subdivide_mesh(verts, faces, subdivide_threshold=0.3)
    assert len(out) > len(verts)
    # original vertices preserved
    for v in verts:
        assert np.min(np.linalg.norm(out - v, axis=1)) < 1e-12
    # all points still on the square
    assert np.all(out[:, 2] == 0)
    assert out.min() >= -1e-12 and out.max() <= 1 + 1e-12


def test_assert_dict_match():
    assert_dict_match({"a": 1.0, "b": {"c": np.ones(3)}},
                      {"a": 1.0 + 1e-10, "b": {"c": np.ones(3)}})
    with pytest.raises(AssertionError):
        assert_dict_match({"a": 1.0}, {"a": 2.0})
    with pytest.raises(AssertionError):
        assert_dict_match({"a": 1.0}, {"b": 1.0})


# ---------------------------------------------------------------- materials

def test_load_material_args():
    from robogym_tpu.envs.rearrange import materials as mat_lib
    names = mat_lib.load_all_materials()
    assert "painted_wood" in names and "default" in names
    args = mat_lib.load_material_args("painted_wood")
    assert args["geom"]["density"] == "720.0"
    tbl = mat_lib.MaterialTable(("painted_wood", "tangram"))
    np.testing.assert_allclose(tbl.density_ratio, [0.72, 1.25])
    np.testing.assert_allclose(tbl.friction[0], [0.85, 0.25, 0.001])
    # painted_wood inherits base.libsonnet's direct solref spec
    np.testing.assert_allclose(tbl.solref[0], [-4000.0, -200.0])


def test_blocks_material_randomization():
    from robogym_tpu.envs.rearrange.blocks import make_env

    env = make_env(
        dict(mujoco_substeps=2, stabilize_steps=1),
        dict(simulation_params=dict(num_objects=2, max_num_objects=2),
             material_names=("painted_wood", "tangram")),
    )
    state, _ = jax.jit(env.reset)(jax.random.key(3))
    fields = state.model_fields
    assert "geom_friction" in fields and "body_mass" in fields
    tbl = env._material_table
    fric = np.asarray(fields["geom_friction"])[
        np.asarray(env.idx.object_geom_ids)
    ]
    for row in fric:
        assert any(np.allclose(row, mrow) for mrow in tbl.friction), row
    # masses scaled by one of the density ratios
    base = np.asarray(env.model.body_mass)[np.asarray(env.idx.object_body_ids)]
    got = np.asarray(fields["body_mass"])[np.asarray(env.idx.object_body_ids)]
    ratio = got / base
    for r in ratio:
        assert any(np.isclose(r, dr) for dr in tbl.density_ratio), r
