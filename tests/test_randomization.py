"""Randomization framework tests.

Mirrors the reference tests
(/root/reference/robogym/randomization/tests/test_randomization.py and
test_sim_randomization.py): parameter registry + path addressing, chaining,
sim randomizer application semantics (distribution direction, id selection),
and the ADR dataclass-parameter round trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.randomization.core import ChainedRandomizer, EnvRandomization, Randomizer
from robogym_tpu.randomization.env import (
    EnvParameterRandomizer,
    build_env_randomization,
    enumerate_randomizable_params,
    randomizable,
)
from robogym_tpu.randomization.parameters import (
    FloatRandomizerParameter,
    IntRandomizerParameter,
)
from robogym_tpu.randomization import sim as simrand

WORLD = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="1 1 1" pos="0 0 0"/>
    <body name="robot0:palm" pos="0 0 0.2">
      <joint name="robot0:WRJ1" type="hinge" axis="0 1 0" damping="0.1"
             limited="true" range="-0.5 0.5"/>
      <geom name="robot0:palm_geom" type="box" size="0.04 0.04 0.04" density="500"/>
    </body>
    <body name="cube:middle" pos="0.3 0 0.2">
      <freejoint name="cube:free_j"/>
      <geom name="cube:middle_geom" type="box" size="0.03 0.03 0.03" density="400"/>
    </body>
  </worldbody>
  <actuator>
    <general name="robot0:A_WRJ1" joint="robot0:WRJ1" gaintype="user"
             biastype="user" gainprm="10 0.1 1 0 0 0"/>
  </actuator>
</mujoco>
"""


@pytest.fixture(scope="module")
def model():
    return compile_xml(WORLD, dtype=jnp.float64)


def test_parameter_registry():
    p = FloatRandomizerParameter("x", 0.5, (0.0, 1.0), delta=0.1)
    assert p.get_value() == 0.5
    p.set_value(0.7)
    assert p.get_value() == 0.7
    assert p.get_range() == (0.0, 1.0)
    assert p.get_delta() == 0.1
    with pytest.raises(AssertionError):
        p.set_value(2.0)

    q = IntRandomizerParameter("n", 3, (1, 8))
    q.set_value(5.9)
    assert q.get_value() == 5


def test_env_randomization_paths(model):
    grav = simrand.GravityRandomizer()
    grav.initialize(model)
    sim_chain = ChainedRandomizer("sim", [grav])
    rand = EnvRandomization([sim_chain])
    param = rand.get_parameter("sim:gravity:value")
    assert param.get_value() == 0.0
    rand.update_parameter("sim:gravity:value", 1.5)
    assert rand.get_parameter("sim:gravity:value").get_value() == 1.5


def test_gravity_randomizer(model):
    r = simrand.GravityRandomizer()
    r.initialize(model)
    # value 0 -> exp(0)-1 = 0 noise -> gravity unchanged
    m2 = r.apply(model, jax.random.key(0), jnp.asarray(r.param_values()))
    np.testing.assert_allclose(
        np.asarray(m2.opt.gravity), np.asarray(model.opt.gravity), atol=1e-12
    )
    r.get_parameter("value").set_value(1.0)
    m3 = r.apply(model, jax.random.key(0), jnp.asarray(r.param_values()))
    assert not np.allclose(np.asarray(m3.opt.gravity), np.asarray(model.opt.gravity))
    # perturbation magnitude = exp(1)-1
    delta = np.asarray(m3.opt.gravity) - np.asarray(model.opt.gravity)
    np.testing.assert_allclose(np.linalg.norm(delta), np.e - 1.0, rtol=1e-6)


def test_pid_randomizer(model):
    r = simrand.PidRandomizer("pid_kp")
    r.initialize(model)
    r.get_parameter("mean").set_value(0.5)
    m2 = r.apply(model, jax.random.key(1), jnp.asarray(r.param_values()))
    # std=0 -> deterministic multiplicative exp(0.5)
    np.testing.assert_allclose(
        np.asarray(m2.actuator_gainprm[:, 0]),
        np.asarray(model.actuator_gainprm[:, 0]) * np.exp(0.5),
        rtol=1e-6,
    )


def test_generic_randomizer_prefix_selection(model):
    r = simrand.GenericSimRandomizer(
        "cube_friction", field_name="geom_friction",
        apply_mode="coupled", geom_prefix="cube:",
    )
    r.initialize(model)
    r.get_parameter("value").set_value(1.0)
    m2 = r.apply(model, jax.random.key(2), jnp.asarray(r.param_values()))
    names = model.const.names["geom"]
    cube_gid = names["cube:middle_geom"]
    other_gid = names["robot0:palm_geom"]
    np.testing.assert_allclose(
        np.asarray(m2.geom_friction[cube_gid]),
        np.asarray(model.geom_friction[cube_gid]) * np.e,
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(m2.geom_friction[other_gid]),
        np.asarray(model.geom_friction[other_gid]),
    )


def test_generic_randomizer_modes(model):
    # every mode must produce finite values of the right shape under jit
    for mode in (
        simrand.GenericSimRandomizer.MODES_ONE_PARAM
        + simrand.GenericSimRandomizer.MODES_TWO_PARAM
    ):
        r = simrand.GenericSimRandomizer(
            f"m_{mode}", field_name="dof_damping", apply_mode=mode,
            positive_only=True, zero_threshold=1.0,
        )
        r.initialize(model)
        for p in r.get_parameters():
            lo, hi = p.get_range()
            p.set_value(min(max(0.3, lo), hi))
        m2 = jax.jit(r.apply)(
            model, jax.random.key(3), jnp.asarray(r.param_values())
        )
        out = np.asarray(m2.dof_damping)
        assert out.shape == np.asarray(model.dof_damping).shape, mode
        assert np.isfinite(out).all(), mode
        assert (out >= 0).all(), mode


def test_solimp_solref_randomizers(model):
    for r in (simrand.GeomSolimpRandomizer(), simrand.GeomSolrefRandomizer()):
        r.initialize(model)
        for p in r.get_parameters():
            p.set_value(0.2 if "std" in p.name else 0.1)
        m2 = r.apply(model, jax.random.key(4), jnp.asarray(r.param_values()))
        assert bool(jnp.isfinite(m2.geom_solimp).all())
        assert bool(jnp.isfinite(m2.geom_solref).all())
    # solimp invariant: drange[0] <= dmin <= dmax <= drange[1]
    si = np.asarray(m2.geom_solimp)
    r2 = simrand.GeomSolimpRandomizer()
    r2.initialize(model)
    for p in r2.get_parameters():
        p.set_value(1.0 if "std" in p.name else 0.5)
    m3 = r2.apply(model, jax.random.key(5), jnp.asarray(r2.param_values()))
    si = np.asarray(m3.geom_solimp)
    assert (si[:, 0] <= si[:, 1] + 1e-9).all()
    assert (si[:, 0] >= 0.5 - 1e-9).all() and (si[:, 1] <= 0.99 + 1e-9).all()


# ---- dataclass ADR parameters -------------------------------------------


@dataclasses.dataclass(frozen=True)
class SubParams:
    cube_size_multiplier: float = randomizable(1.0, low=0.5, high=2.0)


@dataclasses.dataclass(frozen=True)
class Params:
    n_random_initial_steps: int = randomizable(10, low=0, high=50)
    simulation_params: SubParams = dataclasses.field(default_factory=SubParams)


def test_enumerate_randomizable_params():
    names = {p.name for p in enumerate_randomizable_params(Params())}
    assert names == {
        "n_random_initial_steps",
        "simulation_params:cube_size_multiplier",
    }


def test_env_parameter_randomizer_roundtrip():
    params = Params()
    r = EnvParameterRandomizer(params)
    assert r.get_parameter("n_random_initial_steps").get_value() == 10
    r.get_parameter("n_random_initial_steps").set_value(20)
    r.get_parameter("simulation_params:cube_size_multiplier").set_value(1.5)
    new = r.apply(params)
    assert new.n_random_initial_steps == 20
    assert new.simulation_params.cube_size_multiplier == 1.5
    assert params.n_random_initial_steps == 10  # frozen original


def test_build_env_randomization(model):
    grav = simrand.GravityRandomizer()
    grav.initialize(model)
    rand = build_env_randomization(
        parameters=Params(), simulation_randomizers=[grav]
    )
    rand.update_parameter("parameters:n_random_initial_steps", 5)
    assert rand.get_parameter("parameters:n_random_initial_steps").get_value() == 5
    rand.update_parameter("sim:gravity:value", 2.0)
    assert rand.get_parameter("sim:gravity:value").get_value() == 2.0
    # disabled randomizer is identity
    grav.disable()
    m2 = grav.apply(model, jax.random.key(0), jnp.asarray(grav.param_values()))
    assert m2 is model
