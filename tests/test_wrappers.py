"""Wrapper-layer tests (reference wrappers/tests/test_randomizations.py and
envs/tests/test_wrapper_compositions.py analogues) against a lightweight fake
env — fast compile, no hand model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.envs import core
from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import make_data
from robogym_tpu.wrappers import (
    ActionNoiseWrapper,
    ClipActionWrapper,
    ClipObservationWrapper,
    ClipRewardWrapper,
    DiscretizeActionWrapper,
    ObservationDelayWrapper,
    PreviousActionObservationWrapper,
    RandomizeObservationWrapper,
    RandomizedActionLatency,
    RandomizedBodyInertiaWrapper,
    RandomizedBrokenActuatorWrapper,
    RandomizedGravityWrapper,
    RelativeGoalWrapper,
    SmoothActionWrapper,
    UnifiedGoalObservationWrapper,
    WrappedEnv,
    apply_named_wrappers,
    edit_wrappers,
)

WORLD = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="robot0:pole" pos="0 0 1">
      <joint name="robot0:hinge" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom name="robot0:rod" type="capsule" fromto="0 0 0 0 0 -0.3" size="0.02"
            density="1000" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="robot0:A_hinge" joint="robot0:hinge" gear="1"/>
  </actuator>
</mujoco>
"""


class FakeEnv:
    """Minimal functional env implementing the reset/step contract."""

    def __init__(self):
        self.dtype = jnp.float64
        self.model = compile_xml(WORLD, dtype=self.dtype)
        self.constants = core.EnvConstants(mujoco_substeps=1)
        self.action_size = 2

    def reset(self, key):
        d = make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            physics=d,
            goal={"pos": jnp.asarray([0.3, 0.4]),
                  "quat": jnp.asarray([1.0, 0, 0, 0])},
            goal_aux=jnp.zeros(()),
            prev_goal_distance={"pos": jnp.zeros(())},
            tracker=core.TrackerState.zero(),
            key=key,
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._observe(state)

    def step(self, state, action):
        # "physics": integrate action into a fake 2d position
        aux = state.goal_aux + jnp.sum(action)
        state = state.replace(goal_aux=aux, t=state.t + 1)
        obs = self._observe(state)
        reward = jnp.asarray([0.0, 150.0, 1.0])  # triggers reward clipping
        done = jnp.zeros((), bool)
        return state, obs, reward, done, {}

    def _observe(self, state):
        pos = jnp.stack([state.goal_aux, -state.goal_aux])
        return {
            "pos": pos,
            "quat": jnp.asarray([1.0, 0, 0, 0]),
            "goal_pos": state.goal["pos"],
            "goal_quat": state.goal["quat"],
            "obs_big": jnp.asarray([1000.0, -1000.0]),
        }


@pytest.fixture(scope="module")
def fake():
    return FakeEnv()


@pytest.fixture(scope="module")
def locked_env():
    from robogym_tpu.envs.dactyl import locked

    return locked.make_env(dict(mujoco_substeps=1))


def run_steps(env, n=3, action=None, seed=0):
    state, obs = env.reset(jax.random.key(seed))
    out = [obs]
    for i in range(n):
        a = action if action is not None else jnp.asarray([0.5, -0.5])
        state, obs, reward, done, info = env.step(state, a)
        out.append((obs, reward, done))
    return state, out


def test_clip_wrappers(fake):
    env = WrappedEnv(fake, [
        ClipObservationWrapper(env=fake, clip=100.0),
        ClipRewardWrapper(env=fake, clip=100.0),
        ClipActionWrapper(env=fake),
    ])
    state, out = run_steps(env)
    obs, reward, done = out[1]
    assert float(jnp.max(obs["obs_big"])) <= 100.0
    assert float(jnp.max(reward)) <= 100.0


def test_discretize_action(fake):
    t = DiscretizeActionWrapper(env=fake, n_action_bins=11)
    ts = t.init(jax.random.key(0), fake)
    _, a = t.action(ts, jnp.asarray([0, 10]), None, fake, None)
    np.testing.assert_allclose(np.asarray(a), [-1.0, 1.0])
    _, a = t.action(ts, jnp.asarray([5, 5]), None, fake, None)
    np.testing.assert_allclose(np.asarray(a), [0.0, 0.0], atol=1e-12)


def test_discretize_exponential(fake):
    t = DiscretizeActionWrapper(env=fake, n_action_bins=11,
                                bin_spacing="exponential")
    ts = t.init(jax.random.key(0), fake)
    _, a = t.action(ts, jnp.asarray([0, 5]), None, fake, None)
    np.testing.assert_allclose(np.asarray(a), [-1.0, 0.0], atol=1e-12)


def test_smooth_action_ema(fake):
    t = SmoothActionWrapper(env=fake, alpha=0.5)
    ts = t.init(jax.random.key(0), fake)
    a0 = jnp.asarray([1.0, -1.0])
    ts, a1 = t.action(ts, a0, None, fake, None)
    # bias-corrected EMA of a constant signal returns the signal
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=1e-6)
    ts, a2 = t.action(ts, a0, None, fake, None)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a0), rtol=1e-6)


def test_previous_action(fake):
    env = WrappedEnv(fake, [PreviousActionObservationWrapper(env=fake)])
    state, obs = env.reset(jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(obs["previous_action"]), [0, 0])
    a = jnp.asarray([0.3, 0.7])
    state, obs, *_ = env.step(state, a)
    np.testing.assert_allclose(np.asarray(obs["previous_action"]),
                               np.asarray(a))


def test_relative_and_unified_goal(fake):
    env = WrappedEnv(fake, [
        RelativeGoalWrapper(env=fake),
        UnifiedGoalObservationWrapper(env=fake, goal_parts=("pos", "quat")),
    ])
    state, obs = env.reset(jax.random.key(0))
    assert "relative_goal_pos" in obs and "achieved_goal_quat" in obs
    np.testing.assert_allclose(
        np.asarray(obs["relative_goal_pos"]),
        np.asarray(obs["goal_pos"]) - np.asarray(obs["pos"]),
    )
    assert obs["relative_goal"].shape == (6,)  # pos(2) + quat(4)


def test_observation_noise(fake):
    # quat detection keys off the "_quat" suffix (randomizations.py:333-338)
    levels = {"pos": {"additive": 0.1, "uncorrelated": 0.01},
              "goal_quat": {"additive": 0.1}}
    env = WrappedEnv(fake, [RandomizeObservationWrapper(env=fake, levels=levels)])
    state, obs = env.reset(jax.random.key(0))
    assert "noisy_pos" in obs and "noisy_goal_quat" in obs
    assert not np.allclose(np.asarray(obs["noisy_pos"]), np.asarray(obs["pos"]))
    # noisy quat stays unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(obs["noisy_goal_quat"])), 1.0, atol=1e-6
    )
    # clean obs untouched
    state2, obs2, *_ = env.step(state, jnp.asarray([0.1, 0.1]))
    assert "noisy_pos" in obs2


def test_observation_delay(fake):
    levels = {
        "interpolators": {"quat": "QuatInterpolator"},
        "groups": {"vision": {"obs_names": ["pos", "quat"],
                              "mean": 1.0, "std": 0.0}},
    }
    env = WrappedEnv(fake, [ObservationDelayWrapper(env=fake, levels=levels)])
    state, obs = env.reset(jax.random.key(0))
    assert "noisy_pos" in obs
    prev_pos = obs["pos"]
    state, obs, *_ = env.step(state, jnp.asarray([0.5, 0.5]))
    # delay of exactly 1 step -> noisy_pos equals the previous pos
    np.testing.assert_allclose(np.asarray(obs["noisy_pos"]),
                               np.asarray(prev_pos))


def test_action_noise_and_latency(fake):
    env = WrappedEnv(fake, [
        RandomizedActionLatency(env=fake, max_delay=1),
        ActionNoiseWrapper(env=fake),
    ])
    state, out = run_steps(env, n=2)
    obs, reward, done = out[-1]
    assert "action_history" in obs and obs["action_history"].shape == (2,)


def test_broken_actuators(fake):
    t = RandomizedBrokenActuatorWrapper(env=fake, proba_broken=1.0,
                                        max_broken_actuators=1)
    ts = t.init(jax.random.key(0), fake)
    assert int(np.asarray(ts).sum()) == 1  # capped at max_broken
    _, a = t.action(ts, jnp.asarray([0.9, 0.9]), jax.random.key(1), fake, None)
    a = np.asarray(a)
    assert (np.abs(a[np.asarray(ts)]) < 0.06).all()


def test_model_randomization_fields(fake):
    env = WrappedEnv(fake, [
        RandomizedBodyInertiaWrapper(env=fake),
        RandomizedGravityWrapper(env=fake, gravity_std=0.5),
    ])
    state, obs = env.reset(jax.random.key(0))
    mf = state.model_fields
    assert set(mf.keys()) == {"body_inertia", "opt:gravity"}
    assert not np.allclose(np.asarray(mf["opt:gravity"]),
                           np.asarray(fake.model.opt.gravity))
    # vmapped reset gives different draws per env
    state_b, _ = jax.vmap(env.reset)(jax.random.split(jax.random.key(1), 3))
    g = np.asarray(state_b.model_fields["opt:gravity"])
    assert not np.allclose(g[0], g[1])


def test_wrapped_env_jit_vmap(fake):
    env = WrappedEnv(fake, [
        ClipActionWrapper(env=fake),
        PreviousActionObservationWrapper(env=fake),
        RandomizeObservationWrapper(env=fake, levels={"pos": {"additive": 0.01}}),
    ])
    B = 4
    keys = jax.random.split(jax.random.key(0), B)
    state, obs = jax.jit(jax.vmap(env.reset))(keys)
    actions = jnp.zeros((B, 2))
    state, obs, reward, done, info = jax.jit(jax.vmap(env.step))(state, actions)
    assert obs["pos"].shape == (B, 2)
    assert reward.shape == (B, 3)


def test_edit_wrappers():
    wl = [["A"], ["B", {"x": 1}], ["C"]]
    out = edit_wrappers(wl, insert_above=[("B", ["Z"])], delete=["C"])
    assert [w[0] for w in out] == ["A", "Z", "B"]
    out = edit_wrappers(wl, replace=[("B", ["Y", {}])])
    assert [w[0] for w in out] == ["A", "Y", "C"]


def test_action_delay_wrapper(locked_env):
    """Fractional-delay blend: first step passes the action through scaled
    (no last_action yet -> blend of identical actions), later steps blend
    toward the previous action (randomizations.py:943-1031 semantics)."""
    from robogym_tpu.wrappers import ActionDelayWrapper
    from robogym_tpu.wrappers.core import WrappedEnv

    env = WrappedEnv(locked_env, [ActionDelayWrapper(
        env=locked_env, delay=100.0, per_episode_std=0.0, per_step_std=0.0,
    )])
    t = env.transforms[0]
    ts = t.init(jax.random.key(0), locked_env)
    a1 = jnp.ones(locked_env.action_size, locked_env.dtype)
    ts, out1 = t.action(ts, a1, jax.random.key(1), locked_env, None)
    np.testing.assert_allclose(np.asarray(out1), 1.0, atol=1e-6)
    a2 = -jnp.ones(locked_env.action_size, locked_env.dtype)
    ts, out2 = t.action(ts, a2, jax.random.key(2), locked_env, None)
    # delay=100ms vs step 80ms -> frac clips to 1.0 -> pure last action
    np.testing.assert_allclose(np.asarray(out2), 1.0, atol=1e-6)
    # small delay (20% of the step): mostly the new action
    total_ms = locked_env.constants.step_duration * 1000.0
    t2 = ActionDelayWrapper(env=locked_env, delay=0.2 * total_ms,
                            per_episode_std=0.0, per_step_std=0.0)
    ts2 = t2.init(jax.random.key(0), locked_env)
    ts2, _ = t2.action(ts2, a1, jax.random.key(1), locked_env, None)
    ts2, out = t2.action(ts2, a2, jax.random.key(2), locked_env, None)
    np.testing.assert_allclose(
        np.asarray(out), 0.2 * 1.0 + 0.8 * -1.0, atol=1e-5
    )


def test_finger_separation_wrapper(locked_env):
    from robogym_tpu.wrappers import FingerSeparationWrapper

    t = FingerSeparationWrapper(env=locked_env, active_finger="FF")
    m2 = t.model(None, locked_env.model, jax.random.key(0))
    jr = np.asarray(m2.jnt_range)
    jn = locked_env.model.const.names["joint"]
    # frozen: MF (above FF in order) collapses at its HIGH limit
    j = jn["robot0:MFJ1"]
    assert jr[j, 1] - jr[j, 0] == pytest.approx(0.01, abs=1e-6)
    # active finger FF untouched
    j = jn["robot0:FFJ1"]
    orig = np.asarray(locked_env.model.jnt_range)[j]
    np.testing.assert_allclose(jr[j], orig)


def test_reward_name_wrapper(locked_env):
    from robogym_tpu.wrappers import RewardNameWrapper

    if hasattr(locked_env, "reward_names"):
        del locked_env.reward_names
    RewardNameWrapper(env=locked_env)
    assert locked_env.reward_names == ["env", "goal", "success"]
