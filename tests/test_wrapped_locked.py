"""End-to-end test of the full default dactyl wrapper stack applied to the
REAL locked env (VERDICT: the ~25-wrapper reference stack
/root/reference/robogym/envs/dactyl/common/dactyl_cube_wrappers.py:8-131 must
run against real physics, not a FakeEnv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu import wrappers as W


@pytest.fixture(scope="module")
def wrapped_env():
    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(
        dict(mujoco_substeps=2, stop_on_fall=False), dtype=jnp.float64
    )
    return W.apply_dactyl_wrappers(env, randomize=True, n_action_bins=11)


def test_wrapped_locked_steps_and_keys(wrapped_env):
    """Full randomized stack: reset + steps produce finite obs with the
    wrapper-added keys (dactyl_cube_wrappers.py obs contract)."""
    env = wrapped_env
    B = 2
    keys = jax.random.split(jax.random.key(0), B)
    reset_b = jax.jit(jax.vmap(env.reset))
    state, obs = reset_b(keys)

    # wrapper-added observation keys
    for key_name in [
        "noisy_cube_pos",            # RandomizeObservationWrapper
        "relative_goal_quat",        # RelativeGoalWrapper
        "achieved_goal_quat",
        "goal",                      # UnifiedGoalObservationWrapper
        "previous_action",           # PreviousActionObservationWrapper
        "reward",                    # RewardObservationWrapper
    ]:
        assert key_name in obs, (key_name, sorted(obs.keys()))
    # AngleObservationWrapper replaces angle keys with [cos, sin] in place
    assert obs["hand_angle"].shape[-1] == 48, obs["hand_angle"].shape

    step_b = jax.jit(jax.vmap(env.step))
    a = jnp.zeros((B, env.action_size))
    for i in range(3):
        state, obs, reward, done, info = step_b(state, a)
    assert reward.shape == (B, 3)
    for k, v in obs.items():
        assert bool(jnp.isfinite(v.astype(jnp.float64)).all()), k
    assert bool(jnp.isfinite(reward).all())
    assert "env_crash" in info


def test_wrapped_locked_deterministic(wrapped_env):
    """Same key -> identical wrapped trajectory (the reference's
    test_det_locked_consistent tier, envs/dactyl/tests/test_locked.py:145)."""
    env = wrapped_env
    key = jax.random.key(7)
    step_j = jax.jit(env.step)
    reset_j = jax.jit(env.reset)

    outs = []
    for _ in range(2):
        state, obs = reset_j(key)
        tr = [obs]
        for i in range(3):
            state, obs, reward, done, info = step_j(
                state, jnp.full((env.action_size,), 0.3)
            )
            tr.append(obs)
        outs.append(tr)
    for o1, o2 in zip(*outs):
        for k in o1:
            np.testing.assert_allclose(
                np.asarray(o1[k], np.float64), np.asarray(o2[k], np.float64),
                atol=0, err_msg=k,
            )


def test_wrapped_randomized_diverges_from_raw(wrapped_env):
    """Randomization must actually change the physics: the wrapped env's
    cube trajectory diverges from the raw env under identical actions
    (reference wrappers/tests/test_randomizations.py test_wrapper_divergence)."""
    from robogym_tpu.envs.dactyl.locked import make_env

    raw = make_env(dict(mujoco_substeps=2, stop_on_fall=False),
                   dtype=jnp.float64)
    env = wrapped_env
    key = jax.random.key(3)
    sw, ow = jax.jit(env.reset)(key)
    sr, orr = jax.jit(raw.reset)(key)
    a_w = jnp.zeros((env.action_size,))
    a_r = jnp.zeros((raw.action_size,))
    step_w = jax.jit(env.step)
    step_r = jax.jit(raw.step)
    for _ in range(5):
        sw, *_ = step_w(sw, a_w)
        sr, *_ = step_r(sr, a_r)
    qw = np.asarray(sw.physics.qpos)
    qr = np.asarray(sr.physics.qpos)
    assert not np.allclose(qw, qr, atol=1e-10)
