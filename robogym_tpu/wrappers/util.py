"""Utility transforms (reference robogym/wrappers/util.py:10-343)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.utils import rotation as rot
from robogym_tpu.wrappers.core import Transform


def bin_array(lower, upper, n_bins: int, spacing: str = "linear") -> np.ndarray:
    """(util.py:17-33 BinSpacing.get_bin_array)."""
    if spacing == "linear":
        return np.linspace(lower, upper, n_bins)
    assert lower == -upper and n_bins % 2 == 1, (
        "Exponential binning needs a symmetric space and odd bins"
    )
    half = np.array([2.0 ** (-n) for n in range(n_bins // 2)]) * lower
    return np.concatenate([half, [0], -half[::-1]])


class DiscretizeActionWrapper(Transform):
    """Continuous [-1,1]^A -> MultiDiscrete(n_bins) (util.py:36-72).
    The wrapped step takes integer bin indices."""

    DEFAULT_BINS = 11

    def __init__(self, env=None, n_action_bins: Optional[int] = DEFAULT_BINS,
                 bin_spacing: str = "linear"):
        if n_action_bins is None:
            n_action_bins = self.DEFAULT_BINS
        self.n_action_bins = n_action_bins
        self._bins = np.stack(
            [bin_array(-1.0, 1.0, n_action_bins, bin_spacing)]
            * env.action_size
        )

    def action(self, tstate, action, key, env, env_state):
        bins = jnp.asarray(self._bins, env.dtype)
        idx = jnp.clip(action.astype(jnp.int32), 0, bins.shape[1] - 1)
        return tstate, jnp.take_along_axis(bins, idx[:, None], axis=1)[:, 0]


class ClipActionWrapper(Transform):
    """(util.py:124-139)."""

    def __init__(self, env=None, clip: float = 1.0):
        self._clip = clip

    def action(self, tstate, action, key, env, env_state):
        return tstate, jnp.clip(action, -self._clip, self._clip)


class ClipObservationWrapper(Transform):
    """(util.py:91-110)."""

    def __init__(self, env=None, clip: float = 100.0):
        self._clip = clip

    def observation(self, tstate, obs, key, env, env_state):
        return tstate, {
            k: jnp.clip(v, -self._clip, self._clip) for k, v in obs.items()
        }


class ClipRewardWrapper(Transform):
    """(util.py:113-127)."""

    def __init__(self, env=None, clip: float = 100.0):
        self._clip = clip

    def reward(self, tstate, reward):
        return tstate, jnp.clip(reward, -self._clip, self._clip)


class SummedRewardsWrapper(Transform):
    """Reward triple -> scalar (util.py:337-343)."""

    def __init__(self, env=None):
        pass

    def reward(self, tstate, reward):
        return tstate, jnp.sum(reward)[None]


class SmoothActionWrapper(Transform):
    """EMA action filter with per-episode alpha jitter
    (util.py:192-218; alpha adjusted by step duration / 0.08)."""

    def __init__(self, env=None, alpha: float = 0.0):
        self._alpha = alpha
        self._step_duration = env.constants.step_duration

    def init(self, key, env):
        adjusted = np.power(self._alpha, self._step_duration / 0.08) if self._alpha > 0 else 0.0
        return {
            "alpha": jnp.asarray(adjusted, env.dtype),
            "value": jnp.zeros(env.action_size, env.dtype),
            "t": jnp.zeros((), jnp.int32),
        }

    def action(self, tstate, action, key, env, env_state):
        a = tstate["alpha"]
        value = tstate["value"] * a + (1.0 - a) * action
        t = tstate["t"] + 1
        # bias-corrected EMA (IncrementalExpAvg, util.py:142-160)
        corrected = value / (1.0 - jnp.power(a, t.astype(value.dtype)))
        corrected = jnp.where(a > 0.0, corrected, action)
        return {"alpha": a, "value": value, "t": t}, corrected

    def observation(self, tstate, obs, key, env, env_state):
        a = tstate["alpha"]
        t = jnp.maximum(tstate["t"], 1)
        ema = tstate["value"] / (1.0 - jnp.power(a, t.astype(tstate["value"].dtype)))
        ema = jnp.where(a > 0.0, ema, tstate["value"])
        obs = dict(obs)
        obs["action_ema"] = ema
        return tstate, obs


class PreviousActionObservationWrapper(Transform):
    """(util.py:164-184)."""

    def __init__(self, env=None):
        self._n = env.action_size

    def init(self, key, env):
        return jnp.zeros(self._n, env.dtype)

    def action(self, tstate, action, key, env, env_state):
        return action.astype(env.dtype), action

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        obs["previous_action"] = tstate
        return tstate, obs


class RelativeGoalWrapper(Transform):
    """Adds achieved_goal_* / relative_goal_* (+ noisy variants)
    (util.py:221-285). Uses the env's goal-space difference: quaternion keys
    use quat_difference, others subtraction."""

    def __init__(self, env=None, obs_prefix: str = ""):
        self.obs_prefix = obs_prefix

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        goal_names = [k[len("goal_"):] for k in obs if k.startswith("goal_")
                      and not k.startswith("goal_is_achieved")]
        for name in goal_names:
            cur_key = f"{self.obs_prefix}{name}"
            if cur_key not in obs:
                continue
            goal = obs[f"goal_{name}"]
            cur = obs[cur_key]
            rel = (
                rot.quat_difference(goal, cur)
                if name.endswith("quat")
                else goal - cur
            )
            obs[f"achieved_goal_{name}"] = cur
            obs[f"relative_goal_{name}"] = rel
            noisy_key = f"noisy_{cur_key}"
            if noisy_key in obs:
                noisy_cur = obs[noisy_key]
                noisy_rel = (
                    rot.quat_difference(goal, noisy_cur)
                    if name.endswith("quat")
                    else goal - noisy_cur
                )
                obs[f"noisy_achieved_goal_{name}"] = noisy_cur
                obs[f"noisy_relative_goal_{name}"] = noisy_rel
        return tstate, obs


class UnifiedGoalObservationWrapper(Transform):
    """Concatenate goal pieces into flat goal vectors (util.py:288-334)."""

    def __init__(self, env=None,
                 goal_keys=("relative_goal", "achieved_goal", "goal"),
                 goal_parts=("pos", "quat")):
        self.goal_keys = list(goal_keys)
        self.goal_parts = list(goal_parts)

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        for goal_key in self.goal_keys:
            for prefix in ("", "noisy_"):
                parts = [
                    obs[f"{prefix}{goal_key}_{p}"]
                    for p in self.goal_parts
                    if f"{prefix}{goal_key}_{p}" in obs
                ]
                if parts:
                    obs[f"{prefix}{goal_key}"] = jnp.concatenate(
                        [p.reshape(-1) for p in parts]
                    )
        return tstate, obs


class RewardObservationWrapper(Transform):
    """Expose (selected) reward entries as an observation
    (reference wrappers/dactyl.py RewardObservationWrapper)."""

    def __init__(self, env=None, reward_inds: Optional[Sequence[int]] = None):
        self.reward_inds = list(reward_inds) if reward_inds is not None else None

    def init(self, key, env):
        n = len(self.reward_inds) if self.reward_inds is not None else 3
        return jnp.zeros(n, env.dtype)

    def reward(self, tstate, reward):
        sel = (
            reward[jnp.asarray(self.reward_inds)]
            if self.reward_inds is not None
            else reward
        )
        return sel.astype(tstate.dtype), reward

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        obs["reward"] = tstate
        return tstate, obs


class RewardNameWrapper(Transform):
    """Sets the default reward names on the environment
    (/root/reference/robogym/wrappers/util.py:73-88). The TPU build's reward
    is always the [env, goal, success] triple (envs/core.py tracker), so the
    default exposes all three component names."""

    def __init__(self, env=None):
        if not hasattr(env, "reward_names"):
            env.reward_names = ["env", "goal", "success"]
