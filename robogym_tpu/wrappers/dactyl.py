"""Dactyl/cube-specific transforms
(reference robogym/wrappers/dactyl.py:14-226 and wrappers/cube.py:12-182)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.dactyl import cube_env as cube_env_lib
from robogym_tpu.utils import rotation as rot
from robogym_tpu.wrappers.core import Transform
from robogym_tpu.wrappers.randomizations import (
    FreezingPhasespaceMarkers,
    loguniform,
)


class FixedWristWrapper(Transform):
    """Servo the WRJ0 wrist joint to a fixed position
    (wrappers/dactyl.py:173-188). WRJ0 is action index 1 in ACTUATORS
    order."""

    WRJ0_ACTION_INDEX = 1

    def __init__(self, env=None, wrj0_pos: float = 0.0):
        self.wrj0_pos = wrj0_pos
        self.hand = env.hand

    def action(self, tstate, action, key, env, env_state):
        from robogym_tpu.robot import shadow_hand as hand_lib

        m = env.model
        aid = int(self.hand.actuator_ids[self.WRJ0_ACTION_INDEX])
        cr = m.actuator_ctrlrange[aid]
        arange = (cr[1] - cr[0]) / 2.0
        wrj0_qpos_adr = int(self.hand.joint_qpos_ids[1])  # WRJ0 in JOINTS order
        joint_pos = env_state.physics.qpos[wrj0_qpos_adr]
        fixed = (self.wrj0_pos - joint_pos) / arange
        action = action.at[self.WRJ0_ACTION_INDEX].set(fixed.astype(action.dtype))
        return tstate, action


class StopOnFallWrapper(Transform):
    """done + drop penalty when the cube leaves the palm
    (wrappers/cube.py:106-160). Penalty only on the first drop frame;
    done suppressed before min_episode_length."""

    def __init__(self, env=None, drop_reward: float = -20.0,
                 min_episode_length: int = -1):
        self.drop_reward = drop_reward
        self.min_episode_length = min_episode_length

    def init(self, key, env):
        return {
            "steps": jnp.zeros((), jnp.int32),
            "drops_so_far": jnp.zeros((), jnp.int32),
            "first_drop": jnp.zeros((), jnp.int32),
            "fell": jnp.zeros((), bool),
        }

    def _is_fallen(self, env, env_state):
        return ~cube_env_lib.is_on_palm(env.cube, env_state.physics)

    def reward(self, tstate, reward):
        drop = jnp.where(
            tstate["fell"] & (tstate["first_drop"] == 0),
            self.drop_reward, 0.0,
        ).astype(reward.dtype)
        return tstate, reward.at[0].add(drop)

    def observation(self, tstate, obs, key, env, env_state):
        fell = self._is_fallen(env, env_state)
        tstate = dict(
            tstate,
            fell=fell,
            drops_so_far=tstate["drops_so_far"] + fell.astype(jnp.int32),
            first_drop=jnp.where(
                fell & (tstate["first_drop"] == 0),
                tstate["steps"] + 1, tstate["first_drop"],
            ),
            steps=tstate["steps"] + 1,
        )
        obs = dict(obs)
        obs["fell_down"] = fell[None].astype(env.dtype)
        return tstate, obs

    def done(self, tstate, done, env, env_state):
        done = done | tstate["fell"]
        if self.min_episode_length > 0:
            done = done & (tstate["steps"] >= self.min_episode_length)
        return tstate, done


class AngleObservationWrapper(Transform):
    """*_angle keys -> [cos, sin] (wrappers/cube.py:162-182)."""

    def __init__(self, env=None):
        pass

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        for k in list(obs.keys()):
            if k.endswith("_angle"):
                obs[k] = jnp.concatenate([jnp.cos(obs[k]), jnp.sin(obs[k])])
        return tstate, obs


class RandomizedCubeSizeWrapper(Transform):
    """cube geom_size *= U[cube_size_range] (wrappers/cube.py:12-53)."""

    model_fields = ("geom_size", "body_pos")

    def __init__(self, env=None, cube_size_range=(0.95, 1.05)):
        self.cube_size_range = cube_size_range
        names = env.model.const.names["geom"]
        geoms = [g for g in ("cube:middle", "cube:top", "cube:bottom")
                 if g in names]
        self.geom_ids = np.asarray([names[g] for g in geoms], np.int32)
        bnames = env.model.const.names["body"]
        bodies = [b for b in ("cube:top", "cube:bottom") if b in bnames]
        self.body_ids = np.asarray([bnames[b] for b in bodies], np.int32)

    def model(self, tstate, m, key):
        scale = jax.random.uniform(
            key, (), m.geom_size.dtype,
            self.cube_size_range[0], self.cube_size_range[1],
        )
        gs = m.geom_size.at[jnp.asarray(self.geom_ids)].mul(scale)
        m = m.replace(geom_size=gs)
        if len(self.body_ids):
            bp = m.body_pos.at[jnp.asarray(self.body_ids)].mul(scale)
            m = m.replace(body_pos=bp)
        return m


class RandomizedWindWrapper(Transform):
    """Random impulse forces on the cube body (wrappers/cube.py:56-85):
    per-episode hit probability, per-step decay 0.99 + poisson impulses."""

    has_physics_hook = True

    def __init__(self, env=None, force_std: float = 1.0,
                 max_mean_time_between: float = 0.8):
        self.force_std = force_std
        self.max_mean_time_between = max_mean_time_between
        self._step_duration = env.constants.step_duration
        self.cube_body = int(env.model.const.names["body"]["cube:middle"])
        self._cube_mass = float(np.asarray(env.model.body_mass)[self.cube_body])

    def init(self, key, env):
        lo = 0.01 * self._step_duration / self.max_mean_time_between
        hi = self._step_duration / self.max_mean_time_between
        return {"hit_prob": loguniform(key, lo, hi, (), env.dtype)}

    def physics(self, tstate, physics, key, env):
        k1, k2 = jax.random.split(key)
        xf = physics.xfrc_applied
        decayed = xf.at[self.cube_body, :3].mul(0.99)
        hit = jax.random.uniform(k1, ()) < tstate["hit_prob"]
        impulse = (
            jax.random.normal(k2, (3,), xf.dtype)
            * self._cube_mass * self.force_std
        )
        new_force = jnp.where(
            hit, impulse, decayed[self.cube_body, :3]
        )
        return tstate, physics.replace(
            xfrc_applied=decayed.at[self.cube_body, :3].set(new_force)
        )


class RandomizedPhasespaceFingersWrapper(Transform):
    """Perturb fingertip + reference site positions in the model
    (wrappers/dactyl.py:14-50)."""

    model_fields = ("site_pos",)

    def __init__(self, env=None, fingertips_noise: float = 0.003,
                 reference_noise: float = 0.001):
        names = env.model.const.names["site"]
        sites, noises = [], []
        for s in cube_env_lib.REFERENCE_SITE_NAMES:
            sites.append(names["robot0:" + s])
            noises.append(reference_noise)
        from robogym_tpu.robot.shadow_hand import FINGERTIP_SITE_NAMES
        for s in FINGERTIP_SITE_NAMES:
            sites.append(names["robot0:" + s])
            noises.append(fingertips_noise)
        self.site_ids = np.asarray(sites, np.int32)
        self.noise = np.asarray(noises)

    def model(self, tstate, m, key):
        noise = (
            jax.random.normal(key, (len(self.site_ids), 3), m.site_pos.dtype)
            * jnp.asarray(self.noise, m.site_pos.dtype)[:, None]
        )
        sp = m.site_pos.at[jnp.asarray(self.site_ids)].add(noise)
        return m.replace(site_pos=sp)


class FingersFreezingPhasespaceMarkers(FreezingPhasespaceMarkers):
    """(wrappers/dactyl.py:96-106)."""

    def __init__(self, env=None, key="fingertip_pos", disappear_p_1s=0.2,
                 freeze_scale_s=1.0):
        super().__init__(env, key=key, disappear_p_1s=disappear_p_1s,
                         freeze_scale_s=freeze_scale_s)


class FreezingPhasespaceBody(Transform):
    """Freeze a set of obs keys together with geometric durations
    (randomizations.py:473-513)."""

    def __init__(self, env=None, keys: Sequence[str] = (), disappear_p_1s=0.02,
                 freeze_scale_s=1.0):
        self.keys = list(keys)
        step_s = env.constants.step_duration
        self._disappear_p = 1.0 - (1.0 - disappear_p_1s) ** step_s
        self._freeze_scale_steps = freeze_scale_s / step_s

    def init(self, key, env):
        return None

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        present = [k for k in self.keys if k in obs]
        if not present:
            return tstate, obs
        if tstate is None:
            tstate = {
                "freeze_left": jnp.zeros((), jnp.int32),
                "held": {k: obs[k] for k in present},
            }
        k1, k2 = jax.random.split(key)
        start = jax.random.bernoulli(k1, self._disappear_p)
        duration = jnp.ceil(
            jax.random.exponential(k2, ()) * self._freeze_scale_steps
        ).astype(jnp.int32)
        frozen = tstate["freeze_left"] > 0
        freeze_left = jnp.where(
            frozen, tstate["freeze_left"] - 1, jnp.where(start, duration, 0)
        )
        held = {
            k: jnp.where(frozen, tstate["held"][k], obs[k]) for k in present
        }
        for k in present:
            obs[k] = held[k]
        return {"freeze_left": freeze_left, "held": held}, obs


class CubeFreezingPhasespaceBody(FreezingPhasespaceBody):
    """(wrappers/cube.py:88-103)."""

    def __init__(self, env=None, disappear_p_1s=0.02, freeze_scale_s=1.0):
        super().__init__(
            env,
            keys=[
                "noisy_relative_goal_pos", "noisy_relative_goal_quat",
                "noisy_relative_goal_face_angle", "noisy_achieved_goal_pos",
                "noisy_achieved_goal_quat", "noisy_achieved_goal_face_angle",
                "noisy_cube_pos",
            ],
            disappear_p_1s=disappear_p_1s,
            freeze_scale_s=freeze_scale_s,
        )


class FingersOccludedPhasespaceMarkers(Transform):
    """Hold fingertip marker values while the finger is occluded
    (wrappers/dactyl.py:53-93). Without occlusion-annotation geoms this
    reduces to a pass-through, matching the reference's behavior when
    `occlusion_markers_exist` is False."""

    def __init__(self, env=None):
        pass


class FingerSeparationWrapper(Transform):
    """Immobilize and spread apart all fingers other than `active_finger`
    (/root/reference/robogym/wrappers/dactyl.py:109-151): each frozen
    joint's range collapses to a 0.01 rad window at one limit, pushing
    fingers below the active one to their low limit and above it to their
    high limit (thumb to its own fixed pattern). Deterministic per-episode
    Model transform on jnt_range."""

    model_fields = ("jnt_range",)

    FINGERS = ("TH", "FF", "MF", "RF", "LF", "WR")

    def __init__(self, env=None, active_finger="FF"):
        self.active_finger = active_finger
        jn = env.model.const.names["joint"]
        finger_i = self.FINGERS.index(active_finger)
        plan = []  # (joint_id, limit_side)
        for i, f in enumerate(self.FINGERS):
            if i == finger_i:
                continue
            if "F" in f:
                limit = 0 if i < finger_i else 1
                for jname, side in ((f"{f}J4", 1), (f"{f}J3", limit),
                                    (f"{f}J2", 1), (f"{f}J1", 1),
                                    (f"{f}J0", 1)):
                    if f"robot0:{jname}" in jn:
                        plan.append((jn[f"robot0:{jname}"], side))
            if f == "TH":
                for jname, side in ((f"{f}J4", 0), (f"{f}J3", 1),
                                    (f"{f}J2", 1), (f"{f}J1", 0),
                                    (f"{f}J0", 0)):
                    if f"robot0:{jname}" in jn:
                        plan.append((jn[f"robot0:{jname}"], side))
        self.joint_ids = np.asarray([p[0] for p in plan], np.int32)
        self.sides = np.asarray([p[1] for p in plan], np.int32)

    def model(self, tstate, m, key):
        ids = jnp.asarray(self.joint_ids)
        sides = jnp.asarray(self.sides)
        other = m.jnt_range[ids, 1 - sides]
        diff = jnp.where(sides == 0, -0.01, 0.01).astype(m.jnt_range.dtype)
        return m.replace(jnt_range=m.jnt_range.at[ids, sides].set(other + diff))
