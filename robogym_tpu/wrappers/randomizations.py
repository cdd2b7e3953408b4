"""Domain-randomization transforms.

Pure re-implementations of /root/reference/robogym/wrappers/randomizations.py
(1212 LoC of gym wrappers) as per-episode-state transforms inside the jitted
step: model randomization (inertia, friction, gravity, timestep, damping,
kp, joint limits, tendon ranges), observation corruption (noise, delay,
phasespace freezing), and action corruption (noise, latency, backlash,
broken actuators).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.utils import rotation as rot
from robogym_tpu.wrappers.core import Transform

# empirical constant: quaternion noise at Euler-radian scale
# (randomizations.py:310-312)
QUAT_NOISE_CORRECTION = 1.96


def loguniform(key, low, high, shape=(), dtype=jnp.float32):
    return jnp.exp(
        jax.random.uniform(key, shape, dtype, jnp.log(low), jnp.log(high))
    )


# ---------------------------------------------------------------------------
# model randomization (per episode)
# ---------------------------------------------------------------------------


class RandomizedBodyInertiaWrapper(Transform):
    """body_inertia *= U[mass_range] (randomizations.py:72-92)."""

    model_fields = ("body_inertia",)

    def __init__(self, env=None, mass_range=(0.5, 1.5)):
        self.mass_range = mass_range

    def model(self, tstate, m, key):
        mult = jax.random.uniform(
            key, (m.body_inertia.shape[0], 1), m.body_inertia.dtype,
            self.mass_range[0], self.mass_range[1],
        )
        return m.replace(body_inertia=m.body_inertia * mult)


class RandomizedFrictionBaseWrapper(Transform):
    """geom_friction[:, col] *= loguniform(multiplier_ranges[col])
    for prefix-selected geoms (randomizations.py:95-153)."""

    model_fields = ("geom_friction",)

    def __init__(self, env, multiplier_ranges, geom_name_prefix=None):
        self.multiplier_ranges = np.asarray(multiplier_ranges, np.float64)
        assert self.multiplier_ranges.shape == (3, 2)
        names = env.model.const.names["geom"]
        if geom_name_prefix is None:
            ids = sorted(names.values())
        else:
            ids = sorted(
                gid for name, gid in names.items()
                if name.startswith(geom_name_prefix)
            )
        self.geom_ids = np.asarray(ids, np.int32)

    def model(self, tstate, m, key):
        dtype = m.geom_friction.dtype
        keys = jax.random.split(key, 3)
        fr = m.geom_friction
        for col in range(3):
            lo, hi = self.multiplier_ranges[col]
            mult = loguniform(keys[col], lo, hi, (), dtype)
            sel = fr[jnp.asarray(self.geom_ids), col] * mult
            fr = fr.at[jnp.asarray(self.geom_ids), col].set(sel)
        return m.replace(geom_friction=fr)


class RandomizedFrictionWrapper(RandomizedFrictionBaseWrapper):
    """(randomizations.py:156-159)."""

    def __init__(self, env=None, multiplier_range=(0.7, 1.3)):
        super().__init__(env, [list(multiplier_range)] * 3, "robot0:")


class RandomizedRobotFrictionWrapper(RandomizedFrictionBaseWrapper):
    """(randomizations.py:162-166)."""

    def __init__(self, env=None,
                 multiplier_ranges=((0.7, 1.3), (0.5, 1.5), (0.5, 1.5))):
        super().__init__(env, multiplier_ranges, "robot0:")


class RandomizedCubeFrictionWrapper(RandomizedFrictionBaseWrapper):
    """(randomizations.py:169-173)."""

    def __init__(self, env=None,
                 multiplier_ranges=((0.5, 1.5), (0.2, 5.0), (0.2, 5.0))):
        super().__init__(env, multiplier_ranges, "cube:")


class RandomizedGravityWrapper(Transform):
    """gravity += std * N(0,1)^3 (randomizations.py:176-191)."""

    model_fields = ("opt:gravity",)

    def __init__(self, env=None, gravity_std=0.4):
        self.gravity_std = gravity_std

    def model(self, tstate, m, key):
        g = m.opt.gravity + self.gravity_std * jax.random.normal(
            key, (3,), m.opt.gravity.dtype
        )
        return m.replace(opt=m.opt.replace(gravity=g))


class RandomizedTimestepWrapper(Transform):
    """Per-step exponential timestep noise with a sign flip process
    (randomizations.py:194-305)."""

    model_fields = ("opt:timestep",)

    def __init__(self, env=None, min_lambda=1250, max_lambda=10000,
                 adr_bias_magic=0.6, adr_variance_magic=1.0):
        self.min_lambda = min_lambda
        self.max_lambda = max_lambda
        self._orig_timestep = float(env.model.opt.timestep)

    def init(self, key, env):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "pos_lambda": jax.random.uniform(
                k1, (), jnp.float32, self.min_lambda, self.max_lambda
            ),
            "neg_lambda": jax.random.uniform(
                k2, (), jnp.float32, self.min_lambda, self.max_lambda
            ),
            "side": jnp.where(jax.random.bernoulli(k3), 1.0, -1.0),
            "p_flip_pos": jax.random.uniform(k4, ()),
            "p_flip_neg": jax.random.uniform(k5, ()),
        }

    def model_step(self, tstate, model_fields, key, env):
        k1, k2 = jax.random.split(key)
        side = tstate["side"]
        p_flip = jnp.where(side > 0, tstate["p_flip_pos"], tstate["p_flip_neg"])
        flip = jax.random.uniform(k1, ()) > p_flip
        side = jnp.where(flip, -side, side)
        lam = jnp.where(side > 0, tstate["pos_lambda"], tstate["neg_lambda"])
        noise = jax.random.exponential(k2, ()) / lam
        orig = self._orig_timestep
        # negative side: rescaled + clipped for stability
        frac = noise / orig
        neg_noise = jnp.clip(orig * (frac / (1 + frac)), 0.0, orig / 2)
        noise = jnp.where(side > 0, noise, neg_noise)
        ts = jnp.asarray(orig + side * noise, jnp.float32)
        model_fields = dict(model_fields or {})
        model_fields["opt:timestep"] = ts.astype(env.dtype)
        tstate = dict(tstate, side=side)
        return tstate, model_fields


class RandomizedWindWrapper(Transform):
    """Per-episode wind vector (reference wrappers/cube.py RandomizedWindWrapper
    semantics: N(0, std)^3 wind in model.opt)."""

    model_fields = ("opt:wind",)

    def __init__(self, env=None, wind_std=0.3):
        self.wind_std = wind_std

    def model(self, tstate, m, key):
        w = self.wind_std * jax.random.normal(key, (3,), m.opt.wind.dtype)
        return m.replace(opt=m.opt.replace(wind=m.opt.wind + w))


class RandomizedDampingWrapper(Transform):
    """dof_damping *= loguniform(damping_range) for selected joints
    (randomizations.py:562-590)."""

    model_fields = ("dof_damping",)

    def __init__(self, env=None, damping_range=(0.3, 3.0), joint_names=()):
        self.damping_range = damping_range
        c = env.model.const
        jn = c.names["joint"]
        jids = [jn[n] for n in joint_names] if joint_names else list(jn.values())
        dof_jntid = np.asarray(c.dof_jntid)
        self.dof_ids = np.asarray(
            [i for i in range(c.nv) if int(dof_jntid[i]) in set(jids)], np.int32
        )

    def model(self, tstate, m, key):
        mult = loguniform(
            key, self.damping_range[0], self.damping_range[1],
            (len(self.dof_ids),), m.dof_damping.dtype,
        )
        ids = jnp.asarray(self.dof_ids)
        return m.replace(dof_damping=m.dof_damping.at[ids].mul(mult))


class RandomizedRobotDampingWrapper(RandomizedDampingWrapper):
    """(wrappers/dactyl.py RandomizedRobotDampingWrapper)."""

    def __init__(self, env=None, damping_range=(0.3, 3.0)):
        names = [
            n for n in env.model.const.names["joint"] if n.startswith("robot0:")
        ]
        super().__init__(env, damping_range, names)


class RandomizedKpWrapper(Transform):
    """actuator kp *= loguniform(kp_range) (randomizations.py:720-746)."""

    model_fields = ("actuator_gainprm",)

    def __init__(self, env=None, kp_range=(0.75, 1.5), actuator_names=()):
        self.kp_range = kp_range
        an = env.model.const.names["actuator"]
        ids = [an[n] for n in actuator_names] if actuator_names else list(an.values())
        self.actuator_ids = np.asarray(sorted(ids), np.int32)

    def model(self, tstate, m, key):
        mult = loguniform(
            key, self.kp_range[0], self.kp_range[1],
            (len(self.actuator_ids),), m.actuator_gainprm.dtype,
        )
        ids = jnp.asarray(self.actuator_ids)
        gp = m.actuator_gainprm.at[ids, 0].mul(mult)
        return m.replace(actuator_gainprm=gp)


class RandomizedRobotKpWrapper(RandomizedKpWrapper):
    def __init__(self, env=None, kp_range=(0.75, 1.5)):
        names = [
            n for n in env.model.const.names["actuator"] if n.startswith("robot0:")
        ]
        super().__init__(env, kp_range, names)


class RandomizedJointLimitWrapper(Transform):
    """Widen/narrow joint limits with relative gaussian noise and propagate
    to actuator ctrl ranges (randomizations.py:593-670, simplified: ctrlrange
    update for 1:1 joint:actuator mapping by name)."""

    model_fields = ("jnt_range", "actuator_ctrlrange")

    def __init__(self, env=None, joint_names=(), relative_std=0.15):
        self.relative_std = relative_std
        c = env.model.const
        jn = c.names["joint"]
        self.joint_ids = np.asarray(
            sorted(jn[n] for n in joint_names) if joint_names
            else sorted(jn.values()),
            np.int32,
        )
        # joint id -> actuator id where the actuator transmits to that joint
        an = c.names["actuator"]
        trnid = np.asarray(c.actuator_trnid)
        self.jnt_to_act = {}
        from robogym_tpu.mjcf.model import TrnType
        for aid in range(c.nu):
            if int(np.asarray(c.actuator_trntype)[aid]) == TrnType.JOINT:
                self.jnt_to_act[int(trnid[aid])] = aid

    def model(self, tstate, m, key):
        ids = jnp.asarray(self.joint_ids)
        orig = m.jnt_range[ids]
        width = orig[:, 1] - orig[:, 0]
        noise = jax.random.normal(key, orig.shape, orig.dtype)
        new = orig + width[:, None] * self.relative_std * noise
        # keep ranges ordered
        lo = jnp.minimum(new[:, 0], new[:, 1])
        hi = jnp.maximum(new[:, 0], new[:, 1])
        jr = m.jnt_range.at[ids, 0].set(lo).at[ids, 1].set(hi)
        cr = m.actuator_ctrlrange
        for j in self.joint_ids.tolist():
            if j in self.jnt_to_act:
                a = self.jnt_to_act[j]
                cr = cr.at[a].set(jr[j])
        return m.replace(jnt_range=jr, actuator_ctrlrange=cr)


class RandomizedTendonRangeWrapper(Transform):
    """tendon_range widened with relative gaussian noise
    (randomizations.py:673-717)."""

    model_fields = ("tendon_range",)

    def __init__(self, env=None, relative_std=0.15):
        self.relative_std = relative_std

    def model(self, tstate, m, key):
        tr = m.tendon_range
        if tr.shape[0] == 0:
            return m
        width = tr[:, 1] - tr[:, 0]
        noise = jax.random.normal(key, tr.shape, tr.dtype)
        new = tr + width[:, None] * self.relative_std * noise
        lo = jnp.minimum(new[:, 0], new[:, 1])
        hi = jnp.maximum(new[:, 0], new[:, 1])
        return m.replace(tendon_range=tr.at[:, 0].set(lo).at[:, 1].set(hi))


# ---------------------------------------------------------------------------
# observation corruption
# ---------------------------------------------------------------------------


class RandomizeObservationWrapper(Transform):
    """noisy_<key> = obs with additive/multiplicative (per-episode) and
    uncorrelated (per-step) noise; quats get angle-axis perturbation
    (randomizations.py:314-400)."""

    def __init__(self, env=None, levels: Optional[Dict] = None):
        self.levels = dict(levels or {})

    def _key_len(self, key, obs):
        return 1 if key.endswith("_quat") else obs[key].shape[0]

    def init(self, key, env):
        # correlated per-episode biases are sampled lazily on the first
        # observation call (needs obs shapes)
        return {"key": key}

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        if not self.levels:
            return tstate, obs
        # lazily sample correlated per-episode biases on first call
        if "additive" not in tstate:
            bias_add, bias_mul = {}, {}
            bkey = tstate["key"]
            for k in sorted(self.levels):
                bkey, k1, k2 = jax.random.split(bkey, 3)
                n = self._key_len(k, obs)
                lv = self.levels[k]
                bias_add[k] = (
                    jax.random.normal(k1, (n,), env.dtype)
                    * lv.get("additive", 0.0)
                )
                bias_mul[k] = 1.0 + jax.random.normal(
                    k2, (n,), env.dtype
                ) * lv.get("multiplicative", 0.0)
            tstate = {"key": bkey, "additive": bias_add,
                      "multiplicative": bias_mul}
        for k in sorted(self.levels):
            key, k1, k2 = jax.random.split(key, 3)
            n = self._key_len(k, obs)
            lv = self.levels[k]
            uncorr = (
                jax.random.normal(k1, (n,), env.dtype)
                * lv.get("uncorrelated", 0.0)
            )
            additive = tstate["additive"][k] + uncorr
            src = f"noisy_{k}" if f"noisy_{k}" in obs else k
            v = obs[src]
            if not k.endswith("_quat"):
                v = v * tstate["multiplicative"][k] + additive
            else:
                axis = jax.random.uniform(k2, (3,), env.dtype, -1.0, 1.0)
                angle = additive[0] * QUAT_NOISE_CORRECTION
                nq = rot.quat_from_angle_and_axis(
                    angle, axis / jnp.linalg.norm(axis)
                )
                v = rot.quat_normalize(rot.quat_mul(v, nq))
            obs[f"noisy_{k}"] = v
        return tstate, obs


class ObservationDelayWrapper(Transform):
    """Group-wise gaussian observation delay over a rolling buffer with
    linear/quat/radian interpolation (randomizations.py:1032-1161)."""

    MAXLEN = 10

    def __init__(self, env=None, levels: Optional[Dict] = None):
        levels = levels or {"interpolators": {}, "groups": {}}
        self.groups = levels.get("groups", {})
        self.interpolators = levels.get("interpolators", {})
        self.obs_names = sorted(
            {n for g in self.groups.values() for n in g["obs_names"]}
        )

    def init(self, key, env):
        return {"count": jnp.zeros((), jnp.int32)}

    def _interpolate(self, name, x1, x2, t):
        kind = self.interpolators.get(name, "LinearInterpolator")
        if kind == "QuatInterpolator":
            return rot.quat_average2(x1, x2, t)
        if kind == "RadianInterpolator":
            diff = rot.normalize_angles(x2 - x1)
            return rot.normalize_angles(x2 - t * diff)
        return x1 * t + x2 * (1 - t)

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        if not self.groups:
            return tstate, obs
        if "buffers" not in tstate:
            # rolling buffer seeded with the current obs
            bufs = {
                n: jnp.tile(obs[n][None], (self.MAXLEN,) + (1,) * obs[n].ndim)
                for n in self.obs_names
            }
            tstate = {"count": jnp.ones((), jnp.int32), "buffers": bufs}
        else:
            bufs = {
                n: jnp.concatenate(
                    [tstate["buffers"][n][1:], obs[n][None]], axis=0
                )
                for n in self.obs_names
            }
            tstate = {"count": tstate["count"] + 1, "buffers": bufs}

        count = jnp.minimum(tstate["count"], self.MAXLEN)
        for gi, name in enumerate(sorted(self.groups)):
            group = self.groups[name]
            key, k = jax.random.split(key)
            delay = group["mean"] + group["std"] * jax.random.normal(k, ())
            delay = jnp.clip(delay, 0.0, (count - 1).astype(delay.dtype))
            delay_l = jnp.floor(delay).astype(jnp.int32)
            delay_h = jnp.ceil(delay).astype(jnp.int32)
            t = delay - delay_l
            for obs_name in group["obs_names"]:
                buf = tstate["buffers"][obs_name]
                obs_l = buf[self.MAXLEN - 1 - delay_l]
                obs_h = buf[self.MAXLEN - 1 - delay_h]
                obs[f"noisy_{obs_name}"] = self._interpolate(
                    obs_name, obs_h, obs_l, t
                )
        return tstate, obs


class FreezingPhasespaceMarkers(Transform):
    """Markers freeze (hold stale values) with geometric durations
    (randomizations.py:400-470)."""

    def __init__(self, env=None, key="fingertip_pos", disappear_p_1s=0.02,
                 freeze_scale_s=1.0):
        self.key = key
        step_s = env.constants.step_duration
        self._disappear_p = 1.0 - (1.0 - disappear_p_1s) ** step_s
        self._freeze_scale_steps = freeze_scale_s / step_s

    def init(self, key, env):
        return None  # lazy: needs obs shape

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        src = f"noisy_{self.key}" if f"noisy_{self.key}" in obs else self.key
        v = obs[src]
        n_markers = v.shape[0] // 3
        if tstate is None:
            tstate = {
                "freeze_left": jnp.zeros(n_markers, jnp.int32),
                "held": v.reshape(n_markers, 3),
            }
        k1, k2 = jax.random.split(key)
        start = jax.random.bernoulli(k1, self._disappear_p, (n_markers,))
        duration = jnp.ceil(
            jax.random.exponential(k2, (n_markers,)) * self._freeze_scale_steps
        ).astype(jnp.int32)
        frozen = tstate["freeze_left"] > 0
        freeze_left = jnp.where(
            frozen, tstate["freeze_left"] - 1,
            jnp.where(start, duration, 0),
        )
        cur = v.reshape(n_markers, 3)
        held = jnp.where(frozen[:, None], tstate["held"], cur)
        out = jnp.where(frozen[:, None], held, cur).reshape(-1)
        obs[f"noisy_{self.key}"] = out.astype(v.dtype)
        return {"freeze_left": freeze_left, "held": held}, obs


# ---------------------------------------------------------------------------
# action corruption
# ---------------------------------------------------------------------------


class ActionNoiseWrapper(Transform):
    """Multiplicative + additive per-episode bias, uncorrelated per-step
    noise (randomizations.py:749-782)."""

    def __init__(self, env=None, multiplicative=0.03, additive=0.03,
                 uncorrelated=0.1):
        self.multiplicative = multiplicative
        self.additive = additive
        self.uncorrelated = uncorrelated

    def init(self, key, env):
        k1, k2 = jax.random.split(key)
        n = env.action_size
        return {
            "mult": 1.0 + jax.random.normal(k1, (n,), env.dtype)
            * self.multiplicative,
            "add": jax.random.normal(k2, (n,), env.dtype) * self.additive,
        }

    def action(self, tstate, action, key, env, env_state):
        noise = jax.random.normal(key, action.shape, action.dtype)
        out = action * tstate["mult"] + tstate["add"] + noise * self.uncorrelated
        return tstate, out


class RandomizedActionLatency(Transform):
    """Per-coordinate action delay of 0..max_delay steps
    (randomizations.py:516-560)."""

    def __init__(self, env=None, max_delay=1):
        self.max_delay = max_delay

    def init(self, key, env):
        n = env.action_size
        return {
            "history": jnp.zeros((self.max_delay + 1, n), env.dtype),
            "delay": jax.random.randint(key, (n,), 0, self.max_delay + 1),
        }

    def action(self, tstate, action, key, env, env_state):
        history = jnp.concatenate(
            [action[None], tstate["history"][:-1]], axis=0
        )
        n = action.shape[0]
        new_action = history[tstate["delay"], jnp.arange(n)]
        return dict(tstate, history=history), new_action

    def observation(self, tstate, obs, key, env, env_state):
        obs = dict(obs)
        obs["action_history"] = tstate["history"][:-1].reshape(-1)
        obs["action_delay"] = tstate["delay"].astype(env.dtype)
        return tstate, obs


class RandomizedBrokenActuatorWrapper(Transform):
    """Broken actuators output 0 + white noise (randomizations.py:1163-1215).
    At most `max_broken_actuators` break (first by index, a jit-friendly
    variant of the reference's random subsampling)."""

    def __init__(self, env=None, proba_broken=0.001, max_broken_actuators=2,
                 uncorrelated=0.05):
        self.proba_broken = proba_broken
        self.max_broken = max_broken_actuators
        self.uncorrelated = uncorrelated

    def init(self, key, env):
        broken = jax.random.bernoulli(
            key, self.proba_broken, (env.action_size,)
        )
        capped = jnp.cumsum(broken.astype(jnp.int32)) <= self.max_broken
        return broken & capped

    def action(self, tstate, action, key, env, env_state):
        white = jax.random.uniform(key, action.shape, action.dtype) \
            * self.uncorrelated
        return tstate, jnp.where(tstate, white, action)


class BacklashWrapper(Transform):
    """Tendon-slack backlash integrator in control space
    (randomizations.py:785-943). Uses the Shadow-hand actuator<->joint
    coupling to convert qpos <-> ctrl."""

    COEF_DOWN_LOG = np.array([
        4.25, 4.25, 2.93, 4.25, 4.25, 4.25, 4.25, 1.92, 4.25, 3.35,
        4.25, 4.25, 4.25, 3.87, 1.39, 4.25, 1.25, 4.25, 4.25, 4.25,
    ])
    COEF_UP_LOG = np.array([
        4.25, 4.25, 4.25, 4.25, 1.86, 4.25, 4.25, 1.44, 4.25, 2.98,
        2.07, 4.25, 4.25, 2.94, 1.41, 2.82, 1.53, 4.25, 2.86, 2.10,
    ])

    def __init__(self, env=None, std=0.1):
        self.std = std
        self.hand = env.hand
        self._step_duration = env.constants.step_duration

    def init(self, key, env):
        k1, k2 = jax.random.split(key)
        down = jnp.exp(
            jnp.asarray(self.COEF_DOWN_LOG, env.dtype)
            * (1.0 + jax.random.normal(k1, (20,), env.dtype) * self.std)
        )
        up = jnp.exp(
            jnp.asarray(self.COEF_UP_LOG, env.dtype)
            * (1.0 + jax.random.normal(k2, (20,), env.dtype) * self.std)
        )
        return {
            "slack": jnp.zeros(20, env.dtype),
            "down": jnp.maximum(down, 2.0),
            "up": jnp.maximum(up, 2.0),
        }

    def action(self, tstate, action, key, env, env_state):
        from robogym_tpu.robot import shadow_hand as hand_lib

        m = env.model
        d = env_state.physics
        idx = self.hand
        # ctrl the env would apply for this action
        full_ctrl = hand_lib.denormalize_position_control(
            idx, m, d, action,
            relative_action=env.constants.relative_action,
        )
        ctrl = full_ctrl[jnp.asarray(idx.actuator_ids)]
        # reference qpos->ctrl SUMS coupled J1+J0 (randomizations.py:929-941);
        # P2C has 1.0 entries per actuated joint so the matmul sums directly
        qpos_as_ctrl = jnp.asarray(
            hand_lib.POSITION_TO_CONTROL_MATRIX, action.dtype
        ) @ hand_lib.joint_positions(idx, d)

        dt = self._step_duration
        diff = ctrl - qpos_as_ctrl
        eps = 1e-5
        incr = (
            (diff < -eps) * diff * tstate["down"] * dt
            + (diff > eps) * diff * tstate["up"] * dt
        )
        alpha = jnp.clip(
            jnp.abs(jnp.sign(diff) - tstate["slack"]) / (jnp.abs(incr) + 1e-12),
            0.0, 1.0,
        )
        new_ctrl = alpha * qpos_as_ctrl + (1.0 - alpha) * ctrl
        slack = jnp.clip(tstate["slack"] + incr, -1.0, 1.0)

        # ctrl -> normalized action (randomizations.py:922-928)
        cr = m.actuator_ctrlrange[jnp.asarray(idx.actuator_ids)]
        arange = (cr[:, 1] - cr[:, 0]) / 2.0
        if env.constants.relative_action:
            center = qpos_as_ctrl
        else:
            center = (cr[:, 1] + cr[:, 0]) / 2.0
        new_action = (new_ctrl - center) / arange
        return dict(tstate, slack=slack), new_action


class ActionDelayWrapper(Transform):
    """Fractional (sub-step) action delay
    (/root/reference/robogym/wrappers/randomizations.py:943-1031).

    The reference models a delay of `delay` ms by re-splitting the env step
    into two mj_step segments — `last_action` applied for the delay window,
    the new action for the remainder — by mutating nsubsteps/timestep per
    step. Static shapes preclude per-step substep counts under jit, so the
    TPU build applies the time-weighted blend of the two actions for the
    whole step: the same first-order plant response (position-PID target
    held at last_action for fraction f of the step), and the same DR intent
    (policies cannot rely on instantaneous action effect). Delay sampling
    (per-episode gaussian scale, per-step jitter, 5%-100% clipping) follows
    the reference exactly.
    """

    def __init__(self, env=None, delay=30.0, per_episode_std=0.1,
                 per_step_std=0.002):
        self.delay = delay
        self.per_episode_std = per_episode_std
        self.per_step_std = per_step_std
        # total env-step duration in ms (reference: timestep*nsubsteps*1000)
        self.total_length_ms = float(env.constants.step_duration) * 1000.0

    def init(self, key, env):
        ep = self.delay * (
            1.0 + jax.random.normal(key, (), env.dtype) * self.per_episode_std
        )
        return {
            "ep_delay": ep,
            "last_action": jnp.zeros(env.action_size, env.dtype),
            "has_last": jnp.zeros((), jnp.bool_),
        }

    def action(self, tstate, action, key, env, env_state):
        last = jnp.where(tstate["has_last"], tstate["last_action"], action)
        delay = tstate["ep_delay"] * (
            1.0 + jax.random.normal(key, (), action.dtype) * self.per_step_std
        )
        clipped = jnp.clip(
            delay, 0.05 * self.total_length_ms, self.total_length_ms
        )
        frac = jnp.where(delay > 1e-4, clipped / self.total_length_ms, 0.0)
        blended = frac * last + (1.0 - frac) * action
        tstate = dict(
            tstate, last_action=action, has_last=jnp.ones((), jnp.bool_)
        )
        return tstate, blended.astype(action.dtype)
