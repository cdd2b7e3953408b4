"""Actuation: fixed-gain / affine actuators and the user-gain PID position
controller.

The reference's hot loop runs mujoco-py's Cython `cymj.set_pid_control`
controller for every `gaintype="user" biastype="user"` actuator (enabled at
/root/reference/robogym/mujoco/simulation_interface.py:86-88). Its six user
gain parameters are, in order (reference
/root/reference/robogym/mujoco/constants.py:36-53):

    0 proportional gain Kp
    1 integral time constant Ti
    2 integral max clamp (clamps the integral *term* contribution)
    3 derivative time constant Td
    4 derivative gain smoothing (EMA coefficient on the derivative)
    5 error deadband

Controller state is threaded through `Data.act` as three slots per PID
actuator: [integral_error, previous_error, smoothed_derivative]. The whole
update is vectorized over actuators (static id partition by gain type) —
one fused VPU kernel per substep instead of a Python->Cython boundary per
actuator.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from robogym_tpu.mjcf.model import BiasType, Data, GainType, Model


def _actuator_partition(c):
    """Static partition of actuator ids: (pid_ids, pid_actadr, plain_ids,
    plain_affine_mask). Cached on the ModelConst object."""
    key = "_actuation_partition"
    cached = getattr(c, key, None)
    if cached is not None:
        return cached
    gt = np.asarray(c.actuator_gaintype)
    bt = np.asarray(c.actuator_biastype)
    is_pid = (gt == GainType.USER) | (bt == BiasType.USER)
    pid_ids = np.nonzero(is_pid)[0].astype(np.int32)
    plain_ids = np.nonzero(~is_pid)[0].astype(np.int32)
    pid_actadr = np.asarray(c.actuator_actadr)[pid_ids].astype(np.int32)
    plain_affine = (bt[plain_ids] == BiasType.AFFINE)
    out = (pid_ids, pid_actadr, plain_ids, plain_affine)
    object.__setattr__(c, key, out)
    return out


def actuation(m: Model, d: Data, moment: jax.Array) -> Data:
    """Compute actuator forces and qfrc_actuator; also the act state deriv."""
    c = m.const
    dtype = d.qpos.dtype
    if c.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros(c.nv, dtype))

    ctrl = d.ctrl
    # clamp ctrl to ctrlrange where limited
    limited = jnp.asarray(c.actuator_ctrllimited)
    ctrl = jnp.where(
        limited,
        jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
        ctrl,
    )

    dt = m.opt.timestep
    pid_ids, pid_actadr, plain_ids, plain_affine = _actuator_partition(c)
    force = jnp.zeros(c.nu, dtype)
    act_new = d.act

    if len(pid_ids):
        ids = jnp.asarray(pid_ids)
        aadr = jnp.asarray(pid_actadr)
        gp = m.actuator_gainprm[ids]               # (P, >=6)
        kp, ti, imax, td, dsmooth, deadband = (
            gp[:, 0], gp[:, 1], gp[:, 2], gp[:, 3], gp[:, 4], gp[:, 5]
        )
        length = d.actuator_length[ids]

        integral = d.act[aadr]
        prev_err = d.act[aadr + 1]
        dsm_prev = d.act[aadr + 2]

        error = ctrl[ids] - length
        error = jnp.where(jnp.abs(error) < deadband, 0.0, error)

        integral = integral + error * dt
        # clamp so the integral term (Kp * integral / Ti) stays in +-imax
        iterm_limit = jnp.where(
            ti > 1e-12, imax * ti / jnp.maximum(kp, 1e-12), 0.0
        )
        integral = jnp.clip(integral, -iterm_limit, iterm_limit)

        deriv_raw = (error - prev_err) / jnp.maximum(dt, 1e-12)
        dsm = dsmooth * dsm_prev + (1.0 - dsmooth) * deriv_raw

        iterm = jnp.where(
            ti > 1e-12, kp * integral / jnp.maximum(ti, 1e-12), 0.0
        )
        f_pid = kp * error + iterm + kp * td * dsm

        force = force.at[ids].set(f_pid)
        act_new = (
            act_new.at[aadr].set(integral)
            .at[aadr + 1].set(error)
            .at[aadr + 2].set(dsm)
        )

    if len(plain_ids):
        ids = jnp.asarray(plain_ids)
        gain = m.actuator_gainprm[ids, 0]
        f = gain * ctrl[ids]
        bias = (
            m.actuator_biasprm[ids, 0]
            + m.actuator_biasprm[ids, 1] * d.actuator_length[ids]
            + m.actuator_biasprm[ids, 2] * d.actuator_velocity[ids]
        )
        f = f + jnp.where(jnp.asarray(plain_affine), bias, 0.0)
        force = force.at[ids].set(f)

    flimited = jnp.asarray(c.actuator_forcelimited)
    force = jnp.where(
        flimited,
        jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]),
        force,
    )
    qfrc_actuator = moment.T @ force
    return d.replace(
        actuator_force=force, qfrc_actuator=qfrc_actuator, act=act_new, ctrl=d.ctrl
    )
