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
    """Static partition of actuator ids: (pid_ids, pid_actadr, cas_ids,
    cas_actadr, plain_ids, plain_affine_mask). Cached on the ModelConst.

    user[0] == 1 selects the cascaded-PI controller, matching mujoco-py's
    dispatch in mjpid.pyx (see calibration XML comment
    assets/xmls/robot/ur16e/jointspec/calibrations/cascaded_pi/
    joint_actuations.xml:4)."""
    key = "_actuation_partition"
    cached = getattr(c, key, None)
    if cached is not None:
        return cached
    gt = np.asarray(c.actuator_gaintype)
    bt = np.asarray(c.actuator_biastype)
    user = np.asarray(c.actuator_user)
    is_user = (gt == GainType.USER) | (bt == BiasType.USER)
    is_cas = is_user & (user == 1.0)
    is_pid = is_user & ~is_cas
    pid_ids = np.nonzero(is_pid)[0].astype(np.int32)
    cas_ids = np.nonzero(is_cas)[0].astype(np.int32)
    plain_ids = np.nonzero(~is_user)[0].astype(np.int32)
    pid_actadr = np.asarray(c.actuator_actadr)[pid_ids].astype(np.int32)
    cas_actadr = np.asarray(c.actuator_actadr)[cas_ids].astype(np.int32)
    plain_affine = (bt[plain_ids] == BiasType.AFFINE)
    out = (pid_ids, pid_actadr, cas_ids, cas_actadr, plain_ids, plain_affine)
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
    (pid_ids, pid_actadr, cas_ids, cas_actadr,
     plain_ids, plain_affine) = _actuator_partition(c)
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

    if len(cas_ids):
        # Cascaded PI position->velocity controller (mujoco-py mjpid.pyx,
        # user="1"): gainprm = [Kp, Ti, iClamp, _, _, Kvp, Tiv, iClamp_v,
        # ema_smooth, max_vel]. act slots: [pos_integral, vel_integral,
        # smoothed_des_vel, prev_err].
        ids = jnp.asarray(cas_ids)
        aadr = jnp.asarray(cas_actadr)
        gp = m.actuator_gainprm[ids]
        kp, ti, iclamp = gp[:, 0], gp[:, 1], gp[:, 2]
        kvp, tiv, iclamp_v = gp[:, 5], gp[:, 6], gp[:, 7]
        ema, max_vel = gp[:, 8], gp[:, 9]

        length = d.actuator_length[ids]
        velocity = d.actuator_velocity[ids]
        int_pos = d.act[aadr]
        int_vel = d.act[aadr + 1]
        smooth_prev = d.act[aadr + 2]

        # position PI -> desired velocity
        error = ctrl[ids] - length
        int_pos = int_pos + error * dt
        ip_limit = jnp.where(ti > 1e-12, iclamp * ti / jnp.maximum(kp, 1e-12), 0.0)
        int_pos = jnp.clip(int_pos, -ip_limit, ip_limit)
        iterm_pos = jnp.where(ti > 1e-12, kp * int_pos / jnp.maximum(ti, 1e-12), 0.0)
        des_vel = kp * error + iterm_pos
        # EMA smoothing + velocity limit
        des_vel = ema * smooth_prev + (1.0 - ema) * des_vel
        smooth_new = des_vel
        des_vel = jnp.clip(des_vel, -max_vel, max_vel)

        # velocity PI -> force. The integral accumulates in rad and is
        # clamped DIRECTLY to +-kvi_clamp (calibration XML naming:
        # "kvp kvi kvi_clamp"); its torque contribution is Kvp/Tiv *
        # integral. The previous term-level clamp capped the integral
        # torque at ~1 N*m — the UR16e shoulder needs ~100 N*m of
        # steady-state gravity torque, which only the integral can supply
        # (P-term alone left 0.1-0.3 rad of sag under zero action).
        verror = des_vel - velocity
        int_vel = int_vel + verror * dt
        int_vel = jnp.clip(int_vel, -iclamp_v, iclamp_v)
        iterm_vel = jnp.where(
            tiv > 1e-12, kvp * int_vel / jnp.maximum(tiv, 1e-12), 0.0
        )
        f_cas = kvp * verror + iterm_vel

        force = force.at[ids].set(f_cas)
        act_new = (
            act_new.at[aadr].set(int_pos)
            .at[aadr + 1].set(int_vel)
            .at[aadr + 2].set(smooth_new)
            .at[aadr + 3].set(error)
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

    # velocity-feedback damping (|df/dqvel|) for the implicit Euler solve:
    # cascaded-PI contributes Kvp per actuator (f = Kvp*(des_vel - vel))
    act_vel_damping = jnp.zeros(c.nv, dtype)
    if len(cas_ids):
        kvp_all = m.actuator_gainprm[jnp.asarray(cas_ids), 5]
        mom2 = moment[jnp.asarray(cas_ids)] ** 2        # (C, nv)
        act_vel_damping = act_vel_damping + (kvp_all[:, None] * mom2).sum(0)

    return d.replace(
        actuator_force=force, qfrc_actuator=qfrc_actuator, act=act_new,
        ctrl=d.ctrl, act_vel_damping=act_vel_damping,
    )
