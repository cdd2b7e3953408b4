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

Here the controller state is threaded through `Data.act` as three slots per
PID actuator: [integral_error, previous_error, smoothed_derivative]. The
update runs inside the jitted substep loop — one fused kernel instead of a
Python->Cython boundary per actuator per substep.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from robogym_tpu.mjcf.model import BiasType, Data, GainType, Model


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

    forces = []
    act_new = d.act
    for u in range(c.nu):
        gt = int(c.actuator_gaintype[u])
        bt = int(c.actuator_biastype[u])
        length = d.actuator_length[u]
        velocity = d.actuator_velocity[u]
        if gt == GainType.USER or bt == BiasType.USER:
            # mujoco-py PID position servo (semantics per constants.py:36-46)
            aadr = int(c.actuator_actadr[u])
            kp = m.actuator_gainprm[u, 0]
            ti = m.actuator_gainprm[u, 1]
            imax = m.actuator_gainprm[u, 2]
            td = m.actuator_gainprm[u, 3]
            dsmooth = m.actuator_gainprm[u, 4]
            deadband = m.actuator_gainprm[u, 5]

            integral = d.act[aadr]
            prev_err = d.act[aadr + 1]
            dsm_prev = d.act[aadr + 2]

            error = ctrl[u] - length
            error = jnp.where(jnp.abs(error) < deadband, 0.0, error)

            integral = integral + error * dt
            # clamp so the integral term (Kp * integral / Ti) stays in +-imax
            iterm_limit = jnp.where(ti > 1e-12, imax * ti / jnp.maximum(kp, 1e-12), 0.0)
            integral = jnp.clip(integral, -iterm_limit, iterm_limit)

            deriv_raw = (error - prev_err) / jnp.maximum(dt, 1e-12)
            dsm = dsmooth * dsm_prev + (1.0 - dsmooth) * deriv_raw

            iterm = jnp.where(ti > 1e-12, kp * integral / jnp.maximum(ti, 1e-12), 0.0)
            f = kp * error + iterm + kp * td * dsm

            act_new = act_new.at[aadr].set(integral)
            act_new = act_new.at[aadr + 1].set(error)
            act_new = act_new.at[aadr + 2].set(dsm)
        else:
            gain = m.actuator_gainprm[u, 0]
            f = gain * ctrl[u]
            if bt == BiasType.AFFINE:
                f = f + (
                    m.actuator_biasprm[u, 0]
                    + m.actuator_biasprm[u, 1] * length
                    + m.actuator_biasprm[u, 2] * velocity
                )
        forces.append(f)

    force = jnp.stack(forces)
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
