"""forward() / step() — the TPU-native mj_forward / mj_step.

The reference steps physics via `sim.step()` -> C mj_step with nsubsteps
(/root/reference/robogym/mujoco/simulation_interface.py:176-189). Here a
whole env step (nsubsteps substeps) is one `lax.scan` inside a single jitted
function, vmapped over the env batch.

Pipeline per substep (MuJoCo Euler pipeline order):
  kinematics -> com quantities -> CRB/factor -> tendons -> transmission
  -> velocity pass -> RNE bias -> actuation -> passive
  -> collision -> constraints -> integrate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from robogym_tpu.mjcf.model import Data, JointType, Model
from robogym_tpu.physics import actuation as actuation_lib
from robogym_tpu.physics import constraint as constraint_lib
from robogym_tpu.physics import factor_kernel
from robogym_tpu.physics import smooth
from robogym_tpu.physics import tables
from robogym_tpu.physics.collision import driver as collision_driver
from robogym_tpu.utils import rotation as rot


def fwd_position(m: Model, d: Data) -> Data:
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.crb(m, d)
    d = smooth.tendon(m, d)
    d = collision_driver.collision(m, d, m.opt.group_cap)
    return d


def fwd_velocity(m: Model, d: Data):
    d, cdofdot = smooth.com_vel(m, d)
    d = smooth.rne(m, d, cdofdot)
    return d


def forward_tail(m: Model, d: Data, qfrc_smooth: jax.Array) -> Data:
    """Explicit (unfused) dynamics tail: M^-1, qacc_smooth, constraint
    solve. Used by standalone forward() and the non-CG/no-contact step."""
    # explicit M^-1 computed once per substep; reused for qacc_smooth, the
    # constraint regularizer, and the CG preconditioner (matmuls instead of
    # repeated batched triangular solves). Under vmap on TPU this dispatches
    # to the fused Pallas factor kernel (physics/factor_kernel.py).
    Minv = factor_kernel.spd_inverse(d.qM)
    qacc_smooth = Minv @ qfrc_smooth
    d = d.replace(qacc_smooth=qacc_smooth)
    d = constraint_lib.solve(m, d, qfrc_smooth, Minv)
    return d


def forward(m: Model, d: Data) -> Data:
    """Full forward dynamics: fills every derived field incl. qacc."""
    d = fwd_position(m, d)
    d, moment = smooth.transmission(m, d)
    d = fwd_velocity(m, d)
    d = actuation_lib.actuation(m, d, moment)
    d = smooth.passive(m, d)
    qfrc_smooth = (
        d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied - d.qfrc_bias
        + _xfrc_to_qfrc(m, d)
    )
    return forward_tail(m, d, qfrc_smooth)


def _xfrc_to_qfrc(m: Model, d: Data) -> jax.Array:
    """Map body cartesian wrenches (xfrc_applied) into joint space.

    qfrc[v] = sum_b mask[b,v] * (jac_lin[b,v]·f_b + jac_rot[b,v]·tau_b)
    with jac_lin[b,v] = cdof_lin[v] + cdof_ang[v] x offset_b. Expanding the
    cross product turns the whole map into three (nv, nbody) matmuls on
    per-body 3-vectors — no (nbody, nv, 3) intermediate (which tiles at ~2%
    density on TPU and dominated this helper's cost)."""
    c = m.const
    if c.nbody == 0:
        return jnp.zeros(c.nv, d.qpos.dtype)
    mask = jnp.asarray(c.body_dof_mask, d.qpos.dtype)  # (nbody, nv)
    rc = d.subtree_com[c.body_rootid]                  # (nbody, 3)
    offset = d.xipos - rc
    torque, force = d.xfrc_applied[:, :3], d.xfrc_applied[:, 3:]
    # cdof_ang·(offset x f) == (cdof_ang x offset)·f  (scalar triple product)
    Fm = mask.T @ force                                # (nv, 3)
    Cm = mask.T @ jnp.cross(offset, force)
    Tm = mask.T @ torque
    return (
        jnp.sum(d.cdof[:, 3:] * Fm, axis=-1)
        + jnp.sum(d.cdof[:, :3] * (Cm + Tm), axis=-1)
    )


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """qpos += qvel * dt with quaternion handling (mj_integratePos).

    Scalar (hinge/slide) dofs advance in one vectorized scatter; the few
    quaternion joints (free/ball) are batched by static index tables."""
    c = m.const
    st = tables.scalar_joint_tables(c)
    out = qpos
    if len(st["qadr"]):
        out = out.at[st["qadr"]].add(qvel[st["dadr"]] * dt)
    quat_joints = st["quat"]
    if quat_joints:
        import numpy as np

        free = [(q, dd) for jt, q, dd in quat_joints if jt == JointType.FREE]
        ball = [(q, dd) for jt, q, dd in quat_joints if jt == JointType.BALL]
        if free:
            qadr = np.asarray([q for q, _ in free], np.int32)
            dadr = np.asarray([dd for _, dd in free], np.int32)
            out = out.at[qadr[:, None] + np.arange(3)].add(
                qvel[dadr[:, None] + np.arange(3)] * dt
            )
            q_old = qpos[qadr[:, None] + 3 + np.arange(4)]
            w = qvel[dadr[:, None] + 3 + np.arange(3)]
            out = out.at[qadr[:, None] + 3 + np.arange(4)].set(
                rot.quat_integrate(q_old, w, dt)
            )
        if ball:
            qadr = np.asarray([q for q, _ in ball], np.int32)
            dadr = np.asarray([dd for _, dd in ball], np.int32)
            q_old = qpos[qadr[:, None] + np.arange(4)]
            w = qvel[dadr[:, None] + np.arange(3)]
            out = out.at[qadr[:, None] + np.arange(4)].set(
                rot.quat_integrate(q_old, w, dt)
            )
    return out


def euler(m: Model, d: Data) -> Data:
    """Semi-implicit Euler with implicit joint damping (MuJoCo mj_Euler):
    qvel += dt * (M + dt*diag(damping))^-1 * qfrc_total(qvel)."""
    dt = m.opt.timestep
    # implicit damping stabilizes the stiff PID + damping combination;
    # actuator velocity-feedback gains (cascaded-PI Kvp) fold in too —
    # explicit integration of Kvp=70 on ~0.06 kg*m^2 wrist dofs limit-cycles
    qfrc_total = d.qM @ d.qacc  # == qfrc_smooth + qfrc_constraint
    M_imp = d.qM + dt * jnp.diag(m.dof_damping + d.act_vel_damping)
    Minv_imp = factor_kernel.spd_inverse(M_imp)
    qacc_imp = Minv_imp @ qfrc_total
    # one iterative-refinement step recovers cho_solve-level accuracy from
    # the explicit-inverse apply (two extra matvecs)
    qacc_imp = qacc_imp + Minv_imp @ (qfrc_total - M_imp @ qacc_imp)
    qvel_new = d.qvel + dt * qacc_imp
    qpos_new = integrate_pos(m, d.qpos, qvel_new, dt)
    return d.replace(
        qpos=qpos_new, qvel=qvel_new, time=d.time + dt
    )


def step(m: Model, d: Data) -> Data:
    """One physics substep: forward dynamics + Euler integration.

    On the contact-CG hot path the implicit-damping Euler velocity update is
    fused INTO the constraint kernel (constraint.solve euler_args) — the
    qM@qacc / Minv_imp micro-GEMM chain runs in VMEM next to the CG loop.
    Only qpos integration (quaternion math on a handful of joints) remains
    outside."""
    d = fwd_position(m, d)
    d, moment = smooth.transmission(m, d)
    d = fwd_velocity(m, d)
    d = actuation_lib.actuation(m, d, moment)
    d = smooth.passive(m, d)
    qfrc_smooth = (
        d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied - d.qfrc_bias
        + _xfrc_to_qfrc(m, d)
    )
    dt = m.opt.timestep
    res = constraint_lib.solve_fused_step(m, d, qfrc_smooth)
    if res is None:
        # Newton solver / no contact slots: explicit sequence
        d = forward_tail(m, d, qfrc_smooth)
        return euler(m, d)
    d, qvel_new = res
    qpos_new = integrate_pos(m, d.qpos, qvel_new, dt)
    return d.replace(qpos=qpos_new, qvel=qvel_new, time=d.time + dt)


def step_n(m: Model, d: Data, n: int) -> Data:
    """`n` substeps under lax.scan (the reference's sim.step(nsubsteps)).

    ROBOGYM_TPU_SUBSTEP_UNROLL (trace-time static) unrolls the scan body,
    trading compile time for cross-substep scheduling freedom."""
    import os

    unroll = int(os.environ.get("ROBOGYM_TPU_SUBSTEP_UNROLL", "1"))

    def body(carry, _):
        return step(m, carry), ()

    d, _ = jax.lax.scan(body, d, None, length=n, unroll=min(unroll, n))
    return d
