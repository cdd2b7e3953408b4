"""Smooth (unconstrained) dynamics: kinematics, CoM quantities, CRB mass
matrix, RNE bias forces, tendons, passive forces.

This is the TPU-native replacement for MuJoCo's mj_fwdPosition/mj_fwdVelocity
stages, which the reference crosses into C for on every step
(/root/reference/robogym/mujoco/simulation_interface.py:176-207).

Design notes (TPU-first):
  * Functions take a single-env (Model, Data) and are `vmap`-ed over the env
    batch by the caller; everything is static-shaped and trace-once.
  * Tree recursions (FK, velocity propagation) are unrolled Python loops over
    bodies — nbody is ~30-60, each step is a handful of 3/4-vector ops, and
    XLA fuses them into one kernel; with vmap these become (B, 3) ops.
  * CRB / RNE / Jacobians avoid per-dof tree walks: with the static ancestor
    mask `const.body_dof_mask` (nbody, nv) they become batched matmuls
    (`M = sum_b A_b^T I_b A_b`) which land on the MXU.
  * Spatial algebra uses Plücker coordinates ordered (angular, linear),
    matching MuJoCo's com-based cdof/cvel/cinert quantities.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from robogym_tpu.mjcf.model import Data, JointType, Model, TrnType, WrapType
from robogym_tpu.utils import rotation as rot


def _skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        -2,
    )


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v x m, (ang, lin) ordering."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    ang = jnp.cross(vang, mang)
    lin = jnp.cross(vang, mlin) + jnp.cross(vlin, mang)
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f, (torque, force) ordering."""
    vang, vlin = v[..., :3], v[..., 3:]
    n, fo = f[..., :3], f[..., 3:]
    torque = jnp.cross(vang, n) + jnp.cross(vlin, fo)
    force = jnp.cross(vang, fo)
    return jnp.concatenate([torque, force], axis=-1)


# ---------------------------------------------------------------------------
# Kinematics (mj_kinematics analogue)
# ---------------------------------------------------------------------------


def kinematics(m: Model, d: Data) -> Data:
    c = m.const
    xpos = [jnp.zeros(3, d.qpos.dtype)] * c.nbody
    xquat = [rot.quat_identity(d.qpos.dtype)] * c.nbody

    for bid in range(1, c.nbody):
        pid = int(c.body_parentid[bid])
        mocapid = int(c.body_mocapid[bid])
        if mocapid >= 0:
            xp = d.mocap_pos[mocapid]
            xq = rot.quat_unit(d.mocap_quat[mocapid])
        else:
            xq = rot.quat_mul(xquat[pid], m.body_quat[bid])
            xp = xpos[pid] + rot.quat_rot_vec(xquat[pid], m.body_pos[bid])
            jadr, jnum = int(c.body_jntadr[bid]), int(c.body_jntnum[bid])
            for j in range(jadr, jadr + jnum):
                jt = int(c.jnt_type[j])
                qadr = int(c.jnt_qposadr[j])
                if jt == JointType.FREE:
                    xp = d.qpos[qadr : qadr + 3]
                    xq = rot.quat_unit(d.qpos[qadr + 3 : qadr + 7])
                elif jt == JointType.BALL:
                    anchor = xp + rot.quat_rot_vec(xq, m.jnt_pos[j])
                    qloc = rot.quat_unit(d.qpos[qadr : qadr + 4])
                    xq = rot.quat_mul(xq, qloc)
                    xp = anchor - rot.quat_rot_vec(xq, m.jnt_pos[j])
                elif jt == JointType.SLIDE:
                    axis_w = rot.quat_rot_vec(xq, m.jnt_axis[j])
                    xp = xp + axis_w * (d.qpos[qadr] - m.qpos0[qadr])
                else:  # HINGE
                    anchor = xp + rot.quat_rot_vec(xq, m.jnt_pos[j])
                    angle = d.qpos[qadr] - m.qpos0[qadr]
                    qloc = rot.quat_from_angle_and_axis(angle, m.jnt_axis[j])
                    xq = rot.quat_mul(xq, qloc)
                    xp = anchor - rot.quat_rot_vec(xq, m.jnt_pos[j])
        xpos[bid] = xp
        xquat[bid] = xq

    xpos_a = jnp.stack(xpos)
    xquat_a = jnp.stack(xquat)
    xmat = rot.quat2mat(xquat_a)
    xipos = xpos_a + jnp.einsum("bij,bj->bi", xmat, m.body_ipos)
    ximat = jnp.einsum("bij,bjk->bik", xmat, rot.quat2mat(m.body_iquat))
    geom_xmat = jnp.einsum(
        "gij,gjk->gik", xmat[c.geom_bodyid], rot.quat2mat(m.geom_quat)
    )
    geom_xpos = xpos_a[c.geom_bodyid] + jnp.einsum(
        "gij,gj->gi", xmat[c.geom_bodyid], m.geom_pos
    )
    if c.nsite:
        site_xmat = jnp.einsum(
            "gij,gjk->gik", xmat[c.site_bodyid], rot.quat2mat(m.site_quat)
        )
        site_xpos = xpos_a[c.site_bodyid] + jnp.einsum(
            "gij,gj->gi", xmat[c.site_bodyid], m.site_pos
        )
    else:
        site_xpos, site_xmat = d.site_xpos, d.site_xmat

    return d.replace(
        xpos=xpos_a, xquat=xquat_a, xmat=xmat, xipos=xipos, ximat=ximat,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


def _joint_anchors_axes(m: Model, d: Data) -> Tuple[jax.Array, jax.Array]:
    """Global joint anchors (njnt,3) and axes (njnt,3)."""
    c = m.const
    bid = c.jnt_bodyid
    anchors = d.xpos[bid] + jnp.einsum("jik,jk->ji", d.xmat[bid], m.jnt_pos)
    axes = jnp.einsum("jik,jk->ji", d.xmat[bid], m.jnt_axis)
    return anchors, axes


# ---------------------------------------------------------------------------
# CoM-based quantities (mj_comPos analogue)
# ---------------------------------------------------------------------------


def com_pos(m: Model, d: Data) -> Data:
    c = m.const
    # subtree com: bottom-up mass-weighted average of xipos
    mass = m.body_mass
    msum = [jnp.zeros((), d.qpos.dtype)] * c.nbody
    mpos = [jnp.zeros(3, d.qpos.dtype)] * c.nbody
    for bid in range(c.nbody - 1, -1, -1):
        msum[bid] = msum[bid] + mass[bid]
        mpos[bid] = mpos[bid] + mass[bid] * d.xipos[bid]
        pid = int(c.body_parentid[bid])
        if bid != 0:
            msum[pid] = msum[pid] + msum[bid]
            mpos[pid] = mpos[pid] + mpos[bid]
    subtree_com = jnp.stack(
        [mp / jnp.maximum(ms, 1e-12) for mp, ms in zip(mpos, msum)]
    )
    # bodies with zero subtree mass: fall back to body frame origin
    zero = jnp.stack(msum) < 1e-12
    subtree_com = jnp.where(zero[:, None], d.xpos, subtree_com)

    root_com = subtree_com[c.body_rootid]  # (nbody, 3)

    # cinert: spatial inertia of each body about its root subtree com,
    # world orientation. 6x6 (ang, lin) ordering:
    #   [[ I_c + m S(c)S(c)^T , m S(c) ],
    #    [ m S(c)^T           , m 1    ]]   where c = xipos - root_com
    I_c = jnp.einsum(
        "bij,bj,bkj->bik", d.ximat, m.body_inertia, d.ximat
    )
    cvec = d.xipos - root_com
    S = _skew(cvec)
    mS = mass[:, None, None] * S
    eye = jnp.broadcast_to(jnp.eye(3, dtype=d.qpos.dtype), (c.nbody, 3, 3))
    top = jnp.concatenate([I_c + jnp.einsum("bij,bkj->bik", mS, S), mS], axis=-1)
    bot = jnp.concatenate(
        [jnp.swapaxes(mS, -1, -2), mass[:, None, None] * eye], axis=-1
    )
    cinert66 = jnp.concatenate([top, bot], axis=-2)  # (nbody, 6, 6)

    # cdof (nv, 6): motion axes referenced at the root subtree com
    anchors, axes = _joint_anchors_axes(m, d)
    cdof = jnp.zeros((c.nv, 6), d.qpos.dtype)
    rows = []
    for j in range(c.njnt):
        jt = int(c.jnt_type[j])
        bid = int(c.jnt_bodyid[j])
        rc = root_com[bid]
        offset = rc - anchors[j]
        if jt == JointType.FREE:
            for k in range(3):
                e = jnp.zeros(3, d.qpos.dtype).at[k].set(1.0)
                rows.append(jnp.concatenate([jnp.zeros(3, d.qpos.dtype), e]))
            for k in range(3):
                ax = d.xmat[bid][:, k]
                rows.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
        elif jt == JointType.BALL:
            for k in range(3):
                ax = d.xmat[bid][:, k]
                rows.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
        elif jt == JointType.SLIDE:
            rows.append(jnp.concatenate([jnp.zeros(3, d.qpos.dtype), axes[j]]))
        else:  # HINGE
            rows.append(jnp.concatenate([axes[j], jnp.cross(axes[j], offset)]))
    if rows:
        cdof = jnp.stack(rows)

    return d.replace(subtree_com=subtree_com, cdof=cdof, cinert=cinert66)


def crb(m: Model, d: Data) -> Data:
    """Dense joint-space mass matrix via masked batched matmuls (MXU path)."""
    c = m.const
    mask = jnp.asarray(c.body_dof_mask, d.qpos.dtype)  # (nbody, nv)
    A = mask[:, :, None] * d.cdof[None, :, :]          # (nbody, nv, 6)
    qM = jnp.einsum("bvi,bij,bwj->vw", A, d.cinert, A)
    qM = qM + jnp.diag(m.dof_armature)
    qLD = jax.scipy.linalg.cholesky(
        qM + jnp.eye(c.nv, dtype=qM.dtype) * 1e-12, lower=True
    )
    return d.replace(qM=qM, qLD=qLD)


def solve_m(d: Data, rhs: jax.Array) -> jax.Array:
    """M^-1 rhs via the cached Cholesky factor."""
    y = jax.scipy.linalg.solve_triangular(d.qLD, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(d.qLD.T, y, lower=False)


# ---------------------------------------------------------------------------
# Velocity pass + RNE (mj_comVel / mj_rne analogue)
# ---------------------------------------------------------------------------


def com_vel(m: Model, d: Data) -> Tuple[Data, jax.Array]:
    """Body com-frame velocities and cdof time-derivatives."""
    c = m.const
    cvel = [jnp.zeros(6, d.qpos.dtype)] * c.nbody
    cdofdot = [jnp.zeros(6, d.qpos.dtype)] * c.nv
    for bid in range(1, c.nbody):
        pid = int(c.body_parentid[bid])
        cv = cvel[pid]
        dadr, dnum = int(c.body_dofadr[bid]), int(c.body_dofnum[bid])
        for i in range(dadr, dadr + dnum) if dadr >= 0 else []:
            cdofdot[i] = motion_cross(cv, d.cdof[i])
            cv = cv + d.cdof[i] * d.qvel[i]
        cvel[bid] = cv
    cvel_a = jnp.stack(cvel)
    cdofdot_a = jnp.stack(cdofdot) if c.nv else jnp.zeros((0, 6), d.qpos.dtype)
    return d.replace(cvel=cvel_a), cdofdot_a


def rne(m: Model, d: Data, cdofdot: jax.Array) -> Data:
    """qfrc_bias = C(qpos, qvel): RNE with qacc = 0, gravity at the root."""
    c = m.const
    dtype = d.qpos.dtype
    # forward: bias accelerations
    grav = jnp.concatenate([jnp.zeros(3, dtype), -m.opt.gravity])
    cacc = [jnp.zeros(6, dtype)] * c.nbody
    cacc[0] = grav
    for bid in range(1, c.nbody):
        pid = int(c.body_parentid[bid])
        a = cacc[pid]
        dadr, dnum = int(c.body_dofadr[bid]), int(c.body_dofnum[bid])
        for i in range(dadr, dadr + dnum) if dadr >= 0 else []:
            a = a + cdofdot[i] * d.qvel[i]
        cacc[bid] = a
    cacc_a = jnp.stack(cacc)
    # body forces: f = I a + v x* (I v)
    Iv = jnp.einsum("bij,bj->bi", d.cinert, d.cvel)
    f = jnp.einsum("bij,bj->bi", d.cinert, cacc_a) + force_cross(d.cvel, Iv)
    # qfrc_bias[i] = cdof_i . sum_{b in subtree(body(i))} f_b
    #             = sum_b mask[b, i] * (cdof_i . f_b)
    mask = jnp.asarray(c.body_dof_mask, dtype)  # (nbody, nv)
    dots = jnp.einsum("vi,bi->bv", d.cdof, f)   # (nbody, nv)
    qfrc_bias = jnp.sum(mask * dots, axis=0)
    return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# Point Jacobians (mj_jac analogue) — used by constraints, tendons, sensors
# ---------------------------------------------------------------------------


def point_jacobian(m: Model, d: Data, point: jax.Array, bodyid: int) -> jax.Array:
    """Translational Jacobian (3, nv) of a world-frame point on a body."""
    c = m.const
    rc = d.subtree_com[int(c.body_rootid[bodyid])]
    offset = point - rc
    # v_point = cdof_lin + cdof_ang x offset ... per dof, masked by ancestry
    jac = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])
    mask = jnp.asarray(c.body_dof_mask, d.qpos.dtype)[bodyid]
    return (jac * mask[:, None]).T  # (3, nv)


def point_jacobian_dyn(m: Model, d: Data, point: jax.Array, bodyid: jax.Array) -> jax.Array:
    """Same as point_jacobian but with traced bodyid (gather on mask/root)."""
    c = m.const
    rootid = jnp.asarray(c.body_rootid)[bodyid]
    rc = d.subtree_com[rootid]
    offset = point - rc
    jac = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])
    mask = jnp.asarray(c.body_dof_mask, d.qpos.dtype)[bodyid]
    return (jac * mask[:, None]).T


def rotation_jacobian(m: Model, d: Data, bodyid: int) -> jax.Array:
    """Rotational Jacobian (3, nv) of a body."""
    c = m.const
    mask = jnp.asarray(c.body_dof_mask, d.qpos.dtype)[bodyid]
    return (d.cdof[:, :3] * mask[:, None]).T


# ---------------------------------------------------------------------------
# Tendons (mj_tendon analogue): fixed (joint-coef) and spatial (site/wrap)
# ---------------------------------------------------------------------------


def tendon(m: Model, d: Data) -> Data:
    c = m.const
    if c.ntendon == 0:
        return d
    dtype = d.qpos.dtype
    lengths = []
    jacs = []
    for t in range(c.ntendon):
        adr, num = int(c.tendon_adr[t]), int(c.tendon_num[t])
        wtypes = c.wrap_type[adr : adr + num]
        if all(wt == WrapType.JOINT for wt in wtypes):
            # fixed tendon: L = sum coef_i * qpos_i
            L = jnp.zeros((), dtype)
            J = jnp.zeros(c.nv, dtype)
            for w in range(adr, adr + num):
                jid = int(c.wrap_objid[w])
                qadr = int(c.jnt_qposadr[jid])
                dadr = int(c.jnt_dofadr[jid])
                coef = m.wrap_prm[w]
                L = L + coef * d.qpos[qadr]
                J = J.at[dadr].add(coef)
            lengths.append(L)
            jacs.append(J)
        else:
            L, J = _spatial_tendon(m, d, adr, num)
            lengths.append(L)
            jacs.append(J)
    ten_length = jnp.stack(lengths)
    ten_J = jnp.stack(jacs)
    ten_velocity = ten_J @ d.qvel
    return d.replace(ten_length=ten_length, ten_J=ten_J, ten_velocity=ten_velocity)


def _spatial_tendon(m: Model, d: Data, adr: int, num: int):
    """Spatial tendon length + jacobian: straight segments between sites with
    sphere-wrap geoms in between (MuJoCo mju_wrap semantics, sphere only)."""
    c = m.const
    dtype = d.qpos.dtype
    # collect path points: sites are fixed points; sphere wraps contribute
    # two tangent points (or none when not wrapping)
    pts = []      # (point, bodyid) — in path order; wrap contributes 2
    segments_active = []  # weight of the inner (arc) segment handled separately
    i = adr
    entries = []
    while i < adr + num:
        wt = int(c.wrap_type[i])
        oid = int(c.wrap_objid[i])
        if wt == WrapType.SITE:
            entries.append(("site", oid, None))
        elif wt == WrapType.SPHERE:
            # sidesite stored? use geom
            entries.append(("sphere", oid, None))
        elif wt == WrapType.PULLEY:
            entries.append(("pulley", -1, float(m.wrap_prm[i])))
        i += 1

    # Build the polyline: for each sphere between two endpoints compute
    # tangent points; arc length added analytically.
    L = jnp.zeros((), dtype)
    J = jnp.zeros(c.nv, dtype)
    divisor = 1.0

    def seg(p0, b0, p1, b1, scale):
        nonlocal L, J
        dvec = p1 - p0
        dist = jnp.linalg.norm(dvec) + 1e-12
        u = dvec / dist
        L_seg = dist
        J0 = point_jacobian(m, d, p0, b0)
        J1 = point_jacobian(m, d, p1, b1)
        Lc = L + L_seg * scale
        Jc = J + scale * (u @ (J1 - J0))
        L, J = Lc, Jc

    idx = 0
    n = len(entries)
    while idx < n:
        kind, oid, prm = entries[idx]
        if kind == "pulley":
            divisor = prm if prm and prm > 0 else 1.0
            idx += 1
            continue
        if kind == "site":
            # find next fixed point or wrapping geom
            if idx + 1 < n and entries[idx + 1][0] == "sphere" and idx + 2 < n:
                s_oid = entries[idx + 1][1]
                nxt_kind, nxt_oid, _ = entries[idx + 2]
                p0 = d.site_xpos[oid]
                b0 = int(c.site_bodyid[oid])
                p1 = d.site_xpos[nxt_oid]
                b1 = int(c.site_bodyid[nxt_oid])
                gc = d.geom_xpos[s_oid]
                gb = int(c.geom_bodyid[s_oid])
                r = m.geom_size[s_oid, 0]
                t0, t1, arc, wrapping = _sphere_wrap(p0, p1, gc, r)
                scale = 1.0 / divisor
                # straight-line case and wrapped case blended by `wrapping`
                # p0->t0, arc, t1->p1 (t0,t1 attached to wrap geom body)
                dvec_direct = p1 - p0
                dist_direct = jnp.linalg.norm(dvec_direct) + 1e-12
                u_dir = dvec_direct / dist_direct
                J0 = point_jacobian(m, d, p0, b0)
                J1 = point_jacobian(m, d, p1, b1)
                Jg0 = point_jacobian(m, d, t0, gb)
                Jg1 = point_jacobian(m, d, t1, gb)
                d0 = jnp.linalg.norm(t0 - p0) + 1e-12
                d1 = jnp.linalg.norm(p1 - t1) + 1e-12
                u0 = (t0 - p0) / d0
                u1 = (p1 - t1) / d1
                L_wrap = d0 + arc + d1
                J_wrap = u0 @ (Jg0 - J0) + u1 @ (J1 - Jg1)
                L_direct = dist_direct
                J_direct = u_dir @ (J1 - J0)
                L = L + scale * jnp.where(wrapping, L_wrap, L_direct)
                J = J + scale * jnp.where(wrapping, J_wrap, J_direct)
                idx += 2  # consume site + sphere; next iteration starts at nxt site
                continue
            elif idx + 1 < n and entries[idx + 1][0] == "site":
                nxt_oid = entries[idx + 1][1]
                seg(
                    d.site_xpos[oid], int(c.site_bodyid[oid]),
                    d.site_xpos[nxt_oid], int(c.site_bodyid[nxt_oid]),
                    1.0 / divisor,
                )
        idx += 1

    return L, J


def _sphere_wrap(p0, p1, center, r):
    """2D sphere wrap: tangent points, arc length, and whether wrapping occurs.

    Works in the plane through p0, p1, center. Returns world-space tangent
    points t0, t1 on the sphere, the wrapped arc length, and a bool.
    """
    dtype = p0.dtype
    a = p0 - center
    b = p1 - center
    la = jnp.linalg.norm(a) + 1e-12
    lb = jnp.linalg.norm(b) + 1e-12
    # if either endpoint is inside the sphere, no wrap (degenerate)
    # distance from center to segment
    ab = p1 - p0
    tproj = jnp.clip(jnp.dot(center - p0, ab) / (jnp.dot(ab, ab) + 1e-12), 0.0, 1.0)
    closest = p0 + tproj * ab
    dseg = jnp.linalg.norm(closest - center)
    wrapping = (dseg < r) & (la > r) & (lb > r)

    # plane basis
    ex = a / la
    bperp = b - jnp.dot(b, ex) * ex
    ey = bperp / (jnp.linalg.norm(bperp) + 1e-12)
    a2 = jnp.asarray([la, 0.0], dtype)
    b2 = jnp.asarray([jnp.dot(b, ex), jnp.dot(b, ey)], dtype)

    def tangent(p2, sgn):
        dp = jnp.linalg.norm(p2) + 1e-12
        cosq = jnp.clip(r / dp, 0.0, 1.0)
        alpha = jnp.arctan2(p2[1], p2[0])
        beta = jnp.arccos(cosq)
        ang = alpha + sgn * beta
        return r * jnp.asarray([jnp.cos(ang), jnp.sin(ang)], dtype)

    # choose tangent side: the side that keeps the path short — use the side
    # opposite to where the chord passes (sign of cross(a2,b2))
    side = jnp.sign(a2[0] * b2[1] - a2[1] * b2[0])
    side = jnp.where(side == 0, 1.0, side)
    t0_2 = tangent(a2, side)
    t1_2 = tangent(b2, -side)
    # arc between t0 and t1 going the short way
    ang0 = jnp.arctan2(t0_2[1], t0_2[0])
    ang1 = jnp.arctan2(t1_2[1], t1_2[0])
    dang = jnp.abs(
        jnp.mod(jnp.where(side > 0, ang1 - ang0, ang0 - ang1) + jnp.pi, 2 * jnp.pi)
        - jnp.pi
    )
    arc = r * dang
    t0 = center + t0_2[0] * ex + t0_2[1] * ey
    t1 = center + t1_2[0] * ex + t1_2[1] * ey
    return t0, t1, arc, wrapping


# ---------------------------------------------------------------------------
# Transmission (mj_transmission analogue)
# ---------------------------------------------------------------------------


def transmission(m: Model, d: Data) -> Tuple[Data, jax.Array]:
    """actuator_length and moment matrix (nu, nv)."""
    c = m.const
    dtype = d.qpos.dtype
    if c.nu == 0:
        return d, jnp.zeros((0, c.nv), dtype)
    lengths = []
    moments = []
    for u in range(c.nu):
        tt = int(c.actuator_trntype[u])
        tid = int(c.actuator_trnid[u])
        gear = m.actuator_gear[u, 0]
        if tt == TrnType.JOINT:
            qadr = int(c.jnt_qposadr[tid])
            dadr = int(c.jnt_dofadr[tid])
            lengths.append(gear * d.qpos[qadr])
            moments.append(jnp.zeros(c.nv, dtype).at[dadr].set(gear))
        else:  # TENDON
            lengths.append(gear * d.ten_length[tid])
            moments.append(gear * d.ten_J[tid])
    moment = jnp.stack(moments)
    d = d.replace(
        actuator_length=jnp.stack(lengths),
        actuator_velocity=moment @ d.qvel,
    )
    return d, moment


# ---------------------------------------------------------------------------
# Passive forces (mj_passive analogue)
# ---------------------------------------------------------------------------


def passive(m: Model, d: Data) -> Data:
    c = m.const
    dtype = d.qpos.dtype
    qfrc = -m.dof_damping * d.qvel
    # joint springs
    for j in range(c.njnt):
        jt = int(c.jnt_type[j])
        qadr = int(c.jnt_qposadr[j])
        dadr = int(c.jnt_dofadr[j])
        if jt in (JointType.HINGE, JointType.SLIDE):
            qfrc = qfrc.at[dadr].add(
                -m.jnt_stiffness[j] * (d.qpos[qadr] - m.jnt_springref[j])
            )
        # ball/free springs not used by the reference assets
    # tendon springs + damping
    if c.ntendon:
        spring_active = m.tendon_lengthspring >= 0
        stretch = d.ten_length - m.tendon_lengthspring
        f_spring = jnp.where(
            spring_active, -m.tendon_stiffness * stretch, jnp.zeros_like(stretch)
        )
        f_damp = -m.tendon_damping * d.ten_velocity
        qfrc = qfrc + (f_spring + f_damp) @ d.ten_J
    return d.replace(qfrc_passive=qfrc)
