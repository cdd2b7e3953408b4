"""Smooth (unconstrained) dynamics: kinematics, CoM quantities, CRB mass
matrix, RNE bias forces, tendons, passive forces.

This is the TPU-native replacement for MuJoCo's mj_fwdPosition/mj_fwdVelocity
stages, which the reference crosses into C for on every step
(/root/reference/robogym/mujoco/simulation_interface.py:176-207).

Design notes (TPU-first, round-2 vectorized form):
  * Functions take a single-env (Model, Data) and are `vmap`-ed over the env
    batch by the caller; everything is static-shaped and trace-once.
  * Tree recursions are NOT unrolled per body. Forward kinematics runs one
    batched step per tree LEVEL (bodies at equal depth advance together);
    every other tree quantity is a masked matmul against static ancestor
    masks from physics/tables.py:
      - subtree sums (com, composite inertia):   S @ x
      - velocity accumulation:                   body_dof_mask @ (cdof*qvel)
      - cdof rates:                              dof_ancestor_mask @ (...)
      - CRB mass matrix:                         (cdof @ (IC cdof)^T) * mask
    With vmap these all land on the MXU/VPU as large batched GEMMs instead
    of hundreds of latency-bound scalar ops.
  * Spatial algebra uses Plücker coordinates ordered (angular, linear),
    matching MuJoCo's com-based cdof/cvel/cinert quantities.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, JointType, Model, TrnType, WrapType
from robogym_tpu.physics import tables
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


def _cross_comps(a, b):
    """Componentwise cross product of 3-lists of (...,) arrays."""
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v x m, (ang, lin) ordering.

    Componentwise on (...,) slices: under vmap the (..., 3) cross-product
    form tiles at minor-dim 3 (~2% lane density); slice math fuses dense."""
    va = [v[..., i] for i in range(3)]
    vl = [v[..., 3 + i] for i in range(3)]
    ma = [m[..., i] for i in range(3)]
    ml = [m[..., 3 + i] for i in range(3)]
    ang = _cross_comps(va, ma)
    lin1 = _cross_comps(va, ml)
    lin2 = _cross_comps(vl, ma)
    return jnp.stack(ang + [lin1[i] + lin2[i] for i in range(3)], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f, (torque, force) ordering."""
    va = [v[..., i] for i in range(3)]
    vl = [v[..., 3 + i] for i in range(3)]
    n = [f[..., i] for i in range(3)]
    fo = [f[..., 3 + i] for i in range(3)]
    t1 = _cross_comps(va, n)
    t2 = _cross_comps(vl, fo)
    force = _cross_comps(va, fo)
    return jnp.stack([t1[i] + t2[i] for i in range(3)] + force, axis=-1)


# ---------------------------------------------------------------------------
# Kinematics (mj_kinematics analogue) — one batched step per tree level
# ---------------------------------------------------------------------------


def kinematics(m: Model, d: Data) -> Data:
    c = m.const
    dtype = d.qpos.dtype
    levels = tables.fk_levels(c)

    xpos = jnp.zeros((c.nbody, 3), dtype)
    xquat = jnp.zeros((c.nbody, 4), dtype).at[:, 0].set(1.0)

    for lvl in levels:
        bids, pids = lvl.bids, lvl.pids
        pq = xquat[pids]
        xq = rot.quat_mul(pq, m.body_quat[bids])
        xp = xpos[pids] + rot.quat_rot_vec(pq, m.body_pos[bids])

        for per_type in lvl.slots:
            for jt, (rows, jids) in per_type.items():
                sub_q = xq[rows]
                sub_p = xp[rows]
                qadr = c.jnt_qposadr[jids]
                if jt == JointType.FREE:
                    new_p = d.qpos[qadr[:, None] + np.arange(3)]
                    new_q = rot.quat_unit(
                        d.qpos[qadr[:, None] + 3 + np.arange(4)]
                    )
                elif jt == JointType.BALL:
                    jpos = m.jnt_pos[jids]
                    anchor = sub_p + rot.quat_rot_vec(sub_q, jpos)
                    qloc = rot.quat_unit(d.qpos[qadr[:, None] + np.arange(4)])
                    new_q = rot.quat_mul(sub_q, qloc)
                    new_p = anchor - rot.quat_rot_vec(new_q, jpos)
                elif jt == JointType.SLIDE:
                    axis_w = rot.quat_rot_vec(sub_q, m.jnt_axis[jids])
                    new_p = sub_p + axis_w * (
                        d.qpos[qadr] - m.qpos0[qadr]
                    )[:, None]
                    new_q = sub_q
                else:  # HINGE
                    jpos = m.jnt_pos[jids]
                    anchor = sub_p + rot.quat_rot_vec(sub_q, jpos)
                    angle = d.qpos[qadr] - m.qpos0[qadr]
                    qloc = rot.quat_from_angle_and_axis(angle, m.jnt_axis[jids])
                    new_q = rot.quat_mul(sub_q, qloc)
                    new_p = anchor - rot.quat_rot_vec(new_q, jpos)
                xq = xq.at[rows].set(new_q)
                xp = xp.at[rows].set(new_p)

        if len(lvl.mocap_rows):
            xp = xp.at[lvl.mocap_rows].set(d.mocap_pos[lvl.mocap_ids])
            xq = xq.at[lvl.mocap_rows].set(
                rot.quat_unit(d.mocap_quat[lvl.mocap_ids])
            )

        xpos = xpos.at[bids].set(xp)
        xquat = xquat.at[bids].set(xq)

    xmat = rot.quat2mat(xquat)
    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, m.body_ipos)
    ximat = jnp.einsum("bij,bjk->bik", xmat, rot.quat2mat(m.body_iquat))
    geom_xmat = jnp.einsum(
        "gij,gjk->gik", xmat[c.geom_bodyid], rot.quat2mat(m.geom_quat)
    )
    geom_xpos = xpos[c.geom_bodyid] + jnp.einsum(
        "gij,gj->gi", xmat[c.geom_bodyid], m.geom_pos
    )
    if c.nsite:
        site_xmat = jnp.einsum(
            "gij,gjk->gik", xmat[c.site_bodyid], rot.quat2mat(m.site_quat)
        )
        site_xpos = xpos[c.site_bodyid] + jnp.einsum(
            "gij,gj->gi", xmat[c.site_bodyid], m.site_pos
        )
    else:
        site_xpos, site_xmat = d.site_xpos, d.site_xmat

    return d.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
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
# CoM-based quantities (mj_comPos analogue) — subtree sums as masked matmuls
# ---------------------------------------------------------------------------


def com_pos(m: Model, d: Data) -> Data:
    c = m.const
    dtype = d.qpos.dtype
    S = jnp.asarray(tables.body_subtree_mask(c), dtype)     # (nbody, nbody)

    mass = m.body_mass
    msum = S @ mass                                          # (nbody,)
    mpos = S @ (mass[:, None] * d.xipos)                     # (nbody, 3)
    subtree_com = mpos / jnp.maximum(msum, 1e-12)[:, None]
    subtree_com = jnp.where((msum < 1e-12)[:, None], d.xpos, subtree_com)

    root_com = subtree_com[c.body_rootid]                    # (nbody, 3)

    # cinert: spatial inertia of each body about its root subtree com,
    # world orientation. 6x6 (ang, lin) ordering:
    #   [[ I_c + m S(c)S(c)^T , m S(c) ],
    #    [ m S(c)^T           , m 1    ]]   where c = xipos - root_com
    # Written COMPONENTWISE on (nbody,) vectors: under vmap, (B, nbody, 3, 3)
    # einsums tile at minor-dim 3 (~2% lane density); (B, nbody) elementwise
    # chains fuse lane-dense and the only wide write is the final (.., 36).
    R = [[d.ximat[:, i, j] for j in range(3)] for i in range(3)]
    Iv = [m.body_inertia[:, j] for j in range(3)]
    # I_c[i][k] = sum_j R[i][j] * I[j] * R[k][j]  (symmetric)
    Ic = [[sum(R[i][j] * Iv[j] * R[k][j] for j in range(3)) for k in range(3)]
          for i in range(3)]
    cvec = d.xipos - root_com
    cx = [cvec[:, 0], cvec[:, 1], cvec[:, 2]]
    z = jnp.zeros_like(cx[0])
    sk = [[z, -cx[2], cx[1]], [cx[2], z, -cx[0]], [-cx[1], cx[0], z]]
    mS = [[mass * sk[i][j] for j in range(3)] for i in range(3)]
    # top-left = I_c + (m S) S^T: [i][k] = Ic + sum_j mS[i][j] * sk[k][j]
    tl = [[Ic[i][k] + sum(mS[i][j] * sk[k][j] for j in range(3))
           for k in range(3)] for i in range(3)]
    mI = [[mass if i == k else z for k in range(3)] for i in range(3)]
    comps = []
    for i in range(3):
        comps += tl[i] + mS[i]               # rows 0..2: [I_c+mSS^T | mS]
    for i in range(3):
        comps += [mS[k][i] for k in range(3)] + mI[i]   # rows 3..5
    cinert66 = jnp.stack(comps, axis=-1).reshape(c.nbody, 6, 6)

    # cdof (nv, 6): motion axes referenced at the root subtree com —
    # one vectorized pass over all dofs via static per-dof class tables.
    anchors, axes = _joint_anchors_axes(m, d)
    dtab = tables.dof_tables(c)
    if c.nv:
        bidv = dtab["bid"]
        jidv = dtab["jid"]
        onehot = jnp.asarray(np.eye(3, dtype=np.float32)[dtab["kcol"]], dtype)
        offset = root_com[bidv] - anchors[jidv]              # (nv, 3)
        # column kcol of the body rotation for free/ball rotational dofs
        ax_col = jnp.einsum("vij,vj->vi", d.xmat[bidv], onehot)
        axes_j = axes[jidv]

        is_rot = jnp.asarray(dtab["is_rot_col"])[:, None]
        is_hinge = jnp.asarray(dtab["is_hinge"])[:, None]
        is_slide = jnp.asarray(dtab["is_slide"])[:, None]
        is_free_lin = jnp.asarray(dtab["is_free_lin"])[:, None]

        ang = jnp.where(is_rot, ax_col, jnp.where(is_hinge, axes_j, 0.0))
        lin_cross = jnp.cross(ang, offset)
        lin = jnp.where(
            is_free_lin, onehot, jnp.where(is_slide, axes_j, lin_cross)
        )
        cdof = jnp.concatenate([ang, lin], axis=-1)
    else:
        cdof = jnp.zeros((0, 6), dtype)

    return d.replace(subtree_com=subtree_com, cdof=cdof, cinert=cinert66)


def crb(m: Model, d: Data) -> Data:
    """Dense joint-space mass matrix via composite-rigid-body inertias.

    qM[i,j] (i ancestor-or-equal of j) = cdof_i^T IC[body(j)] cdof_j where
    IC[b] = sum of cinert over subtree(b). All matmuls, no (nbody, nv, 6)
    intermediate."""
    c = m.const
    dtype = d.qpos.dtype
    S = jnp.asarray(tables.body_subtree_mask(c), dtype)
    IC36 = S @ d.cinert.reshape(c.nbody, 36)                 # (nbody, 36)
    ICd = IC36[tables.dof_tables(c)["bid"]]                  # (nv, 36) static
    # F[:, i] = sum_j IC[i, j] * cdof[:, j] — componentwise (lane-dense
    # under vmap; the einsum form tiles at minor-dim 6)
    F = jnp.stack(
        [
            sum(ICd[:, 6 * i + j] * d.cdof[:, j] for j in range(6))
            for i in range(6)
        ],
        axis=-1,
    )
    qMu = d.cdof @ F.T                                       # (nv, nv)
    A = jnp.asarray(tables.dof_ancestor_or_self_upper(c), dtype)
    qMm = qMu * A
    qM = qMm + qMm.T - jnp.diag(jnp.diag(qMm))
    qM = qM + jnp.diag(m.dof_armature)
    # NOTE: no Cholesky here — the forward pipeline computes the explicit
    # M^-1 once per substep (fused Pallas kernel on TPU); d.qLD stays at its
    # placeholder value and solve_m factors on demand for out-of-pipeline
    # callers.
    return d.replace(qM=qM)


def solve_m(d: Data, rhs: jax.Array) -> jax.Array:
    """M^-1 rhs (factors qM on demand; not on the hot path)."""
    qLD = jax.scipy.linalg.cholesky(
        d.qM + jnp.eye(d.qM.shape[0], dtype=d.qM.dtype) * 1e-12, lower=True
    )
    y = jax.scipy.linalg.solve_triangular(qLD, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(qLD.T, y, lower=False)


# ---------------------------------------------------------------------------
# Velocity pass + RNE (mj_comVel / mj_rne analogue) — masked matmuls
# ---------------------------------------------------------------------------


def com_vel(m: Model, d: Data) -> Tuple[Data, jax.Array]:
    """Body com-frame velocities and cdof time-derivatives."""
    c = m.const
    dtype = d.qpos.dtype
    if c.nv == 0:
        return d.replace(cvel=jnp.zeros((c.nbody, 6), dtype)), jnp.zeros(
            (0, 6), dtype
        )
    vterm = d.cdof * d.qvel[:, None]                         # (nv, 6)
    mask = jnp.asarray(c.body_dof_mask, dtype)               # (nbody, nv)
    cvel = mask @ vterm                                      # (nbody, 6)
    # velocity "seen" by dof i = contributions of its strict ancestor dofs
    D = jnp.asarray(tables.dof_ancestor_mask(c), dtype)      # (nv, nv)
    vpred = D @ vterm                                        # (nv, 6)
    cdofdot = motion_cross(vpred, d.cdof)
    return d.replace(cvel=cvel), cdofdot


def rne(m: Model, d: Data, cdofdot: jax.Array) -> Data:
    """qfrc_bias = C(qpos, qvel): RNE with qacc = 0, gravity at the root."""
    c = m.const
    dtype = d.qpos.dtype
    grav = jnp.concatenate([jnp.zeros(3, dtype), -m.opt.gravity])
    mask = jnp.asarray(c.body_dof_mask, dtype)               # (nbody, nv)
    cacc = grav[None, :] + mask @ (cdofdot * d.qvel[:, None])
    # body forces: f = I a + v x* (I v), componentwise (see motion_cross)
    cin = [[d.cinert[:, i, j] for j in range(6)] for i in range(6)]

    def apply_I(x):
        return jnp.stack(
            [sum(cin[i][j] * x[:, j] for j in range(6)) for i in range(6)],
            axis=-1,
        )

    Iv = apply_I(d.cvel)
    f = apply_I(cacc) + force_cross(d.cvel, Iv)
    # qfrc_bias[i] = cdof_i . sum_{b in subtree(body(i))} f_b
    dots = jnp.einsum("vi,bi->bv", d.cdof, f)                # (nbody, nv)
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
    tt = tables.tendon_tables(c)

    ten_length = jnp.zeros(c.ntendon, dtype)
    ten_J = jnp.zeros((c.ntendon, c.nv), dtype)

    # fixed tendons: L_t = sum_w coef_w * qpos[qadr_w] — one scatter-add
    if len(tt["w_t"]):
        coef = m.wrap_prm[tt["w_i"]]
        ten_length = ten_length.at[tt["w_t"]].add(coef * d.qpos[tt["w_q"]])
        ten_J = ten_J.at[tt["w_t"], tt["w_d"]].add(coef)

    # spatial tendons (site paths with sphere wraps): per-tendon host loop —
    # none exist in the shipped robogym assets' hot envs, small count
    for t in tt["spatial"]:
        adr, num = int(c.tendon_adr[t]), int(c.tendon_num[t])
        L, J = _spatial_tendon(m, d, adr, num)
        ten_length = ten_length.at[t].set(L)
        ten_J = ten_J.at[t].set(J)

    ten_velocity = ten_J @ d.qvel
    return d.replace(ten_length=ten_length, ten_J=ten_J, ten_velocity=ten_velocity)


def _spatial_tendon(m: Model, d: Data, adr: int, num: int):
    """Spatial tendon length + jacobian: straight segments between sites with
    sphere-wrap geoms in between (MuJoCo mju_wrap semantics, sphere only)."""
    c = m.const
    dtype = d.qpos.dtype
    i = adr
    entries = []
    while i < adr + num:
        wt = int(c.wrap_type[i])
        oid = int(c.wrap_objid[i])
        if wt == WrapType.SITE:
            entries.append(("site", oid, None))
        elif wt == WrapType.SPHERE:
            entries.append(("sphere", oid, None))
        elif wt == WrapType.PULLEY:
            entries.append(("pulley", -1, float(m.wrap_prm[i])))
        i += 1

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
# Transmission (mj_transmission analogue) — static scatter tables
# ---------------------------------------------------------------------------


def transmission(m: Model, d: Data) -> Tuple[Data, jax.Array]:
    """actuator_length and moment matrix (nu, nv)."""
    c = m.const
    dtype = d.qpos.dtype
    if c.nu == 0:
        return d, jnp.zeros((0, c.nv), dtype)
    tr = tables.transmission_tables(c)
    gear = m.actuator_gear[:, 0]
    lengths = jnp.zeros(c.nu, dtype)
    moment = jnp.zeros((c.nu, c.nv), dtype)
    if len(tr["uj"]):
        gj = gear[tr["uj"]]
        lengths = lengths.at[tr["uj"]].set(gj * d.qpos[tr["uj_q"]])
        moment = moment.at[tr["uj"]].set(
            gj[:, None] * jnp.asarray(tr["onehot"], dtype)
        )
    if len(tr["ut"]):
        gt = gear[tr["ut"]]
        lengths = lengths.at[tr["ut"]].set(gt * d.ten_length[tr["ut_t"]])
        moment = moment.at[tr["ut"]].set(gt[:, None] * d.ten_J[tr["ut_t"]])
    d = d.replace(
        actuator_length=lengths,
        actuator_velocity=moment @ d.qvel,
    )
    return d, moment


# ---------------------------------------------------------------------------
# Passive forces (mj_passive analogue) — vectorized joint springs
# ---------------------------------------------------------------------------


def passive(m: Model, d: Data) -> Data:
    c = m.const
    qfrc = -m.dof_damping * d.qvel
    st = tables.scalar_joint_tables(c)
    if len(st["jid"]):
        jids, qadr, dadr = st["jid"], st["qadr"], st["dadr"]
        f = -m.jnt_stiffness[jids] * (d.qpos[qadr] - m.jnt_springref[jids])
        qfrc = qfrc.at[dadr].add(f)
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
