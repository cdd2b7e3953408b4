"""Soft-constraint assembly + primal Newton solver.

Implements MuJoCo's constraint model (solref/solimp impedances, pyramidal
friction cones, limits, equality welds, dof friction loss) as a primal
optimization over qacc:

    min_x 1/2 (x - qacc_smooth)^T M (x - qacc_smooth) + sum_i cost_i(J_i x - aref_i)

with per-row quadratic (equality), one-sided quadratic (limits/contacts),
and Huber (friction loss) penalties — the objective MuJoCo's Newton solver
minimizes. Fixed Newton iterations with a candidate line search: every env
in the batch executes the same instruction stream (no data-dependent control
flow), so the whole solve jits into batched GEMMs + an (nv x nv) Cholesky
per iteration — MXU work.

Contact rows are emitted vectorized per condim class: the collision driver
guarantees a static slot layout (robogym_tpu/physics/collision/driver.py
contact_slot_layout) with traced geom ids, so jacobian construction is pure
gather + einsum.

Randomizers mutate the same solref/solimp fields the reference touches
(/root/reference/robogym/randomization/sim.py:182-314); impedance semantics
mirror MuJoCo's mj_makeImpedance.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, EqType, JointType, Model
from robogym_tpu.physics import smooth
from robogym_tpu.physics import tables
from robogym_tpu.physics.collision import driver as collision_driver
from robogym_tpu.utils import rotation as rot

BIG = 1e10

# row kinds
EQ = 0        # two-sided quadratic
ONESIDED = 1  # active when jar < 0
FRICTION = 2  # Huber, bound = floss


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
    """MuJoCo mj_makeImpedance: position-dependent impedance d(r) in (0,1)."""
    d0 = jnp.clip(solimp[..., 0], 0.0001, 0.9999)
    dmax = jnp.clip(solimp[..., 1], 0.0001, 0.9999)
    width = jnp.maximum(solimp[..., 2], 1e-10)
    mid = jnp.clip(solimp[..., 3], 0.0001, 0.9999)
    power = jnp.maximum(solimp[..., 4], 1.0)

    x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(
        x <= mid, a * jnp.power(x, power), 1.0 - b * jnp.power(1.0 - x, power)
    )
    return d0 + y * (dmax - d0)


def _ref_kb(solref: jax.Array, solimp: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Stiffness/damping accelerations from solref (standard or direct).

    MuJoCo mj_makeRef uses the ROW's max impedance dmax = solimp[1] in the
    K/B formulas (B = 2/(dmax*tc), K = 1/(dmax^2 tc^2 dr^2)) — a hardcoded
    0.9999 here made every aref ~dmax/0.9999 of MuJoCo's (the residual hand
    conformance gap: friction rows were off by exactly 0.95x)."""
    timeconst = solref[..., 0]
    dampratio = solref[..., 1]
    dmax = jnp.clip(solimp[..., 1], 0.0001, 0.9999)
    standard = timeconst > 0
    b_std = 2.0 / jnp.maximum(dmax * timeconst, 1e-10)
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-10
    )
    b = jnp.where(standard, b_std, -dampratio)
    k = jnp.where(standard, k_std, -timeconst)
    return k, b


def _point_jac_batch(m: Model, d: Data, points: jax.Array, bodyids: jax.Array):
    """Translational point jacobians for a batch of (point, bodyid):
    returns (S, nv, 3)."""
    c = m.const
    rootid = jnp.asarray(c.body_rootid)[bodyids]
    rc = d.subtree_com[rootid]                      # (S, 3)
    offset = points - rc                            # (S, 3)
    jac = d.cdof[None, :, 3:] + jnp.cross(
        d.cdof[None, :, :3], offset[:, None, :]
    )                                               # (S, nv, 3)
    mask = jnp.asarray(c.body_dof_mask, d.qpos.dtype)[bodyids]  # (S, nv)
    return jac * mask[:, :, None]


def _rot_jac_batch(m: Model, d: Data, bodyids: jax.Array):
    c = m.const
    mask = jnp.asarray(c.body_dof_mask, d.qpos.dtype)[bodyids]
    return d.cdof[None, :, :3] * mask[:, :, None]   # (S, nv, 3)


def scalar_blocks(m: Model, d: Data):
    """Non-contact constraint rows: equality, dof friction, joint limits,
    tendon limits. Returns (J, pos, solref, solimp, floss, active, kind_np,
    diagA_np) with kind_np/diagA_np STATIC numpy arrays. diagA is MuJoCo's
    mj_diagApprox drawn from the compile-time *_invweight0 constants
    (physics/setconst.py), NOT the instantaneous diag(J M^-1 J^T)."""
    from robogym_tpu.physics.setconst import invweight0

    c = m.const
    dtype = d.qpos.dtype
    nv = c.nv
    dof_iw0, body_iw0, ten_iw0 = invweight0(m)

    J_rows: List[jax.Array] = []
    diagA_rows: List[float] = []
    pos_rows: List[jax.Array] = []
    solref_rows: List[jax.Array] = []
    solimp_rows: List[jax.Array] = []
    kind_rows: List[int] = []
    floss_rows: List[jax.Array] = []
    active_rows: List[jax.Array] = []

    # ---- equality constraints
    for e in range(c.neq):
        et = int(c.eq_type[e])
        o1, o2 = int(c.eq_obj1id[e]), int(c.eq_obj2id[e])
        act = m.eq_active[e] > 0
        if et == EqType.WELD:
            relpos = m.eq_data[e, 3:6]
            relquat = m.eq_data[e, 6:10]
            target_pos = d.xpos[o1] + d.xmat[o1] @ relpos
            pos_err = d.xpos[o2] - target_pos
            target_quat = rot.quat_mul(d.xquat[o1], rot.quat_unit(relquat))
            qerr = rot.quat_mul(d.xquat[o2], rot.quat_conjugate(target_quat))
            rot_err = 2.0 * qerr[1:]
            Jp1 = smooth.point_jacobian(m, d, d.xpos[o2], o1)
            Jp2 = smooth.point_jacobian(m, d, d.xpos[o2], o2)
            Jr1 = smooth.rotation_jacobian(m, d, o1)
            Jr2 = smooth.rotation_jacobian(m, d, o2)
            for k in range(3):
                J_rows.append((Jp2 - Jp1)[k])
                pos_rows.append(pos_err[k])
                diagA_rows.append(body_iw0[o1, 0] + body_iw0[o2, 0])
            for k in range(3):
                J_rows.append((Jr2 - Jr1)[k])
                pos_rows.append(rot_err[k])
                diagA_rows.append(body_iw0[o1, 1] + body_iw0[o2, 1])
            for _ in range(6):
                solref_rows.append(m.eq_solref[e])
                solimp_rows.append(m.eq_solimp[e])
                kind_rows.append(EQ)
                floss_rows.append(jnp.zeros((), dtype))
                active_rows.append(act)
        elif et == EqType.CONNECT:
            anchor = m.eq_data[e, 0:3]
            point = d.xpos[o1] + d.xmat[o1] @ anchor
            Jp1 = smooth.point_jacobian(m, d, point, o1)
            Jp2 = smooth.point_jacobian(m, d, point, o2)
            pos_err = point - (d.xpos[o2] + d.xmat[o2] @ m.eq_data[e, 3:6])
            for k in range(3):
                J_rows.append((Jp1 - Jp2)[k])
                pos_rows.append(pos_err[k])
                diagA_rows.append(body_iw0[o1, 0] + body_iw0[o2, 0])
                solref_rows.append(m.eq_solref[e])
                solimp_rows.append(m.eq_solimp[e])
                kind_rows.append(EQ)
                floss_rows.append(jnp.zeros((), dtype))
                active_rows.append(act)
        elif et == EqType.JOINT:
            q1adr = int(c.jnt_qposadr[o1])
            d1adr = int(c.jnt_dofadr[o1])
            data = m.eq_data[e]
            if o2 > 0:
                q2adr = int(c.jnt_qposadr[o2])
                d2adr = int(c.jnt_dofadr[o2])
                dq = d.qpos[q2adr]
                poly = data[0] + dq * (
                    data[1] + dq * (data[2] + dq * (data[3] + dq * data[4]))
                )
                dpoly = data[1] + dq * (
                    2 * data[2] + dq * (3 * data[3] + dq * 4 * data[4])
                )
                pos_err = d.qpos[q1adr] - poly
                J = jnp.zeros(nv, dtype).at[d1adr].set(1.0).at[d2adr].add(-dpoly)
                diagA_rows.append(dof_iw0[d1adr] + dof_iw0[d2adr])
            else:
                pos_err = d.qpos[q1adr] - data[0]
                J = jnp.zeros(nv, dtype).at[d1adr].set(1.0)
                diagA_rows.append(dof_iw0[d1adr])
            J_rows.append(J)
            pos_rows.append(pos_err)
            solref_rows.append(m.eq_solref[e])
            solimp_rows.append(m.eq_solimp[e])
            kind_rows.append(EQ)
            floss_rows.append(jnp.zeros((), dtype))
            active_rows.append(act)

    # equality rows assembled above arrive one-by-one; gather them as the
    # first block, then append vectorized blocks for friction/limits.
    blocks = []  # (J, pos, solref, solimp, floss, active, kind_np, diagA_np)
    if J_rows:
        blocks.append((
            jnp.stack(J_rows), jnp.stack(pos_rows), jnp.stack(solref_rows),
            jnp.stack(solimp_rows), jnp.stack(floss_rows),
            jnp.stack(active_rows), np.asarray(kind_rows, np.int32),
            np.asarray(diagA_rows, np.float64),
        ))

    # ---- dof friction loss: one static one-hot block
    fl_ids = np.nonzero(np.asarray(c.dof_has_frictionloss))[0]
    if len(fl_ids):
        n = len(fl_ids)
        onehot = np.zeros((n, nv), np.float32)
        onehot[np.arange(n), fl_ids] = 1.0
        blocks.append((
            jnp.asarray(onehot, dtype),
            jnp.zeros(n, dtype),
            m.dof_solref[fl_ids], m.dof_solimp[fl_ids],
            m.dof_frictionloss[fl_ids],
            jnp.ones(n, bool),
            np.full(n, FRICTION, np.int32),
            dof_iw0[fl_ids],
        ))

    # ---- joint limits (vectorized over limited hinge/slide joints)
    st = tables.scalar_joint_tables(c)
    lim = st["lim_rows"]
    if len(lim):
        jids = st["jid"][lim]
        qadr = st["qadr"][lim]
        dadr = st["dadr"][lim]
        n = len(jids)
        qv = d.qpos[qadr]
        dist_lo = qv - m.jnt_range[jids, 0]
        dist_hi = m.jnt_range[jids, 1] - qv
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0)
        onehot = np.zeros((n, nv), np.float32)
        onehot[np.arange(n), dadr] = 1.0
        blocks.append((
            jnp.asarray(onehot, dtype) * sign[:, None],
            dist - m.jnt_margin[jids],
            m.jnt_solref[jids], m.jnt_solimp[jids],
            jnp.zeros(n, dtype),
            dist < m.jnt_margin[jids],
            np.full(n, ONESIDED, np.int32),
            dof_iw0[dadr],
        ))

    # ---- tendon limits (vectorized over limited tendons)
    lt = np.nonzero(np.asarray(c.tendon_limited))[0]
    if len(lt):
        L = d.ten_length[lt]
        dist_lo = L - m.tendon_range[lt, 0]
        dist_hi = m.tendon_range[lt, 1] - L
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0)
        blocks.append((
            d.ten_J[lt] * sign[:, None],
            dist - m.tendon_margin[lt],
            m.tendon_solref[lt], m.tendon_solimp[lt],
            jnp.zeros(len(lt), dtype),
            dist < m.tendon_margin[lt],
            np.full(len(lt), ONESIDED, np.int32),
            ten_iw0[lt],
        ))

    n_scalar = sum(b[0].shape[0] for b in blocks)
    if n_scalar:
        J_scalar = jnp.concatenate([b[0] for b in blocks])
        pos_scalar = jnp.concatenate([b[1] for b in blocks])
        solref_scalar = jnp.concatenate([b[2] for b in blocks])
        solimp_scalar = jnp.concatenate([b[3] for b in blocks])
        floss_scalar = jnp.concatenate([b[4] for b in blocks])
        active_scalar = jnp.concatenate([b[5] for b in blocks])
        kind_scalar = np.concatenate([b[6] for b in blocks])
        diagA_scalar = np.concatenate(
            [np.asarray(b[7], np.float64) for b in blocks]
        )
    else:
        J_scalar = jnp.zeros((0, nv), dtype)
        pos_scalar = jnp.zeros((0,), dtype)
        solref_scalar = jnp.zeros((0, 2), dtype)
        solimp_scalar = jnp.zeros((0, 5), dtype)
        floss_scalar = jnp.zeros((0,), dtype)
        active_scalar = jnp.zeros((0,), bool)
        kind_scalar = np.zeros(0, np.int32)
        diagA_scalar = np.zeros(0, np.float64)
    return (J_scalar, pos_scalar, solref_scalar, solimp_scalar,
            floss_scalar, active_scalar, kind_scalar, diagA_scalar)


def make_efc(m: Model, d: Data, Minv: jax.Array = None):
    """Assemble constraint rows: J (nefc, nv), aref, D, floss, kind arrays.

    Row layout (static): [equality | dof friction | joint limits |
    tendon limits | contact facets by condim class].

    `Minv` is the explicit inverse mass matrix computed once per substep —
    regularization needs diag(J M^-1 J^T); a matmul against Minv replaces
    the batched triangular solves that were latency-bound on TPU.
    """
    c = m.const
    dtype = d.qpos.dtype
    nv = c.nv
    (J_scalar, pos_scalar, solref_scalar, solimp_scalar,
     floss_scalar, active_scalar, kind_scalar, diagA_scalar) = (
        scalar_blocks(m, d)
    )
    n_scalar = J_scalar.shape[0]

    # ---- contacts: top-k ACTIVE slot selection, then one batched facet
    # emission. The collision driver produces thousands of static slots, of
    # which only tens are ever penetrating; building Jacobian rows for all
    # of them made the Newton solve memory-bound on J. Here the
    # `opt.ncon_active` deepest slots are gathered first (top_k) and rows
    # exist only for them — the fixed-size analogue of MuJoCo's nconmax.
    con = d.contact
    ncon = con.dist.shape[0]
    J_con_list, pos_con_list = [], []
    solref_con_list, solimp_con_list = [], []
    active_con_list = []
    contact_sel = None
    nfacet = 0

    if ncon:
        condims_np = np.asarray(collision_driver.contact_slot_layout(c), np.int32)
        assert len(condims_np) == ncon, (len(condims_np), ncon)
        max_cd = int(condims_np.max())
        nfacet = {1: 1, 3: 4, 4: 6, 6: 10}[max_cd]
        S = min(m.opt.ncon_active, ncon)

        # deepest (most negative adjusted dist) first; inactive slots sink
        score = jnp.where(con.active, con.dist - con.includemargin, BIG)
        neg_score, sel = jax.lax.top_k(-score, S)
        contact_sel = sel

        pos_c = con.pos[sel]
        frame_c = collision_driver.contact_frame(con)[sel]
        dist_c = con.dist[sel]
        margin_c = con.includemargin[sel]
        wrow = jnp.asarray(
            collision_driver.slot_winner_rows(c, m.opt.group_cap)
        )
        wsel = con.wtab[wrow[sel]]                          # (S, 12)
        solref_sel, solimp_sel = wsel[:, 0:2], wsel[:, 2:7]
        fric_c = wsel[:, 7:12]
        act = con.active[sel]
        cd_sel = con.condim[sel]                            # (S,) runtime
        geom_bodyid = jnp.asarray(c.geom_bodyid)
        b1 = geom_bodyid[con.geom1[sel]]
        b2 = geom_bodyid[con.geom2[sel]]

        Jp1 = _point_jac_batch(m, d, pos_c, b1)             # (S, nv, 3)
        Jp2 = _point_jac_batch(m, d, pos_c, b2)
        Jrel = Jp2 - Jp1
        Jn = jnp.einsum("si,svi->sv", frame_c[:, 0], Jrel)  # (S, nv)
        pos_row = dist_c - margin_c

        facets = [Jn]
        facet_ok = [cd_sel >= 1]
        if nfacet >= 4:
            Jt1 = jnp.einsum("si,svi->sv", frame_c[:, 1], Jrel)
            Jt2 = jnp.einsum("si,svi->sv", frame_c[:, 2], Jrel)
            facets = [
                Jn + fric_c[:, 0:1] * Jt1,
                Jn - fric_c[:, 0:1] * Jt1,
                Jn + fric_c[:, 1:2] * Jt2,
                Jn - fric_c[:, 1:2] * Jt2,
            ]
            facet_ok = [cd_sel >= 3] * 4
        if nfacet >= 6:
            Jr = _rot_jac_batch(m, d, b2) - _rot_jac_batch(m, d, b1)
            Jtn = jnp.einsum("si,svi->sv", frame_c[:, 0], Jr)
            facets += [
                Jn + fric_c[:, 2:3] * Jtn,
                Jn - fric_c[:, 2:3] * Jtn,
            ]
            facet_ok += [cd_sel >= 4] * 2
        if nfacet == 10:
            Jr1_ = jnp.einsum("si,svi->sv", frame_c[:, 1], Jr)
            Jr2_ = jnp.einsum("si,svi->sv", frame_c[:, 2], Jr)
            facets += [
                Jn + fric_c[:, 3:4] * Jr1_,
                Jn - fric_c[:, 3:4] * Jr1_,
                Jn + fric_c[:, 4:5] * Jr2_,
                Jn - fric_c[:, 4:5] * Jr2_,
            ]
            facet_ok += [cd_sel >= 6] * 4
        rows = jnp.stack(facets, axis=1)                    # (S, F, nv)
        ok = jnp.stack(facet_ok, axis=1)                    # (S, F)
        # condim-1 slots keep only the normal row (first facet with +f*Jt1
        # degenerates to Jn only when friction is 0; mask others)
        ok = ok | (jnp.arange(nfacet)[None, :] == 0)

        J_con_list.append(rows.reshape(S * nfacet, nv))
        pos_con_list.append(jnp.repeat(pos_row, nfacet))
        solref_con_list.append(jnp.repeat(solref_sel, nfacet, axis=0))
        solimp_con_list.append(jnp.repeat(solimp_sel, nfacet, axis=0))
        active_con_list.append(
            (act[:, None] & ok).reshape(S * nfacet)
        )

    if J_con_list:
        J = jnp.concatenate([J_scalar] + J_con_list)
        pos = jnp.concatenate([pos_scalar] + pos_con_list)
        solref = jnp.concatenate([solref_scalar] + solref_con_list)
        solimp = jnp.concatenate([solimp_scalar] + solimp_con_list)
        n_con_rows = sum(x.shape[0] for x in J_con_list)
        floss = jnp.concatenate([floss_scalar, jnp.zeros(n_con_rows, dtype)])
        active = jnp.concatenate([active_scalar] + active_con_list)
        kind = np.concatenate(
            [kind_scalar, np.full(n_con_rows, ONESIDED, np.int32)]
        )
    else:
        if n_scalar == 0:
            return None
        J, pos, solref, solimp = J_scalar, pos_scalar, solref_scalar, solimp_scalar
        floss, active, kind = floss_scalar, active_scalar, kind_scalar
        contact_sel = None

    imp = _impedance(solimp, pos)
    k_ref, b_ref = _ref_kb(solref, solimp)
    Jqvel = J @ d.qvel
    aref = -b_ref * Jqvel - k_ref * imp * pos

    # regularization R = (1-d)/d * diagApprox, D = 1/R. diagApprox is the
    # compile-time invweight0 approximation — MuJoCo mj_diagApprox semantics
    # (see physics/setconst.py), verified row-by-row against efc_R.
    from robogym_tpu.physics.setconst import invweight0

    _, body_iw0, _ = invweight0(m)
    diagA_list = [jnp.asarray(diagA_scalar, dtype)]
    if contact_sel is not None:
        bw_trn = jnp.asarray(body_iw0[:, 0], dtype)
        # pyramidal contact diagApprox = 4/impratio * trn-invweight sum
        # (factor verified against MuJoCo efc_R across mu/condim/impratio)
        scale = 4.0 / jnp.maximum(m.opt.impratio, 1e-6)
        iw_c = scale * (jnp.take(bw_trn, b1) + jnp.take(bw_trn, b2))
        diagA_list.append(jnp.repeat(iw_c, nfacet))
    diagA = jnp.concatenate(diagA_list)
    R = jnp.maximum(
        jnp.maximum((1.0 - imp) / imp, 1e-8) * diagA, 1e-12
    )
    Dmat = jnp.where(active, 1.0 / R, 0.0)

    return dict(
        J=J, aref=aref, D=Dmat, floss=floss, kind=kind,
        n_scalar=n_scalar, contact_sel=contact_sel, nfacet=nfacet, ncon=ncon,
    )


def solve(m: Model, d: Data, qfrc_smooth: jax.Array, Minv: jax.Array = None,
          euler_args=None):
    """Newton solve for qacc; fills qacc, qfrc_constraint, contact forces.

    euler_args=(damp, dt) additionally fuses the implicit-damping Euler
    velocity update into the solve (hot-path batched TPU kernel); the return
    becomes (Data, qvel_new) — qvel_new is None when the fused path is
    unavailable (Newton solver / no contact slots) and the caller must run
    step.euler itself."""
    if Minv is None:
        # explicit M^-1, reused by the regularizer and every CG
        # preconditioner application (fused Pallas kernel under vmap on TPU)
        from robogym_tpu.physics import factor_kernel

        Minv = factor_kernel.spd_inverse(d.qM)
    if euler_args is not None and m.opt.solver != "cg":
        # fusion only exists on the CG hot path
        return solve(m, d, qfrc_smooth, Minv), None
    if m.opt.solver == "cg":
        out = _solve_cg_post_gather(m, d, Minv, euler_args)
        if out is not None:
            # (Data) or (Data, qvel_new) depending on euler_args
            return out
        if euler_args is not None:
            # no contact slots: fall through to the scalar/Newton paths and
            # let the caller integrate
            return solve(m, d, qfrc_smooth, Minv), None
    efc = make_efc(m, d, Minv)
    if efc is None:
        return d.replace(
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros_like(d.qacc_smooth),
        )
    J, aref, D, floss, kind = efc["J"], efc["aref"], efc["D"], efc["floss"], efc["kind"]
    dtype = d.qpos.dtype
    nv = m.const.nv
    is_eq = jnp.asarray(kind == EQ)
    is_one = jnp.asarray(kind == ONESIDED)
    is_fric = jnp.asarray(kind == FRICTION)

    M = d.qM

    def force_and_weight(jar):
        quad_active = is_eq | (is_one & (jar < 0))
        f_quad = D * jar * quad_active
        f_fric = jnp.clip(D * jar, -floss, floss) * is_fric
        deriv = f_quad + f_fric
        w = D * (quad_active | (is_fric & (jnp.abs(D * jar) < floss)))
        return deriv, w

    def cost_fn(x):
        jar = J @ x - aref
        dx = x - d.qacc_smooth
        base = 0.5 * dx @ (M @ dx)
        quad_active = is_eq | (is_one & (jar < 0))
        c_quad = 0.5 * D * jar * jar * quad_active
        absDjar = jnp.abs(D * jar)
        inside = absDjar < floss
        c_fric = (
            jnp.where(
                inside,
                0.5 * D * jar * jar,
                floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, 1e-12),
            )
            * is_fric
        )
        return base + jnp.sum(c_quad + c_fric)

    if m.opt.solver == "cg":
        return _solve_cg(m, d, efc, is_eq, is_one, is_fric, Minv)

    x = d.qacc_smooth
    eye = jnp.eye(nv, dtype=dtype)

    def cost_from_jar(x, jar):
        dx = x - d.qacc_smooth
        base = 0.5 * dx @ (M @ dx)
        quad_active = is_eq | (is_one & (jar < 0))
        c_quad = 0.5 * D * jar * jar * quad_active
        absDjar = jnp.abs(D * jar)
        inside = absDjar < floss
        c_fric = (
            jnp.where(
                inside,
                0.5 * D * jar * jar,
                floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, 1e-12),
            )
            * is_fric
        )
        return base + jnp.sum(c_quad + c_fric)

    def newton_iter(i, x):
        jar = J @ x - aref
        deriv, w = force_and_weight(jar)
        grad = M @ (x - d.qacc_smooth) + J.T @ deriv
        H = M + (J.T * w) @ J + 1e-10 * eye
        L = jax.scipy.linalg.cholesky(H, lower=True)
        p = -jax.scipy.linalg.cho_solve((L, True), grad)
        # line search over fixed candidates: Jx and Jp are computed ONCE —
        # each candidate cost uses jar(a) = (Jx - aref) + a*Jp (no further
        # J reads, which dominate the solve's memory traffic)
        Jp = J @ p
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.02, 0.0], dtype)
        costs = jax.vmap(
            lambda a: cost_from_jar(x + a * p, jar + a * Jp)
        )(alphas)
        best = jnp.argmin(costs)
        a = alphas[best]
        return x + a * p

    x = jax.lax.fori_loop(0, m.opt.iterations, newton_iter, x)

    jar = J @ x - aref
    deriv, _ = force_and_weight(jar)
    f = -deriv
    qfrc_constraint = J.T @ f

    # contact diagnostics: normal force per contact = sum of its facet forces
    ncon = efc["ncon"]
    efc_force_contact = jnp.zeros(max(ncon, d.contact.dist.shape[0]), dtype)
    if efc["contact_sel"] is not None:
        nfacet = efc["nfacet"]
        sel = efc["contact_sel"]
        S = sel.shape[0]
        row0 = efc["n_scalar"]
        block = f[row0 : row0 + S * nfacet].reshape(S, nfacet).sum(axis=1)
        efc_force_contact = efc_force_contact.at[sel].set(block)

    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc_constraint,
        efc_force_contact=efc_force_contact,
    )


def _post_gather_prelude(m: Model, d: Data):
    """Shared contact-slot selection + gather for the post-gather cores.
    Returns None when the model has no usable contact slots."""
    c = m.const
    con = d.contact
    ncon = con.dist.shape[0]
    if ncon == 0:
        return None
    S = min(m.opt.ncon_active, ncon)
    if S <= 0:
        return None
    condims_np = np.asarray(collision_driver.contact_slot_layout(c), np.int32)
    nfacet = {1: 1, 3: 4, 4: 6, 6: 10}[int(condims_np.max())]
    dtype = d.qpos.dtype

    (J_s, pos_s, solref_s, solimp_s, floss_s, active_s, kind_s, diagA_s) = (
        scalar_blocks(m, d)
    )

    score = jnp.where(con.active, con.dist - con.includemargin, BIG)
    _, sel = jax.lax.top_k(-score, S)
    # ONE one-hot contraction fetches every per-slot field of the S winners
    # (pos/normal/dist/margin/condim/active/body ids). Per-env dynamic
    # gathers lower to scalar loops on TPU; this is an MXU matmul
    # (S, ncon) @ (ncon, 12). Winner-level solver params (solref/solimp/
    # friction) are fetched by composing with the STATIC slot->winner
    # one-hot — the wide per-slot parameter table no longer exists.
    from robogym_tpu.physics.collision.driver import _onehot

    oh = _onehot(sel, ncon, dtype)                       # (S, ncon)
    f32 = lambda a: a.astype(dtype)
    ctab = jnp.concatenate(
        [
            con.pos,                                     # 0:3
            con.normal,                                  # 3:6
            con.dist[:, None],                           # 6
            con.includemargin[:, None],                  # 7
            f32(con.condim)[:, None],                    # 8
            f32(con.active)[:, None],                    # 9
            f32(con.body1)[:, None],                     # 10
            f32(con.body2)[:, None],                     # 11
        ],
        axis=-1,
    )
    g = oh @ ctab                                        # (S, 12)
    pos_c = g[:, 0:3]
    normal_c = g[:, 3:6]
    dist_c, margin_c = g[:, 6], g[:, 7]
    cd_sel = jnp.round(g[:, 8]).astype(jnp.int32)
    act_c = g[:, 9] > 0.5
    b1 = jnp.round(g[:, 10]).astype(jnp.int32)
    b2 = jnp.round(g[:, 11]).astype(jnp.int32)
    SW = jnp.asarray(
        collision_driver.slot_winner_onehot(c, m.opt.group_cap), dtype
    )                                                    # (ncon, W) static
    wg = (oh @ SW) @ con.wtab                            # (S, 12)
    solref_c, solimp_c, fric_c = wg[:, 0:2], wg[:, 2:7], wg[:, 7:12]
    # full frames only for the S winners (tangent build on 639 slots was
    # pure waste)
    t1v = collision_driver._orthogonal(normal_c)
    frame_c = jnp.stack(
        [normal_c, t1v, jnp.cross(normal_c, t1v)], axis=-2
    )                                                    # (S, 3, 3)
    # body-indexed lookups (dof path masks, subtree-root coms) via body
    # one-hots — (S, nbody) @ (nbody, ·) contractions
    ohb1 = _onehot(b1, c.nbody, dtype)
    ohb2 = _onehot(b2, c.nbody, dtype)
    rootid = np.asarray(c.body_rootid)
    dofmask = jnp.asarray(c.body_dof_mask, dtype)
    rootcom = d.subtree_com[rootid]                      # static-index rows
    # MuJoCo diagApprox for the selected contacts: 4*(trn invweight0 sum)
    # (setconst.py; pyramidal factor verified against efc_R)
    from robogym_tpu.physics.setconst import invweight0

    _, body_iw0, _ = invweight0(m)
    bw_trn = jnp.asarray(body_iw0[:, 0], dtype)
    scale = 4.0 / jnp.maximum(m.opt.impratio, 1e-6)
    iw_c = scale * (ohb1 @ bw_trn + ohb2 @ bw_trn)       # (S,)
    head = (
        J_s, pos_s, solref_s, solimp_s, floss_s, active_s.astype(dtype),
        jnp.asarray(diagA_s, dtype),
        pos_c, frame_c, dist_c, margin_c,
        fric_c, act_c, cd_sel, iw_c,
        ohb1 @ dofmask, ohb2 @ dofmask,
        ohb1 @ rootcom, ohb2 @ rootcom,
        solref_c, solimp_c,
        d.cdof, d.qvel, d.qM,
    )
    return head, oh, S, nfacet, np.asarray(kind_s, np.int32), J_s.shape[0]


def _solve_cg_post_gather(m: Model, d: Data, Minv: jax.Array,
                          euler_args=None):
    """CG solve via the post-gather custom_vmap core
    (physics/constraint_batched.py): contact slots are selected and gathered
    here (cheap, dense layouts), then the whole row build + solve runs
    behind one vmap boundary so the batched TPU path can assemble J
    batch-minor and run the fused Pallas kernel. Returns None when the
    model has no contact slots (caller falls back to the scalar-only path).
    """
    from robogym_tpu.physics import constraint_batched

    pre = _post_gather_prelude(m, d)
    if pre is None:
        return None
    head, oh, S, nfacet, kind_s, n_s = pre
    ncon = d.contact.dist.shape[0]
    dtype = d.qpos.dtype
    x0 = jnp.where(jnp.isfinite(d.qacc).all(), d.qacc, d.qacc_smooth)

    core = constraint_batched._make_core(
        kind_s.tobytes(), int(m.opt.cg_iterations), nfacet,
        euler_args is not None,
    )
    extra = ()
    if euler_args is not None:
        damp, dtv = euler_args
        # dt may be a shared scalar: the fused vmap rule broadcasts
        # unbatched operands itself
        dtv = jnp.asarray(dtv, dtype)
        extra = (damp.astype(dtype), dtv)
    out = core(*head, Minv, d.qacc_smooth, x0, *extra)
    if euler_args is not None:
        x, qfrc, f, qvel_new = out
    else:
        x, qfrc, f = out
    block = f[n_s:].reshape(S, nfacet).sum(axis=1)
    # scatter-by-sel via the transposed one-hot (exact, no TPU scatter)
    efc_force_contact = block @ oh
    d_out = d.replace(
        qacc=x,
        qfrc_constraint=qfrc,
        efc_force_contact=efc_force_contact,
    )
    if euler_args is not None:
        return d_out, qvel_new
    return d_out


def solve_fused_step(m: Model, d: Data, qfrc_smooth: jax.Array):
    """The fully fused hot-path solve: M^-1, qacc_smooth, warmstart, the
    whole CG constraint solve AND the implicit-damping Euler velocity
    update behind one vmap boundary (TPU: two Pallas factor kernels + one
    fat CG kernel; zero batch-major matrix ops in XLA).

    Returns (Data-with-qacc/qacc_smooth/forces, qvel_new), or None when the
    config can't take the post-gather CG path (caller falls back to the
    explicit forward()+euler() sequence)."""
    from robogym_tpu.physics import constraint_batched

    if m.opt.solver != "cg":
        return None
    pre = _post_gather_prelude(m, d)
    if pre is None:
        return None
    head, oh, S, nfacet, kind_s, n_s = pre
    ncon = d.contact.dist.shape[0]
    dtype = d.qpos.dtype

    core = constraint_batched._make_core(
        kind_s.tobytes(), int(m.opt.cg_iterations), nfacet,
        True, True,
    )
    damp = (m.dof_damping + d.act_vel_damping).astype(dtype)
    dtv = jnp.asarray(m.opt.timestep, dtype)
    x, qfrc, f, qvel_new, qs = core(
        *head, qfrc_smooth, d.qacc, damp, dtv
    )
    block = f[n_s:].reshape(S, nfacet).sum(axis=1)
    # scatter-by-sel via the transposed one-hot (exact, no TPU scatter)
    efc_force_contact = block @ oh
    d_out = d.replace(
        qacc=x,
        qacc_smooth=qs,
        qfrc_constraint=qfrc,
        efc_force_contact=efc_force_contact,
    )
    return d_out, qvel_new


import functools


# line-search safeguard scales around the frozen-active-set Newton step
LS_SCALES = (2.0, 1.0, 0.5, 0.125)


def kind_masked_D(kind: np.ndarray, D: jax.Array):
    """(Deq, Done, Dfr) = D premasked by row kind, built CONST-FREE.

    The kind layout is static; masking is done by slicing D into the
    run-length segments of `kind` and concatenating with zeros. No
    jnp.asarray(numpy_mask) is created: custom_vmap reference functions may
    not capture array constants (vmapping a lax.cond that contains the bound
    call batches the captured consts and trips jax's consts_batched
    assert)."""
    kind = np.asarray(kind, np.int32)
    n = len(kind)
    # run-length segments of constant kind
    bounds = [0] + [i for i in range(1, n) if kind[i] != kind[i - 1]] + [n]
    zero = jnp.zeros_like(D)
    outs = []
    for want in (EQ, ONESIDED, FRICTION):
        segs = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            src = D if kind[a] == want else zero
            segs.append(src[..., a:b])
        outs.append(segs[0] if len(segs) == 1 else
                    jnp.concatenate(segs, axis=-1))
    return tuple(outs)


def _scan_cg_solve(J, aref, Deq, Done, Dfr, floss, M, Minv, qs, x0,
                   iterations: int):
    """Reference XLA scan CG solve on premasked row weights. Same math as
    the fused Pallas kernel (cg_kernel._cg_kernel). CONST-FREE: no jnp
    array constants are captured (see kind_masked_D)."""

    def force(jar):
        neg = (jar < 0).astype(jar.dtype)
        return Deq * jar + Done * jar * neg + jnp.clip(
            Dfr * jar, -floss, floss
        )

    def penalty_cost(jar):
        neg = (jar < 0).astype(jar.dtype)
        c_quad = 0.5 * (Deq + Done * neg) * jar * jar
        absDjar = jnp.abs(Dfr * jar)
        inside = (absDjar < floss).astype(jar.dtype)
        quad_f = 0.5 * Dfr * jar * jar
        lin_f = floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(
            Dfr, 1e-12
        )
        c_fric = inside * quad_f + (1.0 - inside) * lin_f
        return jnp.sum(c_quad + c_fric)

    def grad(x, jar):
        return M @ (x - qs) + J.T @ force(jar)

    jar0 = J @ x0 - aref
    g0 = grad(x0, jar0)
    Mg0 = Minv @ g0
    p0 = -Mg0

    def body(carry, _):
        x, jar, g, Mg, p = carry
        Jp = J @ p
        # line search: the total cost phi(a) is CONVEX piecewise-quadratic
        # in the step size. Take the frozen-active-set Newton step
        # a1 = -phi'(0)/phi''(0+) (exact when no row crosses a breakpoint)
        # and evaluate a few scaled safeguards around it — half the penalty
        # evaluations of the old fixed alpha grid, and only cost DELTAS
        # relative to a=0 are needed (drops the M @ dx0 matvec).
        dx0 = x - qs
        Mp = M @ p
        c1 = dx0 @ Mp
        c2 = p @ Mp
        f0 = force(jar)
        neg = (jar < 0).astype(x.dtype)
        inside = (jnp.abs(Dfr * jar) < floss).astype(x.dtype)
        deff = Deq + Done * neg + Dfr * inside
        phi_p = c1 + jnp.dot(f0, Jp)
        phi_pp = jnp.maximum(c2 + jnp.dot(deff * Jp, Jp), 1e-12)
        a1 = jnp.clip(-phi_p / phi_pp, 0.0, 2.0)
        pen0 = penalty_cost(jar)
        best_cost = jnp.asarray(0.0, x.dtype)
        best_a = jnp.asarray(0.0, x.dtype)
        for s in LS_SCALES:  # python floats -> inline literals, no consts
            a = a1 * s
            dcost = a * c1 + 0.5 * a * a * c2 + penalty_cost(
                jar + a * Jp
            ) - pen0
            take = dcost < best_cost
            best_cost = jnp.where(take, dcost, best_cost)
            best_a = jnp.where(take, a, best_a)
        x = x + best_a * p
        jar = jar + best_a * Jp
        g_new = grad(x, jar)
        Mg_new = Minv @ g_new
        # Polak-Ribiere+ with automatic restart
        num = jnp.dot(g_new, Mg_new - Mg)
        den = jnp.maximum(jnp.dot(g, Mg), 1e-12)
        beta = jnp.maximum(num / den, 0.0)
        p = -Mg_new + beta * p
        return (x, jar, g_new, Mg_new, p), ()

    (x, jar, _, _, _), _ = jax.lax.scan(
        body, (x0, jar0, g0, Mg0, p0), None, length=iterations,
    )
    return x, -force(jar)


@functools.lru_cache(maxsize=64)
def _make_cg_core(iterations: int):
    """CG solve core on premasked row weights.

    Dispatched via `physics/pallas_dispatch` (a real primitive with a
    batching rule): the single-env path is the reference pure-JAX scan;
    under vmap on TPU the whole batch dispatches to the fused Pallas kernel
    (physics/cg_kernel.py) that runs the iteration loop in VMEM with the
    env batch in the lane dimension — removing the
    ~20-dependent-small-ops-per-iteration dispatch latency that dominated
    the constraint phase (PROFILE.md)."""
    from robogym_tpu.physics.pallas_dispatch import make_batched_dispatch

    def scan_solve(J, aref, Deq, Done, Dfr, floss, M, Minv, qs, x0):
        return _scan_cg_solve(J, aref, Deq, Done, Dfr, floss, M, Minv, qs,
                              x0, iterations)

    def batched(J, aref, Deq, Done, Dfr, floss, M, Minv, qs, x0):
        import os

        from robogym_tpu.physics import cg_kernel as _ck

        args = (J, aref, Deq, Done, Dfr, floss, M, Minv, qs, x0)
        backend = jax.default_backend()
        # default on TPU; ROBOGYM_TPU_NO_PALLAS forces the XLA scan path;
        # oversized systems (cubelet/multi-object worlds) fall back too —
        # their J does not fit VMEM and the fused compile dies
        use_pallas = (
            (
                backend not in ("cpu", "gpu")
                or os.environ.get("ROBOGYM_TPU_FORCE_PALLAS")
            )
            and not os.environ.get("ROBOGYM_TPU_NO_PALLAS")
            and _ck.fused_fits_vmem(J.shape[1], J.shape[2])
        )
        if use_pallas:
            from robogym_tpu.physics import cg_kernel

            x, f = cg_kernel.solve_cg_batched(iterations, *args)
            x = x.astype(J.dtype)
            f = f.astype(J.dtype)
        else:
            x, f = jax.vmap(scan_solve)(*args)
        return x, f

    return make_batched_dispatch(f"cg_core_{iterations}", scan_solve, batched)


def _solve_cg(m: Model, d: Data, efc, is_eq, is_one, is_fric, Minv) -> Data:
    """Preconditioned nonlinear CG on the same primal objective.

    The Newton path factors a (nv, nv) Hessian per iteration — batched small
    Choleskys are the slowest primitive on TPU. CG replaces them with pure
    (nefc, nv) matvecs: the explicit M^-1 (computed once per substep) is the
    preconditioner, each iteration costs ~3 matvecs + a candidate line search
    that reuses J@p (MuJoCo's mjSOL_CG is the same construction). Warmstarted
    from the previous substep's qacc (mj_warmstart analogue). Under vmap on
    TPU the loop runs in the fused Pallas kernel (see _make_cg_core).
    """
    J, aref, D, floss, kind = (
        efc["J"], efc["aref"], efc["D"], efc["floss"], efc["kind"]
    )
    dtype = d.qpos.dtype
    M = d.qM

    # warmstart from the previous substep's qacc (zero right after reset)
    x0 = jnp.where(jnp.isfinite(d.qacc).all(), d.qacc, d.qacc_smooth)
    core = _make_cg_core(int(m.opt.cg_iterations))
    Deq, Done, Dfr = kind_masked_D(kind, D)
    x, f = core(J, aref, Deq, Done, Dfr, floss, M, Minv, d.qacc_smooth, x0)
    qfrc_constraint = J.T @ f

    ncon = efc["ncon"]
    efc_force_contact = jnp.zeros(max(ncon, d.contact.dist.shape[0]), dtype)
    if efc["contact_sel"] is not None:
        nfacet = efc["nfacet"]
        sel = efc["contact_sel"]
        S = sel.shape[0]
        row0 = efc["n_scalar"]
        block = f[row0 : row0 + S * nfacet].reshape(S, nfacet).sum(axis=1)
        efc_force_contact = efc_force_contact.at[sel].set(block)

    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc_constraint,
        efc_force_contact=efc_force_contact,
    )
