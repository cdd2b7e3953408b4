"""Soft-constraint assembly + primal Newton solver.

Implements MuJoCo's constraint model (solref/solimp impedances, pyramidal
friction cones, limits, equality welds, dof friction loss) as a primal
optimization over qacc:

    min_x 1/2 (x - qacc_smooth)^T M (x - qacc_smooth) + sum_i cost_i(J_i x - aref_i)

with per-row quadratic (equality), one-sided quadratic (limits/contacts),
and Huber (friction loss) penalties — exactly the objective MuJoCo's Newton
solver minimizes. Newton iterations with a fixed candidate line search:
every env in the batch executes the same instruction stream (no
data-dependent control flow), so the whole solve jits into batched GEMMs +
a (nv x nv) Cholesky per iteration — MXU work.

The randomizers mutate the same solref/solimp fields the reference touches
(/root/reference/robogym/randomization/sim.py:182-314), so impedance
semantics here mirror MuJoCo's mj_makeImpedance.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, EqType, JointType, Model
from robogym_tpu.physics import smooth
from robogym_tpu.utils import rotation as rot

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
    # MuJoCo: y = a*x^p for x<=mid; 1 - b*(1-x)^p for x>mid
    y = jnp.where(x <= mid, a * jnp.power(x, power), 1.0 - b * jnp.power(1.0 - x, power))
    return d0 + y * (dmax - d0)


def _ref_kb(solref: jax.Array, imp: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Stiffness/damping accelerations from solref (standard or direct)."""
    timeconst = solref[..., 0]
    dampratio = solref[..., 1]
    dmax = 0.9999  # MuJoCo uses imp_max of the row; approximate with clip below
    standard = timeconst > 0
    b_std = 2.0 / jnp.maximum(dmax * timeconst, 1e-10)
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-10
    )
    b_dir = -dampratio
    k_dir = -timeconst
    b = jnp.where(standard, b_std, b_dir)
    k = jnp.where(standard, k_std, k_dir)
    return k, b


def make_efc(m: Model, d: Data):
    """Assemble constraint rows: J (nefc, nv), aref, D, floss, kind, active.

    Row layout is static: [equality | dof friction | joint limits |
    tendon limits | contact facets]. Inactive rows get D = 0.
    """
    c = m.const
    dtype = d.qpos.dtype
    nv = c.nv

    J_rows: List[jax.Array] = []
    pos_rows: List[jax.Array] = []
    solref_rows: List[jax.Array] = []
    solimp_rows: List[jax.Array] = []
    kind_rows: List[int] = []
    floss_rows: List[jax.Array] = []
    active_rows: List[jax.Array] = []

    one = jnp.ones((), dtype)

    # ---- equality constraints
    for e in range(c.neq):
        et = int(c.eq_type[e])
        o1, o2 = int(c.eq_obj1id[e]), int(c.eq_obj2id[e])
        act = m.eq_active[e] > 0
        if et == EqType.WELD:
            # relative pose of body2 in body1 = eq_data[3:10] (anchor in 0:3)
            # rows: 3 position + 3 rotation
            anchor = m.eq_data[e, 0:3]
            relpos = m.eq_data[e, 3:6]
            relquat = m.eq_data[e, 6:10]
            p1 = d.xpos[o1]
            p2 = d.xpos[o2]
            # target: body1 pose composed with relpose
            target_pos = p1 + d.xmat[o1] @ relpos
            pos_err = d.xpos[o2] - target_pos
            target_quat = rot.quat_mul(d.xquat[o1], relquat)
            # rotational error: 2 * vec part of (q2 * target^-1)
            qerr = rot.quat_mul(d.xquat[o2], rot.quat_conjugate(target_quat))
            rot_err = 2.0 * qerr[1:]
            Jp1 = smooth.point_jacobian(m, d, d.xpos[o2], o1)
            Jp2 = smooth.point_jacobian(m, d, d.xpos[o2], o2)
            Jr1 = smooth.rotation_jacobian(m, d, o1)
            Jr2 = smooth.rotation_jacobian(m, d, o2)
            for k in range(3):
                J_rows.append((Jp2 - Jp1)[k])
                pos_rows.append(pos_err[k])
                solref_rows.append(m.eq_solref[e])
                solimp_rows.append(m.eq_solimp[e])
                kind_rows.append(EQ)
                floss_rows.append(jnp.zeros((), dtype))
                active_rows.append(act)
            for k in range(3):
                J_rows.append((Jr2 - Jr1)[k])
                pos_rows.append(rot_err[k])
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
            # point on body2 that should coincide: nearest representation
            pos_err = point - (d.xpos[o2] + d.xmat[o2] @ m.eq_data[e, 3:6])
            for k in range(3):
                J_rows.append((Jp1 - Jp2)[k])
                pos_rows.append(pos_err[k])
                solref_rows.append(m.eq_solref[e])
                solimp_rows.append(m.eq_solimp[e])
                kind_rows.append(EQ)
                floss_rows.append(jnp.zeros((), dtype))
                active_rows.append(act)
        elif et == EqType.JOINT:
            # qpos1 = poly(qpos2) coupling
            q1adr = int(c.jnt_qposadr[o1])
            d1adr = int(c.jnt_dofadr[o1])
            data = m.eq_data[e]
            if o2 >= 0 and o2 < c.njnt and int(c.eq_obj2id[e]) != 0:
                q2adr = int(c.jnt_qposadr[o2])
                d2adr = int(c.jnt_dofadr[o2])
                dq = d.qpos[q2adr]
                poly = data[0] + dq * (data[1] + dq * (data[2] + dq * (data[3] + dq * data[4])))
                dpoly = data[1] + dq * (2 * data[2] + dq * (3 * data[3] + dq * 4 * data[4]))
                pos_err = d.qpos[q1adr] - poly
                J = jnp.zeros(nv, dtype).at[d1adr].set(1.0).at[d2adr].add(-dpoly)
            else:
                pos_err = d.qpos[q1adr] - data[0]
                J = jnp.zeros(nv, dtype).at[d1adr].set(1.0)
            J_rows.append(J)
            pos_rows.append(pos_err)
            solref_rows.append(m.eq_solref[e])
            solimp_rows.append(m.eq_solimp[e])
            kind_rows.append(EQ)
            floss_rows.append(jnp.zeros((), dtype))
            active_rows.append(act)

    # ---- dof friction loss
    # Row existence must be static: a row exists for every dof whose
    # compile-time frictionloss is nonzero (randomizers scale values but
    # don't create new nonzeros) — recorded in const.dof_has_frictionloss.
    for i in range(nv):
        if bool(c.dof_has_frictionloss[i]):
            J_rows.append(jnp.zeros(nv, dtype).at[i].set(1.0))
            pos_rows.append(jnp.zeros((), dtype))
            solref_rows.append(m.dof_solref[i])
            solimp_rows.append(m.dof_solimp[i])
            kind_rows.append(FRICTION)
            floss_rows.append(m.dof_frictionloss[i])
            active_rows.append(jnp.asarray(True))

    # ---- joint limits
    for j in range(c.njnt):
        if not bool(c.jnt_limited[j]):
            continue
        jt = int(c.jnt_type[j])
        if jt not in (JointType.HINGE, JointType.SLIDE):
            continue  # ball limits unsupported (not used by reference assets)
        qadr = int(c.jnt_qposadr[j])
        dadr = int(c.jnt_dofadr[j])
        qv = d.qpos[qadr]
        dist_lo = qv - m.jnt_range[j, 0]
        dist_hi = m.jnt_range[j, 1] - qv
        lo_closer = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lo_closer, 1.0, -1.0)
        J = jnp.zeros(nv, dtype).at[dadr].set(1.0)
        J = J * sign
        pos = dist - m.jnt_margin[j]
        J_rows.append(J)
        pos_rows.append(pos)
        solref_rows.append(m.jnt_solref[j])
        solimp_rows.append(m.jnt_solimp[j])
        kind_rows.append(ONESIDED)
        floss_rows.append(jnp.zeros((), dtype))
        active_rows.append(dist < m.jnt_margin[j])

    # ---- tendon limits
    for t in range(c.ntendon):
        if not bool(c.tendon_limited[t]):
            continue
        L = d.ten_length[t]
        dist_lo = L - m.tendon_range[t, 0]
        dist_hi = m.tendon_range[t, 1] - L
        lo_closer = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lo_closer, 1.0, -1.0)
        pos = dist - m.tendon_margin[t]
        J_rows.append(d.ten_J[t] * sign)
        pos_rows.append(pos)
        solref_rows.append(m.tendon_solref[t])
        solimp_rows.append(m.tendon_solimp[t])
        kind_rows.append(ONESIDED)
        floss_rows.append(jnp.zeros((), dtype))
        active_rows.append(dist < m.tendon_margin[t])

    # ---- contacts (pyramidal facets)
    con = d.contact
    ncon = con.dist.shape[0]
    contact_row_of_con: List[Tuple[int, int]] = []  # (row index, ncon facets)
    geom_bodyid = c.geom_bodyid
    # static geom ids per contact slot, from the compile-time pair table
    slot_geoms: List[Tuple[int, int]] = []
    for p in range(len(c.collision_pairs)):
        for _ in range(int(c.pair_ncon[p])):
            slot_geoms.append((int(c.collision_pairs[p, 0]), int(c.collision_pairs[p, 1])))
    assert len(slot_geoms) == ncon, (len(slot_geoms), ncon)
    for i in range(ncon):
        g1, g2 = slot_geoms[i]
        b1, b2 = int(geom_bodyid[g1]), int(geom_bodyid[g2])
        condim = max(int(c.geom_condim[g1]), int(c.geom_condim[g2]))
        n = con.frame[i, 0]
        t1 = con.frame[i, 1]
        t2 = con.frame[i, 2]
        Jp1 = smooth.point_jacobian(m, d, con.pos[i], b1)
        Jp2 = smooth.point_jacobian(m, d, con.pos[i], b2)
        Jrel = Jp2 - Jp1  # (3, nv)
        Jn = n @ Jrel
        pos = con.dist[i] - con.includemargin[i]
        act = con.active[i]
        row0 = len(J_rows)
        if condim == 1:
            J_rows.append(Jn)
            pos_rows.append(pos)
            solref_rows.append(con.solref[i])
            solimp_rows.append(con.solimp[i])
            kind_rows.append(ONESIDED)
            floss_rows.append(jnp.zeros((), dtype))
            active_rows.append(act)
        else:
            tangents = [t1 @ Jrel, t2 @ Jrel]
            mus = [con.friction[i, 0], con.friction[i, 1]]
            if condim >= 4:
                # torsional: rotation about normal
                Jr1 = smooth.rotation_jacobian(m, d, b1)
                Jr2 = smooth.rotation_jacobian(m, d, b2)
                tangents.append(n @ (Jr2 - Jr1))
                mus.append(con.friction[i, 2])
            if condim == 6:
                Jr1 = smooth.rotation_jacobian(m, d, b1)
                Jr2 = smooth.rotation_jacobian(m, d, b2)
                tangents.append(t1 @ (Jr2 - Jr1))
                tangents.append(t2 @ (Jr2 - Jr1))
                mus.append(con.friction[i, 3])
                mus.append(con.friction[i, 4])
            for Jt, mu in zip(tangents, mus):
                for s in (1.0, -1.0):
                    J_rows.append(Jn + s * mu * Jt)
                    pos_rows.append(pos)
                    solref_rows.append(con.solref[i])
                    solimp_rows.append(con.solimp[i])
                    kind_rows.append(ONESIDED)
                    floss_rows.append(jnp.zeros((), dtype))
                    active_rows.append(act)
        contact_row_of_con.append((row0, len(J_rows) - row0))

    nefc = len(J_rows)
    if nefc == 0:
        return None

    J = jnp.stack(J_rows)                       # (nefc, nv)
    pos = jnp.stack(pos_rows)
    solref = jnp.stack(solref_rows)
    solimp = jnp.stack(solimp_rows)
    kind = np.asarray(kind_rows, np.int32)
    floss = jnp.stack(floss_rows)
    active = jnp.stack(active_rows)

    imp = _impedance(solimp, pos)
    k_ref, b_ref = _ref_kb(solref, imp)
    Jqvel = J @ d.qvel
    aref = -b_ref * Jqvel - k_ref * imp * pos

    # regularization R = (1-d)/d * diag(J M^-1 J^T), D = 1/R
    MinvJT = smooth.solve_m(d, J.T)            # (nv, nefc)
    A_diag = jnp.maximum(jnp.einsum("iv,vi->i", J, MinvJT), 1e-12)
    R = jnp.maximum((1.0 - imp) / imp, 1e-8) * A_diag
    Dmat = jnp.where(active, 1.0 / R, 0.0)

    return dict(
        J=J, aref=aref, D=Dmat, floss=floss, kind=kind,
        contact_rows=contact_row_of_con,
    )


def solve(m: Model, d: Data, qfrc_smooth: jax.Array) -> Data:
    """Newton solve for qacc; fills qacc, qfrc_constraint, contact forces."""
    efc = make_efc(m, d)
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
        """Per-row penalty derivative (force = -deriv) and Hessian weight."""
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
        # Huber
        absDjar = jnp.abs(D * jar)
        inside = absDjar < floss
        c_fric = jnp.where(
            inside, 0.5 * D * jar * jar, floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, 1e-12)
        ) * is_fric
        return base + jnp.sum(c_quad + c_fric)

    x = d.qacc_smooth
    eye = jnp.eye(nv, dtype=dtype)

    def newton_iter(i, x):
        jar = J @ x - aref
        deriv, w = force_and_weight(jar)
        grad = M @ (x - d.qacc_smooth) + J.T @ deriv
        H = M + (J.T * w) @ J + 1e-10 * eye
        L = jax.scipy.linalg.cholesky(H, lower=True)
        p = -jax.scipy.linalg.cho_solve((L, True), grad)
        # fixed candidate line search (branch-free)
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.02], dtype)
        costs = jax.vmap(lambda a: cost_fn(x + a * p))(alphas)
        best = jnp.argmin(costs)
        improved = costs[best] < cost_fn(x)
        a = jnp.where(improved, alphas[best], 0.0)
        return x + a * p

    x = jax.lax.fori_loop(0, m.opt.iterations, newton_iter, x)

    jar = J @ x - aref
    deriv, _ = force_and_weight(jar)
    f = -deriv
    qfrc_constraint = J.T @ f

    # contact diagnostics: normal force per contact = sum of its facet forces
    ncon = d.contact.dist.shape[0]
    if efc["contact_rows"]:
        efc_force_contact = jnp.stack(
            [jnp.sum(f[row0 : row0 + nrows]) for row0, nrows in efc["contact_rows"]]
        )
    else:
        efc_force_contact = jnp.zeros(ncon, dtype)

    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc_constraint,
        efc_force_contact=efc_force_contact,
    )
