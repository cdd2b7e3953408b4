"""Collision driver: static pair table -> fixed-size Contact set.

The pair table is precomputed at compile time (contype/conaffinity masks,
weld/parent filtering, <contact> excludes — see
robogym_tpu/mjcf/compiler.py). At runtime every pair is evaluated every step
(static shapes; XLA batches same-type pairs into fused kernels) and contacts
are activated by `dist < includemargin` masks — the TPU analogue of MuJoCo's
dynamic contact array, sized like the reference's nconmax budgets
(/root/reference/robogym/envs/dactyl/common/cube_env.py:229-243).

Contact parameter mixing follows MuJoCo (mj_contactParam): solmix-weighted
solref/solimp, elementwise-max friction, max condim/margin/gap, priority
override.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Contact, Data, GeomType, Model
from robogym_tpu.physics.collision import convex as cx
from robogym_tpu.physics.collision import primitives as prim

BIG = 1e10


def _mix_params(m: Model, g1: np.ndarray, g2: np.ndarray):
    """Contact solref/solimp/friction/margin for pair arrays (static ids)."""
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    m1 = m.geom_solmix[g1]
    m2 = m.geom_solmix[g2]
    w1 = m1 / jnp.maximum(m1 + m2, 1e-12)
    w1 = jnp.where((m1 < 1e-12) & (m2 < 1e-12), 0.5, w1)
    w1 = jnp.where((m1 < 1e-12) & (m2 >= 1e-12), 0.0, w1)
    w1 = jnp.where((m2 < 1e-12) & (m1 >= 1e-12), 1.0, w1)
    w1 = w1[:, None]

    solref_mix = w1 * m.geom_solref[g1] + (1 - w1) * m.geom_solref[g2]
    # direct (negative) solref: take elementwise min
    direct = (m.geom_solref[g1, 0] <= 0) | (m.geom_solref[g2, 0] <= 0)
    solref_min = jnp.minimum(m.geom_solref[g1], m.geom_solref[g2])
    solref = jnp.where(direct[:, None], solref_min, solref_mix)
    solimp = w1 * m.geom_solimp[g1] + (1 - w1) * m.geom_solimp[g2]
    fric = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
    friction5 = jnp.stack(
        [fric[:, 0], fric[:, 0], fric[:, 1], fric[:, 2], fric[:, 2]], axis=-1
    )
    margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
    gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])

    # priority override
    use1 = (p1 > p2)[:, None]
    use2 = (p2 > p1)[:, None]
    solref = jnp.where(use1, m.geom_solref[g1], jnp.where(use2, m.geom_solref[g2], solref))
    solimp = jnp.where(use1, m.geom_solimp[g1], jnp.where(use2, m.geom_solimp[g2], solimp))
    f1 = m.geom_friction[g1]
    f2 = m.geom_friction[g2]
    fric_p = jnp.where(use1, f1, jnp.where(use2, f2, fric))
    friction5 = jnp.stack(
        [fric_p[:, 0], fric_p[:, 0], fric_p[:, 1], fric_p[:, 2], fric_p[:, 2]],
        axis=-1,
    )
    return solref, solimp, friction5, margin, gap


def _geom_sup(m: Model, d: Data, gid: int):
    """Support function + center for one geom (static id)."""
    t = int(m.const.geom_type[gid])
    xp, xm = d.geom_xpos[gid], d.geom_xmat[gid]
    if t == GeomType.BOX:
        return cx.make_box_support(xp, xm, m.geom_size[gid]), xp
    if t == GeomType.SPHERE:
        return cx.make_sphere_support(xp, m.geom_size[gid, 0]), xp
    if t == GeomType.CAPSULE:
        return cx.make_capsule_support(xp, xm, m.geom_size[gid]), xp
    if t == GeomType.CYLINDER:
        return cx.make_cylinder_support(xp, xm, m.geom_size[gid]), xp
    if t == GeomType.ELLIPSOID:
        return cx.make_ellipsoid_support(xp, xm, m.geom_size[gid]), xp
    if t == GeomType.MESH:
        mid = int(m.const.geom_dataid[gid])
        sup = cx.make_hull_support(
            xp, xm, m.mesh_convex_vert[mid], m.mesh_convex_mask[mid]
        )
        center = xp + xm @ m.mesh_convex_center[mid]
        return sup, center
    raise NotImplementedError(f"support for geom type {t}")


_PRIM_FN = {
    (GeomType.PLANE, GeomType.SPHERE): (prim.plane_sphere, 1),
    (GeomType.PLANE, GeomType.CAPSULE): (prim.plane_capsule, 2),
    (GeomType.PLANE, GeomType.BOX): (prim.plane_box, 4),
    (GeomType.SPHERE, GeomType.SPHERE): (prim.sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.CAPSULE): (prim.sphere_capsule, 1),
    (GeomType.SPHERE, GeomType.BOX): (prim.sphere_box, 1),
    (GeomType.CAPSULE, GeomType.CAPSULE): (prim.capsule_capsule, 1),
}


def collision(m: Model, d: Data) -> Data:
    """Fill d.contact for the static pair table."""
    c = m.const
    pairs = c.collision_pairs
    npair = len(pairs)
    dtype = d.qpos.dtype
    if npair == 0:
        return d

    dists: List[jax.Array] = []
    poss: List[jax.Array] = []
    frames: List[jax.Array] = []
    g1s: List[int] = []
    g2s: List[int] = []

    # process pairs in table order so contact row layout is static
    for p in range(npair):
        g1, g2 = int(pairs[p, 0]), int(pairs[p, 1])
        t1, t2 = int(c.geom_type[g1]), int(c.geom_type[g2])
        ncon = int(c.pair_ncon[p])
        key = (t1, t2)
        if key in _PRIM_FN:
            fn, nfn = _PRIM_FN[key]
            dist, pos, normal = fn(
                d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
                d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
            )
        elif t1 == GeomType.PLANE and t2 == GeomType.MESH:
            mid = int(c.geom_dataid[g2])
            dist, pos, normal = prim.plane_convex(
                d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
                d.geom_xpos[g2], d.geom_xmat[g2],
                m.mesh_convex_vert[mid], m.mesh_convex_mask[mid],
            )
        else:
            sup1, c1 = _geom_sup(m, d, g1)
            sup2, c2 = _geom_sup(m, d, g2)
            dist, pos, normal = cx.collide_convex_refined(sup1, sup2, c1, c2)
        # pad/trim to allocated slots
        k = dist.shape[0]
        if k < ncon:
            dist, pos, normal = prim._pad(dist, pos, normal, ncon)
        elif k > ncon:
            dist, pos, normal = dist[:ncon], pos[:ncon], normal[:ncon]
        dists.append(dist)
        poss.append(pos)
        frames.append(normal)
        g1s.extend([g1] * ncon)
        g2s.extend([g2] * ncon)

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    normal = jnp.concatenate(frames)

    g1_arr = np.asarray(g1s, np.int32)
    g2_arr = np.asarray(g2s, np.int32)
    solref, solimp, friction5, margin, gap = _mix_params(m, g1_arr, g2_arr)
    includemargin = margin - gap
    active = dist < includemargin

    # tangent frame: rows (normal, t1, t2)
    t1v = _orthogonal(normal)
    t2v = jnp.cross(normal, t1v)
    frame = jnp.stack([normal, t1v, t2v], axis=-2)

    contact = Contact(
        dist=dist.astype(dtype),
        pos=pos.astype(dtype),
        frame=frame.astype(dtype),
        includemargin=includemargin.astype(dtype),
        friction=friction5.astype(dtype),
        solref=solref.astype(dtype),
        solimp=solimp.astype(dtype),
        geom1=jnp.asarray(g1_arr),
        geom2=jnp.asarray(g2_arr),
        active=active,
    )
    return d.replace(contact=contact)


def _orthogonal(n: jax.Array) -> jax.Array:
    helper = jnp.where(
        jnp.abs(n[..., :1]) < 0.5,
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], n.dtype), n.shape),
    )
    t = jnp.cross(n, helper)
    return t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
