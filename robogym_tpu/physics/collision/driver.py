"""Collision driver: static pair table -> fixed-size Contact set.

TPU-first two-phase design (replaces MuJoCo's dynamic broadphase + per-pair
narrowphase dispatch):

  1. Pairs are grouped AT COMPILE TIME by (collider class, condim): every
     pair in a group runs the same narrowphase code and produces the same
     facet structure, so a group is one vmapped kernel.
  2. Per group, a cheap bounding-sphere broadphase scores all pairs, and
     `lax.top_k` selects a fixed-size active subset (the group's contact
     budget — the analogue of the reference's nconmax sizing, cube_env.py:
     229-243). Narrowphase runs only on the gathered winners.

Everything is static-shaped; per-env divergence is handled by masks. The
result Contact has per-slot *traced* geom ids (gathered) but a static group
layout: each slot's condim/facet structure is compile-time known, which the
constraint assembler relies on.

Contact parameter mixing follows MuJoCo mj_contactParam (solmix weighting,
elementwise-max friction, priority override).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Contact, Data, GeomType, Model, ModelConst
from robogym_tpu.physics.collision import convex as cx
from robogym_tpu.physics.collision import primitives as prim

BIG = 1e10

# ncon per pair and collider kind per geom-type pair
_PLANE_PRIM = {
    GeomType.SPHERE: (prim.plane_sphere, 1),
    GeomType.CAPSULE: (prim.plane_capsule, 2),
    GeomType.BOX: (prim.plane_box, 4),
}
_PRIM = {
    (GeomType.SPHERE, GeomType.SPHERE): (prim.sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.CAPSULE): (prim.sphere_capsule, 1),
    (GeomType.SPHERE, GeomType.BOX): (prim.sphere_box, 1),
    (GeomType.CAPSULE, GeomType.CAPSULE): (prim.capsule_capsule, 1),
    (GeomType.CAPSULE, GeomType.BOX): (prim.capsule_box, 2),
    (GeomType.BOX, GeomType.BOX): (prim.box_box, 8),
}
_CONVEX_TYPES = (
    GeomType.SPHERE,
    GeomType.CAPSULE,
    GeomType.CYLINDER,
    GeomType.ELLIPSOID,
    GeomType.BOX,
    GeomType.MESH,
)

# default per-group active-pair budget (broadphase top-k size)
DEFAULT_GROUP_CAP = 48


@functools.lru_cache(maxsize=32)
def build_groups(const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP):
    """Compile-time grouping of the pair table.

    Returns list of dicts with static arrays:
      kind: 'plane_prim' | 'prim' | 'plane_convex' | 'convex'
      fn/ncon, t1/t2, condim, g1/g2 (np arrays), K (active budget)
    """
    pairs = const.collision_pairs
    groups: Dict[Tuple, Dict] = {}
    for p in range(len(pairs)):
        g1, g2 = int(pairs[p, 0]), int(pairs[p, 1])
        t1, t2 = int(const.geom_type[g1]), int(const.geom_type[g2])
        condim = max(int(const.geom_condim[g1]), int(const.geom_condim[g2]))
        if t1 == GeomType.PLANE:
            if t2 in _PLANE_PRIM:
                kind, fn, ncon = "plane_prim", _PLANE_PRIM[t2][0], _PLANE_PRIM[t2][1]
            elif t2 == GeomType.MESH:
                kind, fn, ncon = "plane_convex", None, 4
            else:
                kind, fn, ncon = "plane_convex", None, 4
        elif (t1, t2) in _PRIM:
            kind, fn, ncon = "prim", _PRIM[(t1, t2)][0], _PRIM[(t1, t2)][1]
        elif t1 == GeomType.BOX and t2 == GeomType.MESH:
            kind, fn, ncon = "box_convex", None, 4
        elif t1 in _CONVEX_TYPES and t2 in _CONVEX_TYPES:
            kind, fn, ncon = "convex", None, 1
        else:
            continue
        key = (kind, t1, t2, condim)
        grp = groups.setdefault(
            key,
            dict(kind=kind, fn=fn, ncon=ncon, t1=t1, t2=t2, condim=condim,
                 g1=[], g2=[]),
        )
        grp["g1"].append(g1)
        grp["g2"].append(g2)

    out = []
    for key in sorted(groups.keys()):
        grp = groups[key]
        grp["g1"] = np.asarray(grp["g1"], np.int32)
        grp["g2"] = np.asarray(grp["g2"], np.int32)
        n = len(grp["g1"])
        grp["K"] = min(n, group_cap)
        out.append(grp)
    return out


def geom_rbound(m: Model) -> jax.Array:
    """Bounding-sphere radius per geom (runtime: sizes are randomizable)."""
    c = m.const
    t = c.geom_type
    s = m.geom_size
    rb = jnp.zeros(c.ngeom, s.dtype)
    rb = jnp.where(jnp.asarray(t == GeomType.SPHERE), s[:, 0], rb)
    rb = jnp.where(jnp.asarray(t == GeomType.CAPSULE), s[:, 0] + s[:, 1], rb)
    rb = jnp.where(
        jnp.asarray(t == GeomType.CYLINDER), jnp.sqrt(s[:, 0] ** 2 + s[:, 1] ** 2), rb
    )
    box_like = (t == GeomType.BOX) | (t == GeomType.ELLIPSOID)
    rb = jnp.where(jnp.asarray(box_like), jnp.linalg.norm(s, axis=-1), rb)
    if c.nmesh:
        vert_r = jnp.linalg.norm(m.mesh_convex_vert, axis=-1)  # (nmesh, V)
        vert_r = jnp.where(m.mesh_convex_mask > 0, vert_r, 0.0)
        mesh_r = jnp.max(vert_r, axis=-1)  # (nmesh,)
        mesh_ids = jnp.clip(jnp.asarray(c.geom_dataid), 0, c.nmesh - 1)
        rb = jnp.where(jnp.asarray(t == GeomType.MESH), mesh_r[mesh_ids], rb)
    return rb


def _support_batch(gtype: int):
    """Batched support function for a geom type: (data, dir (3,)) -> point."""
    if gtype == GeomType.BOX:
        def sup(data, direction):
            local = data["xmat"].T @ direction
            return data["xpos"] + data["xmat"] @ (jnp.sign(local) * data["size"])
    elif gtype == GeomType.SPHERE:
        def sup(data, direction):
            n = direction / (jnp.linalg.norm(direction) + 1e-12)
            return data["xpos"] + n * data["size"][0]
    elif gtype == GeomType.CAPSULE:
        def sup(data, direction):
            n = direction / (jnp.linalg.norm(direction) + 1e-12)
            axis = data["xmat"][:, 2]
            return (
                data["xpos"]
                + jnp.sign(jnp.dot(axis, n)) * axis * data["size"][1]
                + n * data["size"][0]
            )
    elif gtype == GeomType.CYLINDER:
        def sup(data, direction):
            n = direction / (jnp.linalg.norm(direction) + 1e-12)
            axis = data["xmat"][:, 2]
            ax = jnp.dot(axis, n)
            radial = n - ax * axis
            rn = jnp.linalg.norm(radial) + 1e-12
            return (
                data["xpos"]
                + jnp.sign(ax) * axis * data["size"][1]
                + radial / rn * data["size"][0]
            )
    elif gtype == GeomType.ELLIPSOID:
        def sup(data, direction):
            local = data["xmat"].T @ direction
            v = data["size"] ** 2 * local
            v = v / (jnp.linalg.norm(data["size"] * local) + 1e-12)
            return data["xpos"] + data["xmat"] @ v
    elif gtype == GeomType.MESH:
        def sup(data, direction):
            world = data["xpos"] + data["vert"] @ data["xmat"].T
            dots = world @ direction
            dots = jnp.where(data["mask"] > 0, dots, -BIG)
            return world[jnp.argmax(dots)]
    else:
        raise NotImplementedError(f"support for type {gtype}")
    return sup


def _collide_convex_pair(sup1, sup2, d1, d2, c1, c2, n_refine=8):
    """Single-point convex collision for one gathered pair (vmapped).

    Coarse 43-direction sweep (EPA-lite) followed by projected-subgradient
    sharpening of the separating direction: the subgradient of
    s(d) = d.(sup_A(d) - sup_B(-d)) w.r.t. d is the witness difference
    (p1 - p2); descending it on the unit sphere converges the normal to the
    true face normal — without this, the 43-way quantized normal makes
    resting contacts chatter and inject energy."""
    dtype = c1.dtype
    d0 = c2 - c1
    d0 = d0 / (jnp.linalg.norm(d0) + 1e-12)
    dirs = jnp.concatenate([cx.DIRS42.astype(dtype), d0[None]], axis=0)

    def sep(dd):
        p1 = sup1(d1, dd)
        p2 = sup2(d2, -dd)
        return jnp.dot(dd, p1 - p2)

    seps = jax.vmap(sep)(dirs)
    k = jnp.argmin(seps)
    n = dirs[k]
    s_best = seps[k]

    def refine(i, carry):
        s_best, n = carry
        p1 = sup1(d1, n)
        p2 = sup2(d2, -n)
        w = p1 - p2
        # projected subgradient step on the unit sphere, decaying step size
        eta = 0.5 / (1.0 + i.astype(dtype))
        g = w - jnp.dot(w, n) * n
        gn = jnp.linalg.norm(g) + 1e-12
        cand = n - eta * g / gn * jnp.minimum(gn, 1.0)
        cand = cand / (jnp.linalg.norm(cand) + 1e-12)
        s_cand = jnp.dot(cand, sup1(d1, cand) - sup2(d2, -cand))
        better = s_cand < s_best
        return (
            jnp.where(better, s_cand, s_best),
            jnp.where(better, cand, n),
        )

    s_best, n = jax.lax.fori_loop(
        0, n_refine, refine, (s_best, n)
    )
    dist = -s_best
    p1 = sup1(d1, n)
    p2 = sup2(d2, -n)
    pos = 0.5 * (p1 + p2)
    return dist, pos, n


def _collide_box_convex_pair(sup2, dbox, d2, c2, n_refine=8):
    """Box (geom1) vs convex hull (geom2): 4-point manifold.

    After the single-point solve, the hull is locally approximated by its
    tangent plane at the witness point (normal n); the box corners are
    tested against that plane, and lateral validity is enforced with hull
    support queries in the tangent directions. This produces the stable
    face-on-face manifold MuJoCo gets from multiple palm meshes + MPR
    (shadowhand chain.xml palm_a..f), which a single contact point cannot.
    """
    sup_box = _support_batch(GeomType.BOX)
    dist0, pos0, n = _collide_convex_pair(
        sup_box, sup2, dbox, d2, dbox["xpos"], c2, n_refine
    )
    dtype = dist0.dtype

    # tangent plane on the hull: passes through its support point along -n
    plane_pt = sup2(d2, -n)

    # 8 box corners
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], dtype,
    )
    corners = dbox["xpos"] + (signs * dbox["size"]) @ dbox["xmat"].T  # (8,3)
    cdist = (corners - plane_pt) @ (-n)     # penetration depth: <0 beyond plane

    # lateral validity: corner projection must be inside the hull footprint
    t1 = jnp.where(
        jnp.abs(n[0]) < 0.5, jnp.asarray([1.0, 0, 0], dtype),
        jnp.asarray([0.0, 1.0, 0], dtype),
    )
    t1 = t1 - jnp.dot(t1, n) * n
    t1 = t1 / (jnp.linalg.norm(t1) + 1e-12)
    t2 = jnp.cross(n, t1)
    tol = 5e-3

    def lateral_ok(corner):
        ok = jnp.asarray(True)
        for t in (t1, -t1, t2, -t2):
            bound = jnp.dot(t, sup2(d2, t))
            ok = ok & (jnp.dot(corner, t) <= bound + tol)
        return ok

    ok = jax.vmap(lateral_ok)(corners)
    cdist = jnp.where(ok, cdist, BIG)
    sel = jnp.argsort(cdist)[:4]
    dist4 = cdist[sel]
    pos4 = corners[sel] - (0.5 * dist4[:, None]) * n[None, :]
    # slot 3 falls back to the single-point witness when unused (covers
    # edge/vertex contact where no box corner passes the plane test)
    use_fallback = dist4[3] >= BIG / 2
    is3 = jnp.arange(4) == 3
    dist4 = jnp.where(is3 & use_fallback, dist0, dist4)
    pos4 = jnp.where((is3 & use_fallback)[:, None], pos0[None, :], pos4)
    return dist4, pos4, jnp.tile(n, (4, 1))


def _gather_geom(m: Model, d: Data, gids: jax.Array, gtype: int):
    data = dict(
        xpos=d.geom_xpos[gids],
        xmat=d.geom_xmat[gids],
        size=m.geom_size[gids],
    )
    if gtype == GeomType.MESH:
        mids = jnp.clip(jnp.asarray(m.const.geom_dataid)[gids], 0, m.const.nmesh - 1)
        data["vert"] = m.mesh_convex_vert[mids]
        data["mask"] = m.mesh_convex_mask[mids]
        data["center"] = data["xpos"] + jnp.einsum(
            "kij,kj->ki", data["xmat"], m.mesh_convex_center[mids]
        )
    else:
        data["center"] = data["xpos"]
    return data


def collision(m: Model, d: Data, group_cap: int = DEFAULT_GROUP_CAP) -> Data:
    """Fill d.contact. Slot layout is static given (const, group_cap)."""
    c = m.const
    if len(c.collision_pairs) == 0:
        return d
    dtype = d.qpos.dtype
    groups = build_groups(c, group_cap)
    rbound = geom_rbound(m)

    all_dist, all_pos, all_frame = [], [], []
    all_g1, all_g2 = [], []

    for grp in groups:
        g1_np, g2_np = grp["g1"], grp["g2"]
        n = len(g1_np)
        K, ncon = grp["K"], grp["ncon"]
        g1 = jnp.asarray(g1_np)
        g2 = jnp.asarray(g2_np)

        # --- broadphase: bounding-sphere overlap score
        margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
        cdist = jnp.linalg.norm(d.geom_xpos[g2] - d.geom_xpos[g1], axis=-1)
        if grp["kind"].startswith("plane"):
            # distance of bounding sphere above plane
            nrm = d.geom_xmat[g1][:, :, 2]
            h = jnp.einsum("ki,ki->k", d.geom_xpos[g2] - d.geom_xpos[g1], nrm)
            score = rbound[g2] + margin - h
        else:
            score = rbound[g1] + rbound[g2] + margin - cdist

        if K < n:
            score_k, sel = jax.lax.top_k(score, K)
            g1k, g2k = g1[sel], g2[sel]
            active_bp = score_k > 0
        else:
            g1k, g2k = g1, g2
            active_bp = score > 0

        # --- narrowphase (vmapped over the K winners)
        t1, t2 = grp["t1"], grp["t2"]
        if grp["kind"] == "plane_prim":
            fn = grp["fn"]
            dist, pos, normal = jax.vmap(
                lambda xp1, xm1, s1, xp2, xm2, s2: fn(xp1, xm1, s1, xp2, xm2, s2)
            )(
                d.geom_xpos[g1k], d.geom_xmat[g1k], m.geom_size[g1k],
                d.geom_xpos[g2k], d.geom_xmat[g2k], m.geom_size[g2k],
            )
        elif grp["kind"] == "prim":
            fn = grp["fn"]
            dist, pos, normal = jax.vmap(
                lambda xp1, xm1, s1, xp2, xm2, s2: fn(xp1, xm1, s1, xp2, xm2, s2)
            )(
                d.geom_xpos[g1k], d.geom_xmat[g1k], m.geom_size[g1k],
                d.geom_xpos[g2k], d.geom_xmat[g2k], m.geom_size[g2k],
            )
        elif grp["kind"] == "plane_convex":
            data2 = _gather_geom(m, d, g2k, t2)
            if t2 == GeomType.MESH:
                dist, pos, normal = jax.vmap(prim.plane_convex)(
                    d.geom_xpos[g1k], d.geom_xmat[g1k], m.geom_size[g1k],
                    data2["xpos"], data2["xmat"], data2["vert"], data2["mask"],
                )
            else:
                # treat primitive as its own hull: sample support dirs? use
                # box corners for BOX handled in plane_prim; others: sphere
                raise NotImplementedError
        elif grp["kind"] == "box_convex":
            sup2 = _support_batch(t2)
            data1 = _gather_geom(m, d, g1k, t1)
            data2 = _gather_geom(m, d, g2k, t2)
            dist, pos, normal = jax.vmap(
                lambda d1, d2, c2: _collide_box_convex_pair(sup2, d1, d2, c2)
            )(data1, data2, data2["center"])
        else:  # convex
            sup1 = _support_batch(t1)
            sup2 = _support_batch(t2)
            data1 = _gather_geom(m, d, g1k, t1)
            data2 = _gather_geom(m, d, g2k, t2)
            dist, pos, normal = jax.vmap(
                lambda d1, d2, c1, c2: _collide_convex_pair(sup1, sup2, d1, d2, c1, c2)
            )(data1, data2, data1["center"], data2["center"])
            dist, pos, normal = dist[:, None], pos[:, None], normal[:, None]

        # shape: (K, ncon) / (K, ncon, 3)
        if dist.ndim == 1:
            dist, pos, normal = dist[:, None], pos[:, None], normal[:, None]
        dist = jnp.where(active_bp[:, None], dist, BIG)

        all_dist.append(dist.reshape(-1))
        all_pos.append(pos.reshape(-1, 3))
        all_frame.append(normal.reshape(-1, 3))
        all_g1.append(jnp.repeat(g1k, ncon))
        all_g2.append(jnp.repeat(g2k, ncon))

    dist = jnp.concatenate(all_dist)
    pos = jnp.concatenate(all_pos)
    normal = jnp.concatenate(all_frame)
    g1s = jnp.concatenate(all_g1)
    g2s = jnp.concatenate(all_g2)

    solref, solimp, friction5, margin, gap = _mix_params(m, g1s, g2s)
    includemargin = margin - gap
    active = dist < includemargin

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
        geom1=g1s.astype(jnp.int32),
        geom2=g2s.astype(jnp.int32),
        active=active,
    )
    return d.replace(contact=contact)


def contact_slot_layout(const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP):
    """Static layout info per contact slot: (condim,) list matching the
    runtime Contact row order. Used by the constraint assembler."""
    groups = build_groups(const, group_cap)
    condims: List[int] = []
    for grp in groups:
        condims.extend([grp["condim"]] * (grp["K"] * grp["ncon"]))
    return condims


def n_contact_slots(const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP) -> int:
    return len(contact_slot_layout(const, group_cap))


def _mix_params(m: Model, g1, g2):
    """Contact solref/solimp/friction/margin for (traced) pair geom ids."""
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    m1 = m.geom_solmix[g1]
    m2 = m.geom_solmix[g2]
    w1 = m1 / jnp.maximum(m1 + m2, 1e-12)
    w1 = jnp.where((m1 < 1e-12) & (m2 < 1e-12), 0.5, w1)
    w1 = jnp.where((m1 < 1e-12) & (m2 >= 1e-12), 0.0, w1)
    w1 = jnp.where((m2 < 1e-12) & (m1 >= 1e-12), 1.0, w1)
    w1 = w1[:, None]

    solref_mix = w1 * m.geom_solref[g1] + (1 - w1) * m.geom_solref[g2]
    direct = (m.geom_solref[g1, 0] <= 0) | (m.geom_solref[g2, 0] <= 0)
    solref_min = jnp.minimum(m.geom_solref[g1], m.geom_solref[g2])
    solref = jnp.where(direct[:, None], solref_min, solref_mix)
    solimp = w1 * m.geom_solimp[g1] + (1 - w1) * m.geom_solimp[g2]
    fric = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
    margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
    gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])

    use1 = (p1 > p2)[:, None]
    use2 = (p2 > p1)[:, None]
    solref = jnp.where(use1, m.geom_solref[g1], jnp.where(use2, m.geom_solref[g2], solref))
    solimp = jnp.where(use1, m.geom_solimp[g1], jnp.where(use2, m.geom_solimp[g2], solimp))
    f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
    fric = jnp.where(use1, f1, jnp.where(use2, f2, fric))
    friction5 = jnp.stack(
        [fric[:, 0], fric[:, 0], fric[:, 1], fric[:, 2], fric[:, 2]], axis=-1
    )
    return solref, solimp, friction5, margin, gap


def _orthogonal(n: jax.Array) -> jax.Array:
    helper = jnp.where(
        jnp.abs(n[..., :1]) < 0.5,
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], n.dtype), n.shape),
    )
    t = jnp.cross(n, helper)
    return t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
