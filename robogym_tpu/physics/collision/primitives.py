"""Analytic narrowphase collision functions (plane/sphere/capsule/box).

Each function returns fixed-size contact candidates:
    dist:  (n,)   signed distance (negative = penetrating)
    pos:   (n,3)  contact midpoint
    normal:(n,3)  unit normal, pointing from geom1 into geom2

All are pure element-wise math — vmapped over pairs and envs they become
large fused VPU kernels. Inactive slots carry dist=+inf.

Semantics follow MuJoCo's primitive colliders (single/multi point counts per
pair type as allocated in robogym_tpu.mjcf.compiler._PAIR_NCON).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BIG = 1e10


def _pad(dist, pos, normal, n):
    """Pad contact set to n slots with inactive entries."""
    k = dist.shape[0]
    if k == n:
        return dist, pos, normal
    pad = n - k
    dist = jnp.concatenate([dist, jnp.full((pad,), BIG, dist.dtype)])
    pos = jnp.concatenate([pos, jnp.zeros((pad, 3), pos.dtype)])
    normal = jnp.concatenate(
        [normal, jnp.tile(jnp.asarray([0.0, 0, 1.0], normal.dtype), (pad, 1))]
    )
    return dist, pos, normal


# --- plane functions -------------------------------------------------------
# plane frame: normal is +z of the plane's rotation matrix


def plane_sphere(xp1, xm1, s1, xp2, xm2, s2):
    n = xm1[:, 2]
    r = s2[0]
    cdist = jnp.dot(xp2 - xp1, n)
    dist = cdist - r
    pos = xp2 - n * (r + 0.5 * dist)
    return dist[None], pos[None], n[None]


def plane_capsule(xp1, xm1, s1, xp2, xm2, s2):
    n = xm1[:, 2]
    r, hh = s2[0], s2[1]
    axis = xm2[:, 2]
    ends = jnp.stack([xp2 + axis * hh, xp2 - axis * hh])  # (2,3)
    cdist = (ends - xp1) @ n
    dist = cdist - r
    pos = ends - n[None, :] * (r + 0.5 * dist)[:, None]
    return dist, pos, jnp.tile(n, (2, 1))


def plane_box(xp1, xm1, s1, xp2, xm2, s2):
    """Plane vs box: ALL 8 corners as slots (at most 4 can touch a plane;
    the rest read dist>0 and stay inactive). Emitting every candidate keeps
    the kernel free of argsort + per-env gathers, which dominate on TPU —
    slots are cheap, sorts are not."""
    n = xm1[:, 2]
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
        xp1.dtype,
    )
    corners = xp2 + (signs * s2) @ xm2.T  # (8,3)
    dist = (corners - xp1) @ n
    pos = corners - 0.5 * dist[:, None] * n[None, :]
    return dist, pos, jnp.tile(n, (8, 1))


def plane_convex(xp1, xm1, s1, xp2, xm2, verts, mask):
    """Plane vs convex hull: 4 deepest vertices below the plane."""
    n = xm1[:, 2]
    world = xp2 + verts @ xm2.T  # (V,3)
    dist = (world - xp1) @ n
    dist = jnp.where(mask > 0, dist, BIG)
    idx = jnp.argsort(dist)[:4]
    dist4 = dist[idx]
    pos4 = world[idx] - 0.5 * dist4[:, None] * n[None, :]
    return dist4, pos4, jnp.tile(n, (4, 1))


# --- sphere functions ------------------------------------------------------


def sphere_sphere(xp1, xm1, s1, xp2, xm2, s2):
    r1, r2 = s1[0], s2[0]
    dvec = xp2 - xp1
    dist_c = jnp.linalg.norm(dvec) + 1e-12
    n = dvec / dist_c
    dist = dist_c - r1 - r2
    pos = xp1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _closest_on_segment(p, a, b):
    ab = b - a
    t = jnp.clip(jnp.dot(p - a, ab) / (jnp.dot(ab, ab) + 1e-12), 0.0, 1.0)
    return a + t * ab


def sphere_capsule(xp1, xm1, s1, xp2, xm2, s2):
    r1 = s1[0]
    r2, hh = s2[0], s2[1]
    axis = xm2[:, 2]
    closest = _closest_on_segment(xp1, xp2 - axis * hh, xp2 + axis * hh)
    dvec = closest - xp1
    dist_c = jnp.linalg.norm(dvec) + 1e-12
    n = dvec / dist_c
    dist = dist_c - r1 - r2
    pos = xp1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], n[None]


def sphere_box(xp1, xm1, s1, xp2, xm2, s2):
    r = s1[0]
    # sphere center in box frame
    local = xm2.T @ (xp1 - xp2)
    clamped = jnp.clip(local, -s2, s2)
    inside = jnp.all(jnp.abs(local) < s2)
    # if inside, push to nearest face
    face_dist = s2 - jnp.abs(local)
    k = jnp.argmin(face_dist)
    push = clamped.at[k].set(jnp.sign(local[k]) * s2[k])
    closest_local = jnp.where(inside, push, clamped)
    closest = xp2 + xm2 @ closest_local
    dvec = closest - xp1
    dn = jnp.linalg.norm(dvec) + 1e-12
    n = jnp.where(inside, -dvec / dn, dvec / dn)
    dist = jnp.where(inside, -(dn + r), dn - r)
    pos = xp1 + n * (r + 0.5 * dist)
    return dist[None], pos[None], n[None]


def capsule_capsule(xp1, xm1, s1, xp2, xm2, s2):
    r1, h1 = s1[0], s1[1]
    r2, h2 = s2[0], s2[1]
    a0 = xp1 - xm1[:, 2] * h1
    a1 = xp1 + xm1[:, 2] * h1
    b0 = xp2 - xm2[:, 2] * h2
    b1 = xp2 + xm2[:, 2] * h2
    pa, pb = _closest_segment_segment(a0, a1, b0, b1)
    dvec = pb - pa
    dn = jnp.linalg.norm(dvec) + 1e-12
    n = dvec / dn
    dist = dn - r1 - r2
    pos = pa + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _closest_segment_segment(a0, a1, b0, b1):
    """Closest points between segments (standard clamped solution)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.dot(d1, d1) + 1e-12
    e = jnp.dot(d2, d2) + 1e-12
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-12, jnp.clip((b * f - c * e) / denom, 0.0, 1.0), 0.0)
    t = (b * s + f) / e
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / a, 0.0, 1.0)
    return a0 + d1 * s, b0 + d2 * t_cl


# --- box functions -----------------------------------------------------------


def _box_corners(xp, xm, s):
    """(8,3) world-frame corners."""
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
        xp.dtype,
    )
    return xp + (signs * s) @ xm.T


def box_box(xp1, xm1, s1, xp2, xm2, s2):
    """Multi-point box-box manifold: SAT over the 15 separating axes picks
    the contact normal; the manifold is corner-in-box candidates from both
    boxes (covers face-face and edge-face resting contact — the case the
    single-point convex fallback cannot stabilize) plus the SAT witness
    point for edge-edge crossings. Up to 8 points (MuJoCo's mjc_BoxBox
    budget, compiler._PAIR_NCON).
    """
    dtype = xp1.dtype
    eps = 1e-9

    # --- SAT in world frame
    axes1 = xm1.T  # rows = box1 face normals (world)
    axes2 = xm2.T
    cross = jnp.reshape(
        jnp.cross(axes1[:, None, :], axes2[None, :, :]), (9, 3)
    )
    axes = jnp.concatenate([axes1, axes2, cross], axis=0)  # (15,3)
    norms = jnp.linalg.norm(axes, axis=-1, keepdims=True)
    valid = norms[:, 0] > 1e-6
    axes = axes / jnp.maximum(norms, eps)

    t = xp2 - xp1

    def depth_along(a):
        proj1 = jnp.sum(jnp.abs(a @ xm1) * s1)
        proj2 = jnp.sum(jnp.abs(a @ xm2) * s2)
        return proj1 + proj2 - jnp.abs(jnp.dot(t, a))

    depths = jax.vmap(depth_along)(axes)           # >0 = overlapping
    depths = jnp.where(valid, depths, BIG)
    # min-axis select via one-hot (argmin + gather lower to per-env scalar
    # loops on TPU); a static ramp breaks exact ties toward the lower index
    ramp = jnp.arange(depths.shape[0], dtype=dtype) * 1e-7
    dsel = depths + ramp
    w = (dsel <= jnp.min(dsel)).astype(dtype)
    w = w / jnp.maximum(jnp.sum(w), 1.0)
    sat_depth = jnp.sum(depths * w)                # min overlap (can be <0)
    n = jnp.sum(axes * w[:, None], axis=0)
    # exact ties can survive the ramp at large depth magnitudes (f32
    # rounding absorbs the 1e-7); renormalize so an averaged pair of SAT
    # axes still yields a unit normal
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
    n = jnp.where(jnp.dot(n, t) < 0, -n, n)        # point from box1 to box2

    # --- manifold candidates: corners of box2 measured against box1 and
    # corners of box1 against box2 (distance along the OTHER box's surface)
    def corner_candidates(xp_a, xm_a, s_a, xp_b, xm_b, s_b, sign):
        """Corners of box b against box a. sign=+1 keeps normal from 1->2."""
        corners = _box_corners(xp_b, xm_b, s_b)          # (8,3)
        local = (corners - xp_a) @ xm_a                  # (8,3) in a-frame
        over = jnp.abs(local) - s_a                      # per-axis excess
        dist = jnp.max(over, axis=-1)                    # <0 strictly inside
        # only corners actually inside box a (within tolerance) are valid
        # manifold points; anything else is covered by the other corner set
        # or the SAT witness point
        inside = jnp.all(over < 1e-3, axis=-1)
        dist = jnp.where(inside, dist, BIG)
        pos = corners - (0.5 * dist)[:, None] * (sign * n)[None, :]
        return dist, pos

    d2, p2 = corner_candidates(xp1, xm1, s1, xp2, xm2, s2, +1.0)
    d1, p1 = corner_candidates(xp2, xm2, s2, xp1, xm1, s1, -1.0)

    # SAT witness point for edge-edge (support midpoint). sign() with a
    # deadband: a box axis exactly perpendicular to n (face-face) makes
    # sign(dot) knife-edge on rounding — the deadband deterministically
    # picks the face midpoint on every backend/kernel path.
    dsign = lambda x: jnp.where(jnp.abs(x) > 1e-6, jnp.sign(x), 0.0)
    sup1 = xp1 + xm1 @ (dsign(xm1.T @ n) * s1)
    sup2 = xp2 + xm2 @ (dsign(xm2.T @ (-n)) * s2)
    d_sat = -sat_depth
    p_sat = 0.5 * (sup1 + sup2)

    dist_all = jnp.concatenate([d2, d1, d_sat[None]])          # (17,)
    pos_all = jnp.concatenate([p2, p1, p_sat[None]], axis=0)   # (17,3)

    # ALL 17 candidates become slots (invalid ones carry dist=BIG and stay
    # inactive). The former top-8 argsort + gathers cost ~3 ms/substep at
    # B=1024 for 15 pairs; slots are cheap, per-env sorts are not.
    return dist_all, pos_all, jnp.tile(n, (17, 1))


def capsule_box(xp1, xm1, s1, xp2, xm2, s2):
    """Capsule (geom1) vs box (geom2): up to 2 points — the two capsule
    endpoint spheres plus the deepest interior point, top-2 by depth
    (MuJoCo's mjc_CapsuleBox also returns up to 2)."""
    r, hh = s1[0], s1[1]
    axis = xm1[:, 2]
    ends = jnp.stack([xp1 - axis * hh, xp1 + axis * hh])

    def sphere_point(p):
        local = xm2.T @ (p - xp2)
        clamped = jnp.clip(local, -s2, s2)
        inside = jnp.all(jnp.abs(local) < s2)
        face_dist = s2 - jnp.abs(local)
        k = jnp.argmin(face_dist)
        push = clamped.at[k].set(jnp.sign(local[k]) * s2[k])
        closest_local = jnp.where(inside, push, clamped)
        closest = xp2 + xm2 @ closest_local
        dvec = closest - p
        dn = jnp.linalg.norm(dvec) + 1e-12
        nrm = jnp.where(inside, -dvec / dn, dvec / dn)
        dist = jnp.where(inside, -(dn + r), dn - r)
        pos = p + nrm * (r + 0.5 * dist)
        return dist, pos, nrm

    # closest point of the segment to the box center line: sample midpoint too
    local_c = xm2.T @ (xp1 - xp2)
    # project box center onto capsule segment
    tmid = jnp.clip(jnp.dot(xp2 - ends[0], axis) / (2 * hh + 1e-12), 0.0, 1.0)
    mid = ends[0] + (ends[1] - ends[0]) * tmid

    cands = jnp.stack([ends[0], ends[1], mid])
    dist, pos, nrm = jax.vmap(sphere_point)(cands)
    sel = jnp.argsort(dist)[:2]
    return dist[sel], pos[sel], nrm[sel]


def plane_cylinder(xp1, xm1, s1, xp2, xm2, s2):
    """Plane vs cylinder: up to 4 rim/face points (mjc_PlaneCylinder-like:
    both end-disc deep points + perpendicular rim pair on the deeper disc)."""
    n = xm1[:, 2]
    r, hh = s2[0], s2[1]
    axis = xm2[:, 2]
    na = jnp.dot(n, axis)
    # radial direction on the disc pointing most against the plane normal
    rd = -(n - na * axis)
    rdn = jnp.linalg.norm(rd)
    safe_rd = jnp.where(rdn > 1e-8, rd / (rdn + 1e-12), _any_orth(axis))
    perp = jnp.cross(axis, safe_rd)
    c_lo = xp2 - axis * hh
    c_hi = xp2 + axis * hh
    deep_c = jnp.where(jnp.dot(c_lo - xp1, n) < jnp.dot(c_hi - xp1, n), c_lo, c_hi)
    cands = jnp.stack([
        c_lo + safe_rd * r,
        c_hi + safe_rd * r,
        deep_c + perp * r,
        deep_c - perp * r,
    ])
    dist = (cands - xp1) @ n
    pos = cands - 0.5 * dist[:, None] * n[None, :]
    return dist, pos, jnp.tile(n, (4, 1))


def plane_ellipsoid(xp1, xm1, s1, xp2, xm2, s2):
    """Plane vs ellipsoid: support point along -n."""
    n = xm1[:, 2]
    local = xm2.T @ (-n)
    v = s2 * s2 * local
    v = v / (jnp.linalg.norm(s2 * local) + 1e-12)
    p = xp2 + xm2 @ v
    dist = jnp.dot(p - xp1, n)
    pos = p - 0.5 * dist * n
    return dist[None], pos[None], n[None]


def _any_orth(v):
    helper = jnp.where(
        jnp.abs(v[0]) < 0.5,
        jnp.asarray([1.0, 0.0, 0.0], v.dtype),
        jnp.asarray([0.0, 1.0, 0.0], v.dtype),
    )
    t = jnp.cross(v, helper)
    return t / (jnp.linalg.norm(t) + 1e-12)
