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
    GeomType.BOX: (prim.plane_box, 8),
    GeomType.CYLINDER: (prim.plane_cylinder, 4),
    GeomType.ELLIPSOID: (prim.plane_ellipsoid, 1),
}
_PRIM = {
    (GeomType.SPHERE, GeomType.SPHERE): (prim.sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.CAPSULE): (prim.sphere_capsule, 1),
    (GeomType.SPHERE, GeomType.BOX): (prim.sphere_box, 1),
    (GeomType.CAPSULE, GeomType.CAPSULE): (prim.capsule_capsule, 1),
    (GeomType.CAPSULE, GeomType.BOX): (prim.capsule_box, 2),
    # box_box emits its full candidate set (8+8 corners + SAT witness) —
    # the former top-8 selection needed per-env argsort+gather (slow on TPU)
    (GeomType.BOX, GeomType.BOX): (prim.box_box, 17),
}
_CONVEX_TYPES = (
    GeomType.SPHERE,
    GeomType.CAPSULE,
    GeomType.CYLINDER,
    GeomType.ELLIPSOID,
    GeomType.BOX,
    GeomType.MESH,
)
_HULL_TYPES_STATIC = (GeomType.BOX, GeomType.MESH)

# default per-group active-pair budget (broadphase top-k size); mesh-mesh
# (hand self-collision, 899 pairs in the locked world) rarely has more than
# a handful of active pairs, so it gets a tighter budget
DEFAULT_GROUP_CAP = 48
# plane_convex: the locked world measures 0 broadphase-active pairs over
# whole rollouts (the hand hovers above the floor; dropped-cube contacts
# ride plane_prim) — 8 winners is generous there, and multi-object
# rearrange/holdout worlds scale it up via opt.group_cap
# (scale_contact_budgets raises group_cap per object, and build_groups
# scales kind caps proportionally below). Winner selection is deepest-K,
# so over-budget states drop the SHALLOWEST pairs, not arbitrary ones.
# convex (hand self-collision): broadphase-active pairs average ~97 but
# TOUCHING pairs measure mean 0.11 / p99 1 / max 3 over random locked
# rollouts (scripts/measure_active.py) — deepest-8 keeps every real
# contact with >2x headroom at half the narrowphase-kernel cost
KIND_GROUP_CAP = {"convex": 8, "box_convex": 32, "plane_convex": 8}
# bases used when the env RAISES group_cap (dense multi-object scenes):
# mesh-object piles (bookshelf books, ycb stacks) carry many simultaneous
# mesh-mesh support contacts — the hand-tuned 8 does not transfer there
KIND_GROUP_CAP_DENSE = {"convex": 16, "box_convex": 32, "plane_convex": 8}


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
            # hull-hull (mesh-mesh) pairs involving a FREE body emit a
            # 4-point manifold via the same fused kernel the box-hull path
            # uses: a single contact point cannot hold a resting/wedged
            # object (a bookshelf book squeezed between shelf walls
            # extrudes upward at constant velocity with 1-point contacts).
            # Articulated-link pairs (hand finger-finger brushes: touching
            # p99 = 1, actuated on both sides) keep the cheaper single
            # point — in-hand conformance holds either way and the
            # manifold kernel costs ~3% of the locked step. Round-geom
            # pairs are single-point by construction.
            both_hull = t1 in _HULL_TYPES_STATIC and t2 in _HULL_TYPES_STATIC
            has_free = _touches_free_body(const, g1) or _touches_free_body(
                const, g2
            )
            kind, fn, ncon = (
                "convex", None, 4 if (both_hull and has_free) else 1
            )
        else:
            continue
        # ncon is part of the key: hull-hull pairs with/without a
        # free body carry different manifold widths
        key = (kind, t1, t2, ncon)
        grp = groups.setdefault(
            key,
            dict(kind=kind, fn=fn, ncon=ncon, t1=t1, t2=t2,
                 g1=[], g2=[], condim=[]),
        )
        grp["g1"].append(g1)
        grp["g2"].append(g2)
        grp["condim"].append(condim)

    out = []
    ngeom = int(const.ngeom)
    for key in sorted(groups.keys()):
        grp = groups[key]
        grp["g1"] = np.asarray(grp["g1"], np.int32)
        grp["g2"] = np.asarray(grp["g2"], np.int32)
        grp["condim"] = np.asarray(grp["condim"], np.int32)
        n = len(grp["g1"])
        cap = KIND_GROUP_CAP.get(grp["kind"], group_cap)
        if group_cap > DEFAULT_GROUP_CAP:
            # dense scenes (opt.group_cap raised by the env) scale the
            # kind-specific caps proportionally, from the dense base
            base = KIND_GROUP_CAP_DENSE.get(grp["kind"], cap)
            cap = max(base, base * group_cap // DEFAULT_GROUP_CAP)
        grp["K"] = min(n, cap)
        # static pair->geom one-hot matrices: every runtime lookup of a
        # per-geom quantity for this group becomes a (n, ngeom) matmul (and
        # post-broadphase lookups a (K, n) @ (n, ngeom) composition). TPU
        # lowers per-env dynamic gathers to scalar loops — measured 1.5 ms
        # for one (B, 16) gather at B=1024 — while one-hot contractions run
        # on the MXU.
        P1 = np.zeros((n, ngeom), np.float32)
        P1[np.arange(n), grp["g1"]] = 1.0
        P2 = np.zeros((n, ngeom), np.float32)
        P2[np.arange(n), grp["g2"]] = 1.0
        grp["P1"], grp["P2"] = P1, P2
        out.append(grp)
    return out


def _touches_free_body(const: ModelConst, g: int) -> bool:
    """True when geom g's kinematic tree is rooted in a FREE joint (a
    movable object rather than an articulated robot link)."""
    from robogym_tpu.mjcf.model import JointType

    root = int(const.body_rootid[int(const.geom_bodyid[g])])
    adr = int(const.body_jntadr[root])
    num = int(const.body_jntnum[root])
    return any(
        int(const.jnt_type[j]) == JointType.FREE
        for j in range(adr, adr + num)
    )


def _onehot(sel: jax.Array, n: int, dtype) -> jax.Array:
    """(K,) int indices -> (K, n) one-hot float matrix (exact 0/1)."""
    return (
        sel[:, None] == jax.lax.iota(jnp.int32, n)[None, :]
    ).astype(dtype)


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


def geom_capsules(m: Model, d: Data):
    """Per-geom conservative world-frame bounding capsule: (a, b, r) with
    segment endpoints a/b (ngeom, 3) and radius r (ngeom,).

    Bounding SPHERES are nearly useless as a broadphase for articulated
    hands: the locked world's 899 mesh-mesh pairs average ~338 sphere
    overlaps per state while only ~a dozen pairs are genuinely near
    (scripts/measure_active.py). Elongated phalanx hulls fit capsules
    tightly, so capsule-capsule distance is a usable conservative lower
    bound on geom distance. Mesh capsules are fitted at runtime from
    `mesh_convex_vert` (covers per-episode hull swaps via model_fields);
    everything here depends on Model + geom poses only, so XLA hoists the
    fits out of the substep scan.
    """
    c = m.const
    t = np.asarray(c.geom_type)
    s = m.geom_size
    dtype = s.dtype
    ngeom = c.ngeom
    xp, xm = d.geom_xpos, d.geom_xmat

    # local axis (unit), half-length along it, radius — per geom type
    is_zaxis = (t == GeomType.CAPSULE) | (t == GeomType.CYLINDER)
    is_long = (t == GeomType.BOX) | (t == GeomType.ELLIPSOID)
    # longest-dimension one-hot (geom_size is randomizable -> traced).
    # On ties take the FIRST argmax only: averaging tied axes yields a
    # non-unit direction whose capsule misses the far corners of a cube
    # (corner at 1.633a vs radius 1.414a) — broadphase would then report
    # clearance for touching cube pairs and silently drop real contacts.
    smax = jnp.max(s, axis=1, keepdims=True)
    winners = s >= smax
    axis_long = (
        winners & (jnp.cumsum(winners.astype(jnp.int32), axis=1) == 1)
    ).astype(dtype)
    zaxis = jnp.broadcast_to(jnp.asarray([0.0, 0, 1], dtype), (ngeom, 3))
    u_loc = jnp.where(
        jnp.asarray(is_zaxis)[:, None], zaxis,
        jnp.where(jnp.asarray(is_long)[:, None], axis_long, zaxis),
    )
    halflen = jnp.where(
        jnp.asarray(is_zaxis), s[:, 1],
        jnp.where(jnp.asarray(is_long), smax[:, 0], 0.0),
    )
    sq = jnp.sum(s * s, axis=1)
    r_perp_box = jnp.sqrt(jnp.maximum(sq - smax[:, 0] ** 2, 0.0))
    radius = jnp.where(
        jnp.asarray(is_zaxis), s[:, 0],
        jnp.where(jnp.asarray(is_long), r_perp_box, s[:, 0]),
    )
    radius = jnp.where(jnp.asarray(t == GeomType.PLANE), 0.0, radius)

    off_loc = u_loc * halflen[:, None]

    if c.nmesh:
        mv = m.mesh_convex_vert                       # (nmesh, V, 3)
        mask = m.mesh_convex_mask > 0                 # (nmesh, V)
        ctr = m.mesh_convex_center                    # (nmesh, 3)
        cv = jnp.where(mask[:, :, None], mv - ctr[:, None, :], 0.0)
        # principal axis by power iteration on the 3x3 vertex covariance;
        # convergence only affects tightness, never correctness (the
        # radius below covers all verts for WHATEVER axis is used)
        C = jnp.einsum("mvi,mvj->mij", cv, cv)
        u = jnp.full((c.nmesh, 3), 1.0 / np.sqrt(3.0), dtype)
        for _ in range(8):
            u = jnp.einsum("mij,mj->mi", C, u)
            u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-20)
        tp = jnp.einsum("mvi,mi->mv", cv, u)          # (nmesh, V)
        tmin = jnp.min(jnp.where(mask, tp, 0.0), axis=1)
        tmax = jnp.max(jnp.where(mask, tp, 0.0), axis=1)
        perp = cv - tp[:, :, None] * u[:, None, :]
        rper = jnp.sqrt(
            jnp.max(
                jnp.where(mask, jnp.sum(perp * perp, axis=-1), 0.0), axis=1
            )
        )
        a_loc_m = ctr + u * tmin[:, None]             # (nmesh, 3)
        b_loc_m = ctr + u * tmax[:, None]
        mids = jnp.clip(jnp.asarray(c.geom_dataid), 0, c.nmesh - 1)
        is_mesh = jnp.asarray(t == GeomType.MESH)
        a_loc = jnp.where(is_mesh[:, None], a_loc_m[mids], -off_loc)
        b_loc = jnp.where(is_mesh[:, None], b_loc_m[mids], off_loc)
        radius = jnp.where(is_mesh, rper[mids], radius)
    else:
        a_loc, b_loc = -off_loc, off_loc

    a_w = xp + jnp.einsum("gij,gj->gi", xm, a_loc)
    b_w = xp + jnp.einsum("gij,gj->gi", xm, b_loc)
    return a_w, b_w, radius


def _seg_seg_dist(p1, q1, p2, q2):
    """Batched min distance between segments [p1,q1] and [p2,q2]
    ((n, 3) each). Ericson's clamped closed form with degenerate guards."""
    eps = 1e-12
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    cc = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > eps, jnp.clip((b * f - cc * e) / (denom + eps), 0.0, 1.0), 0.0)
    t = jnp.where(e > eps, (b * s + f) / (e + eps), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(
        jnp.abs(t - t_cl) > 0,
        jnp.clip(jnp.where(a > eps, (b * t_cl - cc) / (a + eps), 0.0), 0.0, 1.0),
        s,
    )
    cp1 = p1 + d1 * s[:, None]
    cp2 = p2 + d2 * t_cl[:, None]
    return jnp.linalg.norm(cp1 - cp2, axis=-1)



def broadphase_scores(m: Model, d: Data, group_cap: int = DEFAULT_GROUP_CAP):
    """Diagnostic: per-group broadphase clearance scores (score > 0 =
    candidate), same math as collision(). Used by scripts/measure_active.py
    to size the per-group K caps."""
    c = m.const
    groups = build_groups(c, group_cap)
    cap_a, cap_b, cap_r = geom_capsules(m, d)
    xmat9 = d.geom_xmat.reshape(c.ngeom, 9)
    out = []
    for grp in groups:
        n = len(grp["g1"])
        P1, P2 = jnp.asarray(grp["P1"]), jnp.asarray(grp["P2"])
        _, _, _, margin_p, _ = _mix_params(m, grp["g1"], grp["g2"])
        xp1 = P1 @ d.geom_xpos
        if grp["kind"].startswith("plane"):
            nrm_full = (P1 @ xmat9).reshape(n, 3, 3)[:, :, 2]
            a2, b2 = P2 @ cap_a, P2 @ cap_b
            ha = jnp.sum((a2 - xp1) * nrm_full, axis=-1)
            hb = jnp.sum((b2 - xp1) * nrm_full, axis=-1)
            score = P2 @ cap_r + margin_p - jnp.minimum(ha, hb)
        else:
            sdist = _seg_seg_dist(
                P1 @ cap_a, P1 @ cap_b, P2 @ cap_a, P2 @ cap_b
            )
            score = P1 @ cap_r + P2 @ cap_r + margin_p - sdist
        out.append(score)
    return out


def _mesh_local_cache(m: Model):
    """LOCAL-frame per-geom hull tables: vloc (ngeom, 3, V) with padded
    verts parked AT the local hull center, mask (ngeom, V), cloc (ngeom, 3).

    Depends on Model only (pose-free), so XLA hoists it out of the substep
    scan; the world rotate+translate moved INTO the narrowphase kernels
    (convex_kernel._world_from_loc). For an unrandomized model the
    downstream vert gather becomes a GEMM against a CONSTANT bank —
    replacing the (B, ngeom, 3, V) per-substep world-vert materialization
    that was the top XLA-side cost in the round-5 trace."""
    c = m.const
    mids = jnp.clip(jnp.asarray(c.geom_dataid), 0, max(c.nmesh - 1, 0))
    verts = jnp.swapaxes(m.mesh_convex_vert[mids], 1, 2)   # (ngeom, 3, V)
    mask = m.mesh_convex_mask[mids]                        # (ngeom, V)
    cloc = m.mesh_convex_center[mids]                      # (ngeom, 3)
    # park padded vertices AT the local center: their support dot can never
    # exceed a real vertex's, so the support sweep needs no mask
    vloc = jnp.where(mask[:, None, :] > 0, verts, cloc[:, :, None])
    return vloc, mask, cloc


def _geom_table(m: Model, d: Data, mesh_cache):
    """(ngeom, 18) fused per-geom table [xpos(3) | xmat9(9) | size(3) |
    cloc(3)]: ONE one-hot GEMM fetches every scalar geom quantity a
    narrowphase side needs. Separate per-field contractions each re-read
    the (B, K, ngeom) one-hot from HBM — the concat costs one pass, the
    fused gather saves five."""
    c = m.const
    xmat9 = d.geom_xmat.reshape(c.ngeom, 9)
    cloc = (
        mesh_cache[2] if mesh_cache is not None
        else jnp.zeros((c.ngeom, 3), d.geom_xpos.dtype)
    )
    return jnp.concatenate(
        [d.geom_xpos, xmat9, m.geom_size, cloc], axis=-1
    )


def _gather_geom(geo_tab: jax.Array, oh: jax.Array, gtype: int,
                 mesh_cache=None, need_mask: bool = False):
    """Per-geom quantities for a pair side, via one-hot contraction.

    `oh` is (K, ngeom) with exactly one 1.0 per row — `oh @ table` is an
    exact row-select that runs as an MXU matmul instead of a per-env gather.
    Mesh verts come out LOCAL (`vloc`); use `_ensure_world_verts` on the
    few paths that still need per-winner world verts in XLA.
    """
    ngeom = oh.shape[-1]
    g = oh @ geo_tab                                       # (K, 18)
    data = dict(
        xpos=g[:, 0:3],
        xmat=g[:, 3:12].reshape(-1, 3, 3),
        size=g[:, 12:15],
    )
    if gtype == GeomType.MESH:
        vloc, mask, _ = mesh_cache
        V = vloc.shape[-1]
        data["vloc"] = (oh @ vloc.reshape(ngeom, 3 * V)).reshape(-1, 3, V)
        if need_mask:
            data["mask"] = oh @ mask
        data["center"] = data["xpos"] + jnp.einsum(
            "kij,kj->ki", data["xmat"], g[:, 15:18]
        )
    else:
        data["center"] = data["xpos"]
    return data


def _ensure_world_verts(t: int, data) -> None:
    """Materialize per-WINNER world verts in XLA for the generic support /
    plane paths (K rows only — cheap; the hull kernels transform in-VMEM)."""
    if t == GeomType.MESH and "world_vert" not in data:
        data["world_vert"] = data["xpos"][:, :, None] + jnp.einsum(
            "kij,kjv->kiv", data["xmat"], data["vloc"]
        )


def _support_multi(gtype: int, data, dirs: jax.Array) -> jax.Array:
    """Batched support: (K pairs, D dirs, 3) points for per-pair direction
    sets `dirs` (K, D, 3). One fused GEMM per call site instead of D
    closure invocations."""
    _ensure_world_verts(gtype, data)
    if gtype == GeomType.MESH:
        # (K, D, V) dots via broadcast-multiply-reduce over the MINOR V
        # axis, NOT dot_general: a (K*B)-batched GEMM with M=V, N=D, K=3
        # pads each micro-matmul to the 128x128 MXU (<0.5% utilization);
        # this form lowers to VPU code. The winning vertex is extracted by
        # a max-compare ONE-HOT reduction instead of argmax +
        # take_along_axis — general gathers lower poorly on TPU. Tied
        # maxima average to the extreme-face centroid (a valid support
        # point). bf16 on CENTERED verts (centering keeps rounding error
        # ~0.4% of hull extent, sub-mm).
        wv = data["world_vert"]                            # (K, 3, V)
        centered = (wv - data["center"][:, :, None]).astype(jnp.bfloat16)
        dots = jnp.sum(
            dirs.astype(jnp.bfloat16)[:, :, :, None] * centered[:, None, :, :],
            axis=2,
        )                                                  # (K, D, V)
        dmax = jnp.max(dots, axis=-1, keepdims=True)
        onehot = (dots >= dmax).astype(wv.dtype)           # (K, D, V)
        onehot = onehot / jnp.sum(onehot, axis=-1, keepdims=True)
        return jnp.sum(
            onehot[:, :, None, :] * wv[:, None, :, :], axis=-1
        )                                                  # (K, D, 3)
    if gtype == GeomType.BOX:
        # broadcast-sum forms (not einsum): batched micro-GEMMs of shape
        # (D,3)x(3,3) waste the MXU; the elementwise form stays on the VPU
        local = jnp.sum(
            data["xmat"][:, None, :, :] * dirs[:, :, :, None], axis=2
        )                                                        # (K,D,3)
        corner = jnp.sign(local) * data["size"][:, None, :]
        return data["xpos"][:, None, :] + jnp.sum(
            data["xmat"][:, None, :, :] * corner[:, :, None, :], axis=-1
        )
    if gtype == GeomType.SPHERE:
        n = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        return data["xpos"][:, None, :] + n * data["size"][:, None, :1]
    if gtype == GeomType.CAPSULE:
        n = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        axis = data["xmat"][:, :, 2]                        # (K,3)
        ax = jnp.einsum("ki,kdi->kd", axis, n)
        return (
            data["xpos"][:, None, :]
            + jnp.sign(ax)[:, :, None] * axis[:, None, :]
            * data["size"][:, None, 1:2]
            + n * data["size"][:, None, :1]
        )
    if gtype == GeomType.CYLINDER:
        n = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        axis = data["xmat"][:, :, 2]
        ax = jnp.einsum("ki,kdi->kd", axis, n)
        radial = n - ax[:, :, None] * axis[:, None, :]
        rn = jnp.linalg.norm(radial, axis=-1, keepdims=True) + 1e-12
        return (
            data["xpos"][:, None, :]
            + jnp.sign(ax)[:, :, None] * axis[:, None, :]
            * data["size"][:, None, 1:2]
            + radial / rn * data["size"][:, None, :1]
        )
    if gtype == GeomType.ELLIPSOID:
        local = jnp.sum(
            data["xmat"][:, None, :, :] * dirs[:, :, :, None], axis=2
        )
        v = data["size"][:, None, :] ** 2 * local
        v = v / (
            jnp.linalg.norm(data["size"][:, None, :] * local, axis=-1,
                            keepdims=True) + 1e-12
        )
        return data["xpos"][:, None, :] + jnp.sum(
            data["xmat"][:, None, :, :] * v[:, :, None, :], axis=-1
        )
    raise NotImplementedError(f"support for type {gtype}")


_HULL_TYPES = _HULL_TYPES_STATIC


def _hull_locs(t, data):
    """LOCAL padded vert hull (K, 3, V), row-major rot (K, 9), origin
    (K, 3) and world center (K, 3) for a box (8 corners) or mesh geom
    batch — the operand set of the `_loc` hull kernels, which do the world
    transform in VMEM."""
    xm9 = data["xmat"].reshape(-1, 9)
    if t == GeomType.BOX:
        signs = np.asarray(
            [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
             for sz in (-1.0, 1.0)], np.float32,
        )                                                   # (8, 3)
        local = jnp.asarray(signs).T[None] * data["size"][:, :, None]
        return local, xm9, data["xpos"], data["xpos"]       # vloc (K, 3, 8)
    return data["vloc"], xm9, data["xpos"], data["center"]


def _hull_extra_dirs(t1, t2, data1, data2):
    """Per-pair separating-axis candidates: box face normals (unit)."""
    for t, data in ((t1, data1), (t2, data2)):
        if t == GeomType.BOX:
            fn = jnp.concatenate(
                [data["xmat"].transpose(0, 2, 1),
                 -data["xmat"].transpose(0, 2, 1)], axis=1
            )                                               # (K, 6, 3)
            return fn, 6
    K = data1["center"].shape[0]
    return jnp.zeros((K, 1, 3), data1["center"].dtype), 0


def _collide_hull_group(t1, t2, data1, data2):
    """Single-point hull-hull collision via the fused sweep core
    (convex_kernel.py; Pallas under vmap on TPU; local verts transformed
    in-kernel). Returns dist (K,), pos (K,3), normal (K,3), plane_pt (K,3)."""
    from robogym_tpu.physics.collision import convex_kernel

    v1l, xm1, xp1, c1 = _hull_locs(t1, data1)
    v2l, xm2, xp2, c2 = _hull_locs(t2, data2)
    xd, DX = _hull_extra_dirs(t1, t2, data1, data2)
    core = convex_kernel._make_hull_core_loc(DX)
    dirs12 = jnp.asarray(convex_kernel._dirs12_np())
    ring = jnp.asarray(convex_kernel._ring_np())
    return core(v1l, xm1, xp1, v2l, xm2, xp2, c1, c2, xd, dirs12, ring)


def _collide_convex_group(t1, t2, data1, data2, n_refine=8):
    """Batched single-point convex collision over K gathered pairs.
    Returns dist (K,), pos (K,3), normal (K,3)."""
    if t1 in _HULL_TYPES and t2 in _HULL_TYPES:
        dist, pos, normal, _ = _collide_hull_group(t1, t2, data1, data2)
        return dist, pos, normal
    c1, c2 = data1["center"], data2["center"]
    dtype = c1.dtype
    K = c1.shape[0]
    d0 = c2 - c1
    d0 = d0 / (jnp.linalg.norm(d0, axis=-1, keepdims=True) + 1e-12)
    shared = jnp.broadcast_to(
        cx.DIRS12.astype(dtype)[None], (K, cx.DIRS12.shape[0], 3)
    )
    extra = [d0[:, None, :]]
    if t1 == GeomType.BOX:
        # box face normals are strong separating-axis candidates
        fn = jnp.concatenate([data1["xmat"].transpose(0, 2, 1),
                              -data1["xmat"].transpose(0, 2, 1)], axis=1)
        extra.append(fn)
    if t2 == GeomType.BOX:
        fn = jnp.concatenate([data2["xmat"].transpose(0, 2, 1),
                              -data2["xmat"].transpose(0, 2, 1)], axis=1)
        extra.append(fn)
    dirs = jnp.concatenate([shared] + extra, axis=1)   # (K, 13..25, 3)

    p1 = _support_multi(t1, data1, dirs)        # (K, 43, 3)
    p2 = _support_multi(t2, data2, -dirs)
    seps = jnp.einsum("kdi,kdi->kd", dirs, p1 - p2)
    k = jnp.argmin(seps, axis=1)                # (K,)
    n = jnp.take_along_axis(dirs, k[:, None, None], axis=1)[:, 0]
    s_best = jnp.take_along_axis(seps, k[:, None], axis=1)[:, 0]

    # staged PARALLEL cone refinement: each stage evaluates a ring of
    # candidate directions around the incumbent in ONE batched support
    # sweep (sequential subgradient steps were latency-bound). Final
    # angular resolution ~0.005 rad.
    n_ring = 8
    theta = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    ring = jnp.asarray(np.stack([np.cos(theta), np.sin(theta)], 1), dtype)
    for radius in (0.3, 0.08):
        # tangent basis per pair
        helper = jnp.where(
            jnp.abs(n[:, :1]) < 0.5,
            jnp.broadcast_to(jnp.asarray([1.0, 0, 0], dtype), n.shape),
            jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0], dtype), n.shape),
        )
        t1v = jnp.cross(n, helper)
        t1v = t1v / (jnp.linalg.norm(t1v, axis=-1, keepdims=True) + 1e-12)
        t2v = jnp.cross(n, t1v)
        cand = (
            n[:, None, :]
            + radius * (ring[None, :, :1] * t1v[:, None, :]
                        + ring[None, :, 1:] * t2v[:, None, :])
        )
        cand = cand / (jnp.linalg.norm(cand, axis=-1, keepdims=True) + 1e-12)
        cand = jnp.concatenate([n[:, None, :], cand], axis=1)   # (K, 9, 3)
        pp1 = _support_multi(t1, data1, cand)
        pp2 = _support_multi(t2, data2, -cand)
        ss = jnp.einsum("kdi,kdi->kd", cand, pp1 - pp2)
        kk = jnp.argmin(ss, axis=1)
        n = jnp.take_along_axis(cand, kk[:, None, None], axis=1)[:, 0]
        s_best = jnp.take_along_axis(ss, kk[:, None], axis=1)[:, 0]

    nd = n[:, None, :]
    p1 = _support_multi(t1, data1, nd)[:, 0]
    p2 = _support_multi(t2, data2, -nd)[:, 0]
    return -s_best, 0.5 * (p1 + p2), n


def _collide_hull_manifold_group(t1, t2, data1, data2):
    """4-point manifold for a generic hull-hull pair batch via the fused
    manifold kernel (side-1 verts scored against the contact plane —
    identical machinery to the box-hull path, with side 1's vert set being
    a mesh hull instead of 8 box corners). Padded side-1 verts are parked
    at the hull center; they can only enter the manifold when the CENTER
    penetrates the other hull (gross overlap), and then with a shallower
    dist than any real vert — inactive in all but crushed states.
    Returns dist (K,4), pos (K,4,3), normal (K,4,3)."""
    from robogym_tpu.physics.collision import convex_kernel

    v1l, xm1, xp1, c1 = _hull_locs(t1, data1)
    v2l, xm2, xp2, c2 = _hull_locs(t2, data2)
    xd, DXn = _hull_extra_dirs(t1, t2, data1, data2)
    core = convex_kernel._make_hull_manifold_core_loc(DXn)
    dist4, pos4, n = core(
        v1l, xm1, xp1, v2l, xm2, xp2, c1, c2, xd,
        jnp.asarray(convex_kernel._dirs12_np()),
        jnp.asarray(convex_kernel._ring_np()),
    )
    return dist4, pos4, jnp.tile(n[:, None, :], (1, 4, 1))


def _collide_box_convex_group(t2, data1, data2, n_refine=8):
    """Batched box-vs-hull 4-point manifold over K gathered pairs.
    Returns dist (K,4), pos (K,4,3), normal (K,4,3)."""
    if t2 in _HULL_TYPES:
        # whole manifold (sweep + corner scoring + top-4) runs in one
        # fused kernel (convex_kernel._manifold_kernel_loc; XLA reference
        # on CPU) — the corner-scoring tail used to be ~15 XLA ops here
        from robogym_tpu.physics.collision import convex_kernel

        v1l, xm1, xp1, c1 = _hull_locs(GeomType.BOX, data1)
        v2l, xm2, xp2, c2 = _hull_locs(t2, data2)
        xd, DXn = _hull_extra_dirs(GeomType.BOX, t2, data1, data2)
        core = convex_kernel._make_hull_manifold_core_loc(DXn)
        dist4, pos4, n = core(
            v1l, xm1, xp1, v2l, xm2, xp2, c1, c2, xd,
            jnp.asarray(convex_kernel._dirs12_np()),
            jnp.asarray(convex_kernel._ring_np()),
        )
        return dist4, pos4, jnp.tile(n[:, None, :], (1, 4, 1))
    else:
        dist0, pos0, n = _collide_convex_group(GeomType.BOX, t2, data1,
                                               data2, n_refine)
        plane_pt = _support_multi(t2, data2, -n[:, None, :])[:, 0]  # (K,3)
    dtype = dist0.dtype
    K = dist0.shape[0]

    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], dtype,
    )                                                             # (8,3)
    local_corners = signs[None, :, :] * data1["size"][:, None, :]
    corners = data1["xpos"][:, None, :] + jnp.sum(
        data1["xmat"][:, None, :, :] * local_corners[:, :, None, :], axis=-1
    )                                                             # (K,8,3)
    cdist = jnp.sum((corners - plane_pt[:, None, :]) * (-n)[:, None, :], -1)

    # lateral validity via hull support bounds in tangent dirs
    t1v = jnp.where(
        (jnp.abs(n[:, :1]) < 0.5),
        jnp.broadcast_to(jnp.asarray([1.0, 0, 0], dtype), n.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0], dtype), n.shape),
    )
    t1v = t1v - jnp.einsum("ki,ki->k", t1v, n)[:, None] * n
    t1v = t1v / (jnp.linalg.norm(t1v, axis=-1, keepdims=True) + 1e-12)
    t2v = jnp.cross(n, t1v)
    tol = 5e-3
    tdirs = jnp.stack([t1v, -t1v, t2v, -t2v], axis=1)            # (K,4,3)
    sup_t = _support_multi(t2, data2, tdirs)                     # (K,4,3)
    bounds = jnp.einsum("kdi,kdi->kd", tdirs, sup_t)             # (K,4)
    proj = jnp.sum(
        corners[:, :, None, :] * tdirs[:, None, :, :], axis=-1
    )                                                            # (K,8,4)
    ok = jnp.all(proj <= bounds[:, None, :] + tol, axis=-1)      # (K,8)
    cdist = jnp.where(ok, cdist, BIG)

    neg4, sel = jax.lax.top_k(-cdist, 4)                         # (K,4)
    dist4 = -neg4
    pos4 = jnp.take_along_axis(corners, sel[:, :, None], axis=1) \
        - 0.5 * dist4[:, :, None] * n[:, None, :]
    use_fb = dist4[:, 3] >= BIG / 2
    is3 = jnp.arange(4)[None, :] == 3
    dist4 = jnp.where(is3 & use_fb[:, None], dist0[:, None], dist4)
    pos4 = jnp.where(
        (is3 & use_fb[:, None])[:, :, None], pos0[:, None, :], pos4
    )
    return dist4, pos4, jnp.tile(n[:, None, :], (1, 4, 1))


def collision(m: Model, d: Data, group_cap: int = DEFAULT_GROUP_CAP) -> Data:
    """Fill d.contact. Slot layout is static given (const, group_cap)."""
    c = m.const
    if len(c.collision_pairs) == 0:
        return d
    dtype = d.qpos.dtype
    groups = build_groups(c, group_cap)
    cap_a, cap_b, cap_r = geom_capsules(m, d)
    mesh_cache = _mesh_local_cache(m) if c.nmesh else None
    geo_tab = _geom_table(m, d, mesh_cache)

    # per-group packed (K*ncon, 13) blocks
    # [pos(3) | normal(3) | dist | margin-gap | condim | g1 | g2 | b1 | b2]
    # — ONE concat over groups builds the whole contact table; the former
    # nine per-field concats each paid a full (B, ncon) HBM pass
    all_blocks, all_wtab = [], []

    geom_bodyid_np = np.asarray(c.geom_bodyid, np.int32)
    xmat9 = d.geom_xmat.reshape(c.ngeom, 9)

    for grp in groups:
        g1_np, g2_np = grp["g1"], grp["g2"]
        n = len(g1_np)
        K, ncon = grp["K"], grp["ncon"]
        P1 = jnp.asarray(grp["P1"])                # (n, ngeom) static
        P2 = jnp.asarray(grp["P2"])

        # contact params mixed per STATIC pair: pure functions of Model, so
        # XLA hoists them out of the substep scan (they were previously
        # recomputed per substep from per-slot traced geom ids — ~10 batched
        # gathers per substep)
        solref_p, solimp_p, fric5_p, margin_p, gap_p = _mix_params(
            m, g1_np, g2_np
        )

        # --- broadphase: bounding-CAPSULE clearance score (all geom
        # lookups through the static pair one-hots — MXU contractions, no
        # gathers). score > 0 <=> the conservative capsule bound cannot
        # rule the pair out.
        xp1 = P1 @ d.geom_xpos                     # (n, 3)
        if grp["kind"].startswith("plane"):
            # min capsule-endpoint height above the plane, minus radius
            nrm_full = (P1 @ xmat9).reshape(n, 3, 3)[:, :, 2]
            a2, b2 = P2 @ cap_a, P2 @ cap_b
            ha = jnp.sum((a2 - xp1) * nrm_full, axis=-1)
            hb = jnp.sum((b2 - xp1) * nrm_full, axis=-1)
            score = P2 @ cap_r + margin_p - jnp.minimum(ha, hb)
        else:
            sdist = _seg_seg_dist(
                P1 @ cap_a, P1 @ cap_b, P2 @ cap_a, P2 @ cap_b
            )
            score = P1 @ cap_r + P2 @ cap_r + margin_p - sdist

        # pair-indexed scalar table: one post-broadphase contraction fetches
        # every per-pair quantity (solver params + ids) at once
        i32f = lambda a: jnp.asarray(np.asarray(a, np.float32))
        ptab = jnp.concatenate(
            [
                solref_p,                                    # 0:2
                solimp_p,                                    # 2:7
                fric5_p,                                     # 7:12
                margin_p[:, None],                           # 12
                gap_p[:, None],                              # 13
                jnp.broadcast_to(
                    i32f(grp["condim"])[:, None], (n, 1)
                ),                                           # 14
                jnp.broadcast_to(i32f(g1_np)[:, None], (n, 1)),   # 15
                jnp.broadcast_to(i32f(g2_np)[:, None], (n, 1)),   # 16
                jnp.broadcast_to(
                    i32f(geom_bodyid_np[g1_np])[:, None], (n, 1)
                ),                                           # 17
                jnp.broadcast_to(
                    i32f(geom_bodyid_np[g2_np])[:, None], (n, 1)
                ),                                           # 18
            ],
            axis=-1,
        )

        active_pair = score > 0
        if K < n:
            # deepest-K ranking for EVERY truncated group. Plane groups
            # briefly used first-K-in-table-order here (cumsum instead of a
            # sort; they measure ~0 active pairs on the locked world), but
            # in rearrange/holdout worlds many objects can rest near the
            # floor at once and a table-order truncation silently drops
            # support contacts of whichever objects sort last — resting
            # objects would sink with no warning. bf16 scores halve the
            # sort bandwidth; ranking precision only shuffles near-ties.
            score_k, sel = jax.lax.top_k(
                score.astype(jnp.bfloat16), K
            )
            oh = _onehot(sel, n, score.dtype)  # (K, n)
            active_bp = score_k > 0
            pk = oh @ ptab
            oh1 = oh @ P1                          # (K, ngeom)
            oh2 = oh @ P2
        else:
            pk = ptab
            oh1, oh2 = P1, P2
            active_bp = active_pair
        # --- narrowphase (vmapped over the K winners)
        t1, t2 = grp["t1"], grp["t2"]
        if grp["kind"] in ("plane_prim", "prim"):
            fn = grp["fn"]
            d1 = _gather_geom(geo_tab, oh1, t1)
            d2 = _gather_geom(geo_tab, oh2, t2)
            if t1 == GeomType.BOX and t2 == GeomType.BOX:
                # whole 17-slot SAT manifold in one fused kernel
                # (boxbox_kernel; XLA primitive on CPU)
                from robogym_tpu.physics.collision import boxbox_kernel

                dist, pos, normal = boxbox_kernel.make_core()(
                    d1["xpos"], d1["xmat"], d1["size"],
                    d2["xpos"], d2["xmat"], d2["size"],
                )
            else:
                dist, pos, normal = jax.vmap(fn)(
                    d1["xpos"], d1["xmat"], d1["size"],
                    d2["xpos"], d2["xmat"], d2["size"],
                )
        elif grp["kind"] == "plane_convex":
            # batched plane-vs-hull over K pairs: 4 deepest world verts
            data1 = _gather_geom(geo_tab, oh1, t1)
            data2 = _gather_geom(geo_tab, oh2, t2, mesh_cache,
                                 need_mask=True)
            _ensure_world_verts(t2, data2)
            nrm = data1["xmat"][:, :, 2]                           # (K,3)
            wv = data2["world_vert"]                               # (K,3,V)
            rel = wv - data1["xpos"][:, :, None]
            vd = jnp.sum(rel * nrm[:, :, None], axis=1)            # (K,V)
            vd = jnp.where(data2["mask"] > 0, vd, BIG)
            # 4 deepest verts via iterative min-extract (no top_k sort, no
            # gather). A static index ramp breaks exact ties toward the
            # lower index — the same order lax.top_k produces.
            V = vd.shape[-1]
            # depth-RELATIVE tie-break ramp: an absolute 1e-7 is absorbed
            # by f32 rounding once |vd| ~ 1, letting exact ties survive; a
            # surviving tie would average two verts into one pick and burn
            # both in a single extraction round, dropping a manifold point
            scale = jnp.maximum(jnp.max(jnp.abs(vd)), 1.0) * 1e-6
            ramp = jax.lax.iota(jnp.int32, V).astype(vd.dtype) * scale
            sel_vd = vd + ramp[None, :]
            dists, picks = [], []
            for _ in range(4):
                mn = jnp.min(sel_vd, axis=-1, keepdims=True)       # (K,1)
                w = (sel_vd <= mn).astype(vd.dtype)
                w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1.0)
                dists.append(jnp.sum(vd * w, axis=-1))
                picks.append(jnp.sum(wv * w[:, None, :], axis=-1))
                sel_vd = sel_vd + w * BIG
            dist = jnp.stack(dists, axis=1)                        # (K,4)
            picked = jnp.stack(picks, axis=1)                      # (K,4,3)
            pos = picked - 0.5 * dist[:, :, None] * nrm[:, None, :]
            normal = jnp.tile(nrm[:, None, :], (1, 4, 1))
        elif grp["kind"] == "box_convex":
            data1 = _gather_geom(geo_tab, oh1, t1, mesh_cache)
            data2 = _gather_geom(geo_tab, oh2, t2, mesh_cache)
            dist, pos, normal = _collide_box_convex_group(t2, data1, data2)
        else:  # convex
            data1 = _gather_geom(geo_tab, oh1, t1, mesh_cache)
            data2 = _gather_geom(geo_tab, oh2, t2, mesh_cache)
            if ncon == 4:
                # hull-hull: full 4-point manifold (see build_groups note)
                dist, pos, normal = _collide_hull_manifold_group(
                    t1, t2, data1, data2
                )
            else:
                dist, pos, normal = _collide_convex_group(
                    t1, t2, data1, data2
                )
                dist, pos, normal = (
                    dist[:, None], pos[:, None], normal[:, None]
                )

        # shape: (K, ncon) / (K, ncon, 3)
        if dist.ndim == 1:
            dist, pos, normal = dist[:, None], pos[:, None], normal[:, None]
        dist = jnp.where(active_bp[:, None], dist, BIG)

        # winner-level columns repeated once to slot level
        wincols = jnp.concatenate(
            [(pk[:, 12] - pk[:, 13])[:, None], pk[:, 14:19]], axis=-1
        ).astype(dtype)                                    # (K, 6)
        block = jnp.concatenate(
            [
                pos.reshape(-1, 3).astype(dtype),
                normal.reshape(-1, 3).astype(dtype),
                dist.reshape(-1, 1).astype(dtype),
                jnp.repeat(wincols, ncon, axis=0),
            ],
            axis=-1,
        )                                                  # (K*ncon, 13)
        all_blocks.append(block)
        # solver params stay per-WINNER: repeating the 12 f32 columns to
        # every slot was ~40% of the contact table's HBM traffic
        all_wtab.append(pk[:, 0:12])

    tab = jnp.concatenate(all_blocks, axis=0)              # (ncon_total, 13)
    wtab = jnp.concatenate(all_wtab, axis=0)
    dist = tab[:, 6]
    includemargin = tab[:, 7]
    as_i32 = lambda col: jnp.round(col).astype(jnp.int32)

    contact = Contact(
        dist=dist,
        pos=tab[:, 0:3],
        normal=tab[:, 3:6],
        includemargin=includemargin,
        geom1=as_i32(tab[:, 9]),
        geom2=as_i32(tab[:, 10]),
        active=dist < includemargin,
        condim=as_i32(tab[:, 8]),
        body1=as_i32(tab[:, 11]),
        body2=as_i32(tab[:, 12]),
        wtab=wtab.astype(dtype),
    )
    return d.replace(contact=contact)


def contact_slot_layout(const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP):
    """Static per-slot UPPER BOUND on condim, matching the runtime Contact
    row order (slots may carry lower runtime condims after broadphase
    gathering; Contact.condim has the exact values)."""
    groups = build_groups(const, group_cap)
    condims: List[int] = []
    for grp in groups:
        condims.extend([int(grp["condim"].max())] * (grp["K"] * grp["ncon"]))
    return condims


def n_contact_slots(const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP) -> int:
    return len(contact_slot_layout(const, group_cap))


@functools.lru_cache(maxsize=32)
def slot_winner_rows(
    const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP
) -> np.ndarray:
    """Static (ncon_total,) int32: the Contact.wtab row each slot's solver
    parameters live in. Slot s of group g belongs to winner row s//ncon;
    winner rows are numbered across groups in the same order the driver
    concatenates them."""
    groups = build_groups(const, group_cap)
    rows: List[int] = []
    base = 0
    for grp in groups:
        K, ncon = grp["K"], grp["ncon"]
        rows.extend(np.repeat(base + np.arange(K), ncon).tolist())
        base += K
    return np.asarray(rows, np.int32)


@functools.lru_cache(maxsize=32)
def n_winner_rows(const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP) -> int:
    return sum(g["K"] for g in build_groups(const, group_cap))


@functools.lru_cache(maxsize=32)
def slot_winner_onehot(
    const: ModelConst, group_cap: int = DEFAULT_GROUP_CAP
) -> np.ndarray:
    """Static (ncon_total, W) f32 one-hot of slot_winner_rows — composing a
    dynamic slot selection one-hot with this matrix turns a winner-param
    lookup into two small MXU matmuls (no per-env gather)."""
    rows = slot_winner_rows(const, group_cap)
    W = n_winner_rows(const, group_cap)
    out = np.zeros((len(rows), W), np.float32)
    out[np.arange(len(rows)), rows] = 1.0
    return out


def contact_full_params(const: ModelConst, group_cap: int, con):
    """Per-slot (solref (ncon,2), solimp (ncon,5), friction5 (ncon,5))
    expanded from the per-winner wtab. Diagnostic/reference-path helper —
    the hot path composes one-hots instead of materializing these."""
    sw = jnp.asarray(slot_winner_onehot(const, group_cap), con.wtab.dtype)
    full = sw @ con.wtab
    return full[:, 0:2], full[:, 2:7], full[:, 7:12]


def contact_frame(con):
    """(ncon, 3, 3) full contact frames [normal, tan1, tan2] from the
    stored normals (tangents are the deterministic _orthogonal basis)."""
    n = con.normal
    t1v = _orthogonal(n)
    t2v = jnp.cross(n, t1v)
    return jnp.stack([n, t1v, t2v], axis=-2)


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
