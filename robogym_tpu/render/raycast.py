"""Analytic raycast renderer over Model/Data geoms (TPU-native).

One jitted function produces an (H, W, 3) image from any compiled-in
<camera>: primary rays through the pixel grid, closed-form intersections per
geom type (plane / sphere / capsule / cylinder / ellipsoid / box) and
half-space clipping against convex-hull face planes for meshes
(mjcf/mesh.py:hull_face_planes), then a Lambertian headlight + skylight
shade of the nearest hit. Depth resolution uses max-compare one-hot
reductions, not argmin+gather (TPU gathers are slow; see PROFILE.md).

Geoms are processed in static type groups (the collision driver's pattern,
collision/driver.py): `ModelConst.geom_type` is compile-time numpy, so each
group lowers to one batched (G_t, P) intersection with P = H*W pixels minor
(lane-dense on TPU).

Reference behavior matched: MuJoCo camera convention (camera looks along
local -Z, +X right, +Y up, `fovy` vertical degrees), uint8 RGB output like
sim.render(width, height, camera_name) in
robogym/envs/rearrange/observation/common.py:30-43. Transparent geoms
(rgba[3] < 0.1) are invisible — the reference hides goal targets the same
way (sim hide_target sets alpha 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.mjcf.model import Data, GeomType, Model
from robogym_tpu.utils import rotation

BIG = 1e9


def camera_id(m: Model, name: str) -> int:
    return m.const.names["camera"][name]


def camera_pose(m: Model, d: Data, cam: int):
    """World (pos (3,), mat (3,3)) of camera `cam` this step."""
    bid = int(m.const.cam_bodyid[cam])
    R_local = rotation.quat2mat(m.cam_quat[cam])
    pos = d.xpos[bid] + d.xmat[bid] @ m.cam_pos[cam]
    mat = d.xmat[bid] @ R_local
    return pos, mat


def _pixel_rays(fovy_deg, H: int, W: int, dtype):
    """Unit ray directions in CAMERA frame, (P, 3), row 0 = image top."""
    tan = jnp.tan(jnp.deg2rad(fovy_deg) * 0.5)
    aspect = W / H
    # pixel centers
    ys = (1.0 - (jnp.arange(H, dtype=dtype) + 0.5) * (2.0 / H)) * tan
    xs = ((jnp.arange(W, dtype=dtype) + 0.5) * (2.0 / W) - 1.0) * tan * aspect
    xg, yg = jnp.meshgrid(xs, ys)                     # (H, W)
    dirs = jnp.stack(
        [xg.ravel(), yg.ravel(), -jnp.ones(H * W, dtype)], axis=-1
    )
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# per-type intersections: local-frame origin o (G, 3), dir v (G, P, 3)
# return t (G, P) [BIG on miss] and local normal (G, P, 3)
# ---------------------------------------------------------------------------


def _isect_plane(size, o, v):
    oz = o[:, None, 2]
    vz = v[..., 2]
    t = -oz / jnp.where(jnp.abs(vz) < 1e-9, 1e-9, vz)
    hit = (t > 0) & (oz > 0)
    # finite plane if size[0/1] > 0 (MuJoCo: 0 means infinite)
    px = o[:, None, 0] + t * v[..., 0]
    py = o[:, None, 1] + t * v[..., 1]
    sx = size[:, 0:1]
    sy = size[:, 1:2]
    hit &= (sx <= 0) | (jnp.abs(px) <= sx)
    hit &= (sy <= 0) | (jnp.abs(py) <= sy)
    t = jnp.where(hit, t, BIG)
    n = jnp.zeros_like(v).at[..., 2].set(1.0)
    return t, n


def _quadratic_entry(a, b, c):
    """Smaller root of a t^2 + 2b t + c = 0; BIG when no real positive root."""
    disc = b * b - a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    return jnp.where(ok & (t > 0), t, BIG)


def _isect_sphere_at(center_z, r, o, v):
    oo = o[:, None, :] - jnp.zeros_like(v).at[..., 2].set(center_z)
    b = jnp.sum(oo * v, axis=-1)
    c = jnp.sum(oo * oo, axis=-1) - r[:, None] ** 2
    t = _quadratic_entry(jnp.ones_like(b), b, c)
    p = oo + t[..., None] * v
    return t, p / (r[:, None, None] + 1e-12)


def _isect_sphere(size, o, v):
    return _isect_sphere_at(0.0, size[:, 0], o, v)


def _isect_ellipsoid(size, o, v):
    s = size[:, None, :]                               # (G, 1, 3)
    os_ = o[:, None, :] / s
    vs = v / s
    a = jnp.sum(vs * vs, axis=-1)
    b = jnp.sum(os_ * vs, axis=-1)
    c = jnp.sum(os_ * os_, axis=-1) - 1.0
    t = _quadratic_entry(a, b, c)
    p = o[:, None, :] + t[..., None] * v
    n = p / (s * s)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    return t, n


def _side_hit(r, h, o, v):
    """Infinite-cylinder side limited to |z| <= h."""
    a = v[..., 0] ** 2 + v[..., 1] ** 2
    b = o[:, None, 0] * v[..., 0] + o[:, None, 1] * v[..., 1]
    c = (o[:, None, 0] ** 2 + o[:, None, 1] ** 2) - r[:, None] ** 2
    t = _quadratic_entry(a, b, c)
    z = o[:, None, 2] + t * v[..., 2]
    t = jnp.where(jnp.abs(z) <= h[:, None], t, BIG)
    p = o[:, None, :] + t[..., None] * v
    n = jnp.stack(
        [p[..., 0], p[..., 1], jnp.zeros_like(p[..., 0])], axis=-1
    ) / (r[:, None, None] + 1e-12)
    return t, n


def _isect_capsule(size, o, v):
    r, h = size[:, 0], size[:, 1]
    t0, n0 = _side_hit(r, h, o, v)

    # caps: spheres centered (0, 0, +-h), valid on the far side of the seam
    def cap(sign):
        ox = o[:, None, 0]
        oy = o[:, None, 1]
        oz = o[:, None, 2] - sign * h[:, None]
        b = ox * v[..., 0] + oy * v[..., 1] + oz * v[..., 2]
        cc = ox * ox + oy * oy + oz * oz - r[:, None] ** 2
        t = _quadratic_entry(jnp.ones_like(b), b, cc)
        z = o[:, None, 2] + t * v[..., 2]
        t = jnp.where(sign * z >= h[:, None], t, BIG)
        p = jnp.stack(
            [ox + t * v[..., 0], oy + t * v[..., 1], oz + t * v[..., 2]],
            axis=-1,
        )
        return t, p / (r[:, None, None] + 1e-12)

    tc1, nc1 = cap(1.0)
    tc2, nc2 = cap(-1.0)
    t = jnp.minimum(t0, jnp.minimum(tc1, tc2))
    n = jnp.where((t == t0)[..., None], n0,
                  jnp.where((t == tc1)[..., None], nc1, nc2))
    return t, n


def _isect_cylinder(size, o, v):
    r, h = size[:, 0], size[:, 1]
    t0, n0 = _side_hit(r, h, o, v)

    def disk(sign):
        vz = v[..., 2]
        t = (sign * h[:, None] - o[:, None, 2]) / jnp.where(
            jnp.abs(vz) < 1e-9, 1e-9, vz
        )
        px = o[:, None, 0] + t * v[..., 0]
        py = o[:, None, 1] + t * v[..., 1]
        ok = (t > 0) & (px**2 + py**2 <= r[:, None] ** 2)
        t = jnp.where(ok, t, BIG)
        n = jnp.zeros_like(v).at[..., 2].set(sign)
        return t, n

    t1, n1 = disk(1.0)
    t2, n2 = disk(-1.0)
    t = jnp.minimum(t0, jnp.minimum(t1, t2))
    n = jnp.where((t == t0)[..., None], n0,
                  jnp.where((t == t1)[..., None], n1, n2))
    return t, n


def _isect_box(size, o, v):
    """Slab method; normal from the entry axis (one-hot on max entry t)."""
    inv = 1.0 / jnp.where(jnp.abs(v) < 1e-9, 1e-9, v)
    t1 = (-size[:, None, :] - o[:, None, :]) * inv     # (G, P, 3)
    t2 = (size[:, None, :] - o[:, None, :]) * inv
    tlo = jnp.minimum(t1, t2)
    thi = jnp.maximum(t1, t2)
    tin = jnp.max(tlo, axis=-1)
    tout = jnp.min(thi, axis=-1)
    hit = (tin <= tout) & (tin > 0)
    t = jnp.where(hit, tin, BIG)
    axis_oh = (tlo >= tin[..., None]).astype(o.dtype)
    axis_oh = axis_oh / jnp.sum(axis_oh, axis=-1, keepdims=True)
    n = -jnp.sign(v) * axis_oh
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    return t, n


def _isect_hull(planes, mask, o, v):
    """Convex polytope from face half-planes [n|off], n·x + off <= 0 inside.
    planes (G, F, 4), mask (G, F)."""
    n = planes[..., :3]                                # (G, F, 3)
    off = planes[..., 3]                               # (G, F)
    nd = jnp.einsum("gfi,gpi->gfp", n, v)              # (G, F, P)
    no = jnp.einsum("gfi,gi->gf", n, o)[..., None] + off[..., None]
    t_pl = -no / jnp.where(jnp.abs(nd) < 1e-9, 1e-9, nd)
    m = mask[..., None] > 0
    tin = jnp.max(jnp.where(m & (nd < 0), t_pl, -BIG), axis=1)   # (G, P)
    tout = jnp.min(jnp.where(m & (nd > 0), t_pl, BIG), axis=1)
    # a parallel plane (nd ~ 0) with positive side value excludes the ray
    par_out = jnp.any(m & (jnp.abs(nd) < 1e-9) & (no > 0), axis=1)
    hit = (tin <= tout) & (tin > 0) & ~par_out
    t = jnp.where(hit, tin, BIG)
    enter_oh = ((jnp.where(m & (nd < 0), t_pl, -BIG) >= tin[:, None, :])
                & m & (nd < 0)).astype(o.dtype)        # (G, F, P)
    enter_oh = enter_oh / (jnp.sum(enter_oh, axis=1, keepdims=True) + 1e-12)
    nrm = jnp.einsum("gfp,gfi->gpi", enter_oh, n)
    nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)
    return t, nrm


_ISECT = {
    GeomType.PLANE: _isect_plane,
    GeomType.SPHERE: _isect_sphere,
    GeomType.CAPSULE: _isect_capsule,
    GeomType.CYLINDER: _isect_cylinder,
    GeomType.ELLIPSOID: _isect_ellipsoid,
    GeomType.BOX: _isect_box,
}


def render_rgb(m: Model, d: Data, cam: int, height: int, width: int,
               geom_visible=None):
    """(H, W, 3) float32 image in [0, 1] from fixed camera id `cam`.

    `geom_visible`: optional (ngeom,) bool/float mask — 0 hides a geom
    (goal-image providers hide the robot this way, mirroring the
    reference's hide_robot, robogym observation/goal.py:66-82). Geoms with
    rgba alpha < 0.1 are always invisible.
    """
    cpos, cmat = camera_pose(m, d, cam)
    return render_rgb_pose(m, d, cpos, cmat, m.cam_fovy[cam], height, width,
                           geom_visible)


def lookat_pose(eye, target, up=(0.0, 0.0, 1.0)):
    """Camera (pos, mat) looking from `eye` at `target` (MuJoCo convention:
    -Z forward, +Y up) — for free cameras with no <camera> element
    (viewer/replay.py)."""
    eye = jnp.asarray(eye, jnp.float32)
    fwd = jnp.asarray(target, jnp.float32) - eye
    fwd = fwd / (jnp.linalg.norm(fwd) + 1e-12)
    z = -fwd
    x = jnp.cross(jnp.asarray(up, jnp.float32), z)
    x = x / (jnp.linalg.norm(x) + 1e-12)
    y = jnp.cross(z, x)
    return eye, jnp.stack([x, y, z], axis=1)


def render_rgb_pose(m: Model, d: Data, cpos, cmat, fovy,
                    height: int, width: int, geom_visible=None):
    """render_rgb with an explicit world camera pose (pos (3,), mat (3,3),
    columns = camera axes)."""
    c = m.const
    dtype = d.qpos.dtype
    P = height * width
    rays = _pixel_rays(jnp.asarray(fovy, dtype), height, width,
                       dtype) @ cmat.T

    vis = (m.geom_rgba[:, 3] > 0.1).astype(dtype)
    if geom_visible is not None:
        vis = vis * jnp.asarray(geom_visible, dtype)

    gtypes = np.asarray(c.geom_type)
    t_best = jnp.full((P,), BIG, dtype)
    rgb_best = jnp.zeros((P, 3), dtype)
    n_best = jnp.zeros((P, 3), dtype)

    for gt in sorted(set(int(t) for t in gtypes)):
        ids = np.nonzero(gtypes == gt)[0]              # static
        G = len(ids)
        gpos = d.geom_xpos[ids]                        # (G, 3)
        gmat = d.geom_xmat[ids]                        # (G, 3, 3)
        o_l = jnp.einsum("gji,gj->gi", gmat, cpos - gpos)
        v_l = jnp.einsum("gji,pj->gpi", gmat, rays)    # (G, P, 3)
        if gt == GeomType.MESH:
            did = np.asarray(c.geom_dataid)[ids]
            t, n_l = _isect_hull(
                m.mesh_face_plane[did], m.mesh_face_mask[did], o_l, v_l
            )
        else:
            t, n_l = _ISECT[gt](m.geom_size[ids], o_l, v_l)
        t = jnp.where(vis[ids][:, None] > 0, t, BIG)
        # nearest inside this group
        tg = jnp.min(t, axis=0)                        # (P,)
        oh = (t <= tg[None, :]).astype(dtype) * (t < BIG)
        oh = oh / (jnp.sum(oh, axis=0, keepdims=True) + 1e-12)
        n_w = jnp.einsum("gp,gij,gpj->pi", oh, gmat, n_l)
        rgb_g = jnp.einsum("gp,gi->pi", oh, m.geom_rgba[ids, :3].astype(dtype))
        take = tg < t_best
        t_best = jnp.where(take, tg, t_best)
        rgb_best = jnp.where(take[:, None], rgb_g, rgb_best)
        n_best = jnp.where(take[:, None], n_w, n_best)

    # shading: camera headlight + the model's <light> elements (Lambertian;
    # light pose/intensity are traced Model fields so the vision-DR path can
    # randomize them per episode — reference rearrange/common/base.py:680-730
    # + simulation/base.py:774-788 set_lighting)
    n_best = n_best / (jnp.linalg.norm(n_best, axis=-1, keepdims=True) + 1e-12)
    head = jnp.maximum(-jnp.sum(n_best * rays, axis=-1), 0.0)
    if c.nlight:
        hit = cpos[None, :] + jnp.minimum(t_best, BIG)[:, None] * rays
        diffuse = jnp.zeros_like(head)
        ambient = jnp.zeros((), dtype)
        for i in range(c.nlight):
            b = int(c.light_bodyid[i])
            lpos = d.xpos[b] + d.xmat[b] @ m.light_pos[i]
            ldir = d.xmat[b] @ m.light_dir[i]
            ldir = ldir / (jnp.linalg.norm(ldir) + 1e-12)
            if bool(c.light_directional[i]):
                lam = jnp.maximum(-jnp.sum(n_best * ldir[None, :], -1), 0.0)
            else:
                to_l = lpos[None, :] - hit
                to_l = to_l / (
                    jnp.linalg.norm(to_l, axis=-1, keepdims=True) + 1e-12
                )
                lam = jnp.maximum(jnp.sum(n_best * to_l, -1), 0.0)
            diffuse = diffuse + m.light_active[i] * m.light_diffuse[i] * lam
            ambient = ambient + m.light_active[i] * m.light_ambient[i]
        shade = jnp.clip(
            m.headlight_ambient + ambient + m.headlight_diffuse * head
            + diffuse, 0.0, 1.0,
        )
    else:
        # no lights compiled in: fixed headlight + sky + ambient
        sky = jnp.maximum(n_best[:, 2], 0.0)
        shade = jnp.clip(0.35 + 0.45 * head + 0.25 * sky, 0.0, 1.0)
    img = rgb_best * shade[:, None]

    # background: vertical gradient keyed on world ray z
    bgt = 0.5 * (rays[:, 2] + 1.0)
    bg = (jnp.asarray([0.16, 0.21, 0.3], dtype)[None, :] * (1 - bgt[:, None])
          + jnp.asarray([0.45, 0.55, 0.66], dtype)[None, :] * bgt[:, None])
    img = jnp.where((t_best < BIG)[:, None], img, bg)
    return img.reshape(height, width, 3)


def render_uint8(m: Model, d: Data, cam: int, height: int, width: int,
                 geom_visible=None):
    """uint8 RGB image matching sim.render()'s dtype contract."""
    img = render_rgb(m, d, cam, height, width, geom_visible)
    return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def render_camera(m: Model, d: Data, name: str, size: int,
                  geom_visible=None):
    """Render named camera at square `size` (reference image_size semantics,
    robogym/envs/rearrange/common/base.py:91)."""
    return render_uint8(m, d, camera_id(m, name), size, size, geom_visible)
