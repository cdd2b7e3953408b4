"""Convex-convex narrowphase via support functions (GJK + EPA-lite).

Replaces MuJoCo 2.0's libccd MPR path (used for every mesh pair, producing a
single contact point per pair — same count here).

TPU-first design: fixed-iteration GJK distance computation on a simplex,
followed by a fixed-direction-set penetration (EPA-lite) when overlapping.
No data-dependent control flow — every env/pair runs the same instruction
stream; `lax.fori_loop`/`jnp.where` only. Support over a padded hull vertex
buffer is a masked argmax: one (V,3)x(3,) dot per call, which XLA fuses into
big batched GEMVs across pairs x envs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

BIG = 1e10

# Precomputed 42-direction set (icosphere-ish) for penetration search.
import numpy as _np

_phi = (1 + 5**0.5) / 2
_ico = _np.array(
    [
        [-1, _phi, 0], [1, _phi, 0], [-1, -_phi, 0], [1, -_phi, 0],
        [0, -1, _phi], [0, 1, _phi], [0, -1, -_phi], [0, 1, -_phi],
        [_phi, 0, -1], [_phi, 0, 1], [-_phi, 0, -1], [-_phi, 0, 1],
    ]
)
_mid = []
for _i in range(len(_ico)):
    for _j in range(_i + 1, len(_ico)):
        # adjacent icosahedron vertices have dot = phi > 0; others <= 0
        if _np.dot(_ico[_i], _ico[_j]) > 0.5:
            _mid.append((_ico[_i] + _ico[_j]) / 2)
_DIRS = _np.concatenate([_ico, _np.asarray(_mid).reshape(-1, 3)], axis=0)
_DIRS = _DIRS / _np.linalg.norm(_DIRS, axis=1, keepdims=True)
# kept as NUMPY: an eager jnp op at import would initialize the (remote)
# TPU backend before the caller can pick a platform — ~100s stall and a
# hard failure when the tunnel is down. Converted to device arrays inside
# the traced functions that consume them.
DIRS42 = _DIRS.astype(_np.float32)  # (42, 3)
DIRS12 = (_ico / _np.linalg.norm(_ico, axis=1, keepdims=True)).astype(
    _np.float32
)  # (12, 3)


def support_hull(verts: jax.Array, mask: jax.Array, direction: jax.Array) -> jax.Array:
    """Masked support point of a padded vertex set (world frame)."""
    dots = verts @ direction
    dots = jnp.where(mask > 0, dots, -BIG)
    return verts[jnp.argmax(dots)]


def make_hull_support(xpos, xmat, verts_local, mask):
    world = xpos + verts_local @ xmat.T

    def sup(direction):
        return support_hull(world, mask, direction)

    return sup


def make_box_support(xpos, xmat, size):
    def sup(direction):
        local = xmat.T @ direction
        return xpos + xmat @ (jnp.sign(local) * size)

    return sup


def make_sphere_support(xpos, r):
    def sup(direction):
        return xpos + direction * r / (jnp.linalg.norm(direction) + 1e-12)

    return sup


def make_capsule_support(xpos, xmat, size):
    r, hh = size[0], size[1]
    axis = xmat[:, 2]

    def sup(direction):
        nd = direction / (jnp.linalg.norm(direction) + 1e-12)
        return xpos + jnp.sign(jnp.dot(axis, nd)) * axis * hh + nd * r

    return sup


def make_cylinder_support(xpos, xmat, size):
    r, hh = size[0], size[1]
    axis = xmat[:, 2]

    def sup(direction):
        nd = direction / (jnp.linalg.norm(direction) + 1e-12)
        ax_comp = jnp.dot(axis, nd)
        radial = nd - ax_comp * axis
        rn = jnp.linalg.norm(radial) + 1e-12
        return xpos + jnp.sign(ax_comp) * axis * hh + radial / rn * r

    return sup


def make_ellipsoid_support(xpos, xmat, size):
    def sup(direction):
        local = xmat.T @ direction
        v = size * size * local
        v = v / (jnp.linalg.norm(size * local) + 1e-12)
        return xpos + xmat @ v

    return sup


def collide_convex(
    sup1: Callable, sup2: Callable, center1: jax.Array, center2: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-point convex collision.

    Strategy (fixed cost, branch-free):
      For each of the 42 fixed directions d (plus the center-line direction):
        separation(d) = max_{p1 in A} d.p1 - min_{p2 in B} d.p2
                      = sup_A(d).d - sup_B(-d).(-d)... computed directly.
      The minimum over directions of s(d) upper-bounds signed distance; for
      penetrating pairs it approximates penetration depth and normal (EPA
      over a fixed direction set). For separated pairs we refine the normal
      with a few GJK-style iterations along the witness direction.

    Returns (dist, pos, normal) with normal pointing from geom1 into geom2.
    """
    dtype = center1.dtype
    d0 = center2 - center1
    d0 = d0 / (jnp.linalg.norm(d0) + 1e-12)
    dirs = jnp.concatenate([DIRS42.astype(dtype), d0[None]], axis=0)  # (43,3)

    def sep(d):
        # signed gap along +d (d points from 1 to 2):
        # max extent of A along d minus min extent of B along d
        p1 = sup1(d)
        p2 = sup2(-d)
        return jnp.dot(d, p1 - p2), p1, p2

    seps, p1s, p2s = jax.vmap(sep)(dirs)
    # separation plane: the direction minimizing overlap
    k = jnp.argmin(seps)
    overlap = seps[k]          # >0 => penetration depth along dirs[k]
    n = dirs[k]
    p1 = p1s[k]
    p2 = p2s[k]
    dist = -overlap            # negative when penetrating
    pos = 0.5 * (p1 + p2)
    return dist, pos, n


def collide_convex_refined(sup1, sup2, center1, center2, n_refine: int = 4):
    """collide_convex with local normal refinement: after the coarse direction
    sweep, do a few iterations perturbing the normal toward the witness-point
    difference (helps separated pairs report accurate distance)."""
    dist, pos, n = collide_convex(sup1, sup2, center1, center2)

    def body(i, carry):
        dist, pos, n = carry
        p1 = sup1(n)
        p2 = sup2(-n)
        w = p1 - p2
        # for separated case the true distance direction is along p2->p1 gap
        wn = jnp.linalg.norm(w) + 1e-12
        n_new = jnp.where(jnp.dot(w, n) < 0, -w / wn, n)
        gap = jnp.dot(n_new, sup1(n_new) - sup2(-n_new))
        better = gap < -dist
        dist2 = jnp.where(better, -gap, dist)
        n2 = jnp.where(better, n_new, n)
        p1b, p2b = sup1(n2), sup2(-n2)
        pos2 = jnp.where(better, 0.5 * (p1b + p2b), pos)
        return dist2, pos2, n2

    dist, pos, n = jax.lax.fori_loop(0, n_refine, body, (dist, pos, n))
    return dist[None], pos[None], n[None]
