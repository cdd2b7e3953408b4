"""Batch-minor Pallas kernel for the box-box contact manifold.

Mirrors `primitives.box_box` (SAT over 15 axes -> corner-in-box candidate
set + SAT witness, 17 slots) exactly, but runs the whole group (K pairs x
LANE envs) inside one VMEM program. The XLA lowering of the vmapped
primitive was ~0.5 ms/substep on dactyl/locked (B=1024): dozens of small
batched ops with HBM round trips between them; here it is one fused pass.

Dispatch follows the shared pallas_dispatch pattern (a real JAX primitive
with a batching rule — see physics/pallas_dispatch.py): the unbatched call
(and CPU runs) use the XLA primitive via jax.vmap; an env-batched call on
TPU runs the Pallas kernel with the batch on the minor (lane) axis.

Tie-break parity: the XLA path breaks exact SAT-depth ties with a
+i*1e-7 index ramp (lowest index wins); the kernel's running strict `<`
min in the same axis order picks the lowest index too. Known divergence:
if |depth| is large enough that f32 rounding absorbs the ramp, a
surviving exact tie makes primitives.box_box AVERAGE the tied axes while
the kernel keeps the first — different normals on that measure-zero set,
physically negligible (both are valid SAT witnesses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robogym_tpu.physics.collision import primitives as prim

LANE = 128
BIG_KERNEL = 1e10
INTERPRET = False

_CORNER_SIGNS = [
    (sx, sy, sz)
    for sx in (-1.0, 1.0)
    for sy in (-1.0, 1.0)
    for sz in (-1.0, 1.0)
]


def _boxbox_kernel(xp1_ref, xm1_ref, s1_ref, xp2_ref, xm2_ref, s2_ref,
                   dist_o, pos_o, n_o):
    """All operands batch-minor: xp (K, 3, L), xm (K, 9, L) row-major,
    s (K, 3, L). Outputs dist (K, 17, L), pos (K, 17, 3, L), n (K, 3, L)."""
    xp1, xm1, s1 = xp1_ref[:], xm1_ref[:], s1_ref[:]
    xp2, xm2, s2 = xp2_ref[:], xm2_ref[:], s2_ref[:]

    def col(xm, i):
        # column i of the (3, 3) row-major matrix = world axis i
        return (xm[:, 0 + i, :], xm[:, 3 + i, :], xm[:, 6 + i, :])

    a1 = [col(xm1, i) for i in range(3)]
    a2 = [col(xm2, i) for i in range(3)]
    t = [xp2[:, i, :] - xp1[:, i, :] for i in range(3)]
    s1c = [s1[:, i, :] for i in range(3)]
    s2c = [s2[:, i, :] for i in range(3)]

    def dot(u, v):
        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

    def cross(u, v):
        return (
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        )

    # --- SAT over 15 axes; running strict-min keeps the lowest index on
    # exact ties (parity with the XLA index-ramp tie-break)
    best = None

    def depth_of(ax):
        p1 = sum(jnp.abs(dot(ax, a1[i])) * s1c[i] for i in range(3))
        p2 = sum(jnp.abs(dot(ax, a2[i])) * s2c[i] for i in range(3))
        return p1 + p2 - jnp.abs(dot(ax, t))

    def upd(best, d, ax):
        if best is None:
            return (d, ax[0], ax[1], ax[2])
        bd, b0, b1, b2 = best
        take = d < bd
        pick = lambda new, old: jnp.where(take, new, old)
        return (pick(d, bd), pick(ax[0], b0), pick(ax[1], b1),
                pick(ax[2], b2))

    for ax in a1:
        best = upd(best, depth_of(ax), ax)
    for ax in a2:
        best = upd(best, depth_of(ax), ax)
    for i in range(3):
        for j in range(3):
            cx = cross(a1[i], a2[j])
            nrm2 = dot(cx, cx)
            inv = jax.lax.rsqrt(nrm2 + 1e-18)
            ax = (cx[0] * inv, cx[1] * inv, cx[2] * inv)
            d = depth_of(ax)
            d = jnp.where(nrm2 > 1e-12, d, BIG_KERNEL)
            best = upd(best, d, ax)

    sat_depth, n0, n1, n2 = best
    # unit-normalize (averaged-tie parity safeguard) and orient 1 -> 2
    inv = jax.lax.rsqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-24)
    n0, n1, n2 = n0 * inv, n1 * inv, n2 * inv
    flip = jnp.where(dot((n0, n1, n2), t) < 0, -1.0, 1.0)
    n0, n1, n2 = n0 * flip, n1 * flip, n2 * flip
    n = (n0, n1, n2)

    # --- corner candidates: corners of box b measured against box a
    def corner_candidates(xp_a, a_ax, s_a, xp_b, b_ax, s_b, sign):
        dists, poss = [], []
        for sgn in _CORNER_SIGNS:
            corner = [
                xp_b[:, i, :]
                + sum(sgn[k] * s_b[k] * b_ax[k][i] for k in range(3))
                for i in range(3)
            ]
            rel = [corner[i] - xp_a[:, i, :] for i in range(3)]
            over = [jnp.abs(dot(rel, a_ax[k])) - s_a[k] for k in range(3)]
            dist = jnp.maximum(jnp.maximum(over[0], over[1]), over[2])
            inside = (
                (over[0] < 1e-3) & (over[1] < 1e-3) & (over[2] < 1e-3)
            )
            dist = jnp.where(inside, dist, BIG_KERNEL)
            pos = [corner[i] - 0.5 * dist * sign * n[i] for i in range(3)]
            dists.append(dist)
            poss.append(pos)
        return dists, poss

    d2s, p2s = corner_candidates(xp1, a1, s1c, xp2, a2, s2c, +1.0)
    d1s, p1s = corner_candidates(xp2, a2, s2c, xp1, a1, s1c, -1.0)

    # --- SAT witness (edge-edge): support midpoint (deadbanded sign —
    # parity with primitives.box_box on perpendicular axes)
    dsign = lambda x: jnp.where(jnp.abs(x) > 1e-6, jnp.sign(x), 0.0)
    sup1 = [
        xp1[:, i, :]
        + sum(dsign(dot(a1[k], n)) * s1c[k] * a1[k][i] for k in range(3))
        for i in range(3)
    ]
    nneg = (-n0, -n1, -n2)
    sup2 = [
        xp2[:, i, :]
        + sum(dsign(dot(a2[k], nneg)) * s2c[k] * a2[k][i]
              for k in range(3))
        for i in range(3)
    ]
    d_sat = -sat_depth
    p_sat = [0.5 * (sup1[i] + sup2[i]) for i in range(3)]

    all_d = d2s + d1s + [d_sat]
    all_p = p2s + p1s + [p_sat]
    dist_o[:] = jnp.stack(all_d, axis=1)                     # (K, 17, L)
    pos_o[:] = jnp.stack(
        [jnp.stack(p, axis=1) for p in all_p], axis=1
    )                                                        # (K, 17, 3, L)
    n_o[:] = jnp.stack([n0, n1, n2], axis=1)                 # (K, 3, L)


@functools.lru_cache(maxsize=32)
def _build_call(K: int):
    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(dims + (LANE,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    def call(xp1, xm1, s1, xp2, xm2, s2):
        B = xp1.shape[-1]
        assert B % LANE == 0, B
        return pl.pallas_call(
            _boxbox_kernel,
            grid=(B // LANE,),
            in_specs=[
                spec(K, 3), spec(K, 9), spec(K, 3),
                spec(K, 3), spec(K, 9), spec(K, 3),
            ],
            out_specs=[spec(K, 17), spec(K, 17, 3), spec(K, 3)],
            out_shape=[
                jax.ShapeDtypeStruct((K, 17, B), jnp.float32),
                jax.ShapeDtypeStruct((K, 17, 3, B), jnp.float32),
                jax.ShapeDtypeStruct((K, 3, B), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=INTERPRET,
        )(xp1, xm1, s1, xp2, xm2, s2)

    return call


@functools.lru_cache(maxsize=1)
def make_core():
    """Batch-dispatched box-box manifold over K pairs (pallas_dispatch).
    Per-env args: xp1/xp2 (K,3), xm1/xm2 (K,3,3), s1/s2 (K,3).
    Returns (dist (K,17), pos (K,17,3), normal (K,17,3))."""
    from robogym_tpu.physics.pallas_dispatch import make_batched_dispatch

    def ref(xp1, xm1, s1, xp2, xm2, s2):
        return jax.vmap(prim.box_box)(xp1, xm1, s1, xp2, xm2, s2)

    def batched(xp1, xm1, s1, xp2, xm2, s2):
        import os

        use_pallas = (
            (
                jax.default_backend() not in ("cpu", "gpu")
                or os.environ.get("ROBOGYM_TPU_FORCE_PALLAS")
            )
            and not os.environ.get("ROBOGYM_TPU_NO_PALLAS")
        )
        if not use_pallas or xp1.ndim != 3:
            return jax.vmap(ref)(xp1, xm1, s1, xp2, xm2, s2)

        B, K = xp1.shape[:2]
        pad = (-B) % LANE
        t = lambda x: jnp.moveaxis(x.astype(jnp.float32), 0, -1)

        def padlane(x):
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
                )
            return x

        prep = lambda x: padlane(t(x))
        call = _build_call(K)
        dist, pos, n = call(
            prep(xp1), prep(xm1.reshape(B, K, 9)), prep(s1),
            prep(xp2), prep(xm2.reshape(B, K, 9)), prep(s2),
        )
        back = lambda x: jnp.moveaxis(x[..., :B], -1, 0)
        dist_b = back(dist)                              # (B, K, 17)
        pos_b = back(pos)                                # (B, K, 17, 3)
        n_b = back(n)                                    # (B, K, 3)
        n_full = jnp.broadcast_to(n_b[:, :, None, :], pos_b.shape)
        return dist_b, pos_b, n_full

    return make_batched_dispatch("boxbox_manifold", ref, batched)
