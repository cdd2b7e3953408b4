"""Fused Pallas kernel for the constraint CG solve (TPU) — EXPERIMENTAL.

STATUS: opt-in via ROBOGYM_TPU_PALLAS_CG=1 and NOT enabled by default.
On this container's toolchain the Mosaic compile of the fused loop stalls
(>10 min for a toy shape); until that is resolved the production path is
the XLA scan in constraint._make_cg_core. The kernel body mirrors that
scan's math exactly; tests/parity scripts exercise the scan path.

Motivation (PROFILE.md): the nonlinear-CG solve is the per-substep latency
hill — ~20 sequential iterations of ~20 small dependent XLA ops each. This
kernel runs the WHOLE iteration loop inside one Pallas program per 128-env
lane tile, with every operand resident in VMEM and the env batch in the
lane dimension — per-iteration cost becomes VPU cycles instead of kernel
dispatches.

Layouts (feature-major, batch minor):
    J      (nefc, nv, B)    per-env constraint Jacobian
    M/Minv (nv, nv, B)      mass matrix and its inverse
    vectors (nefc|nv, B)
The static row-kind masks are folded into the regularization inputs
(Deq = D*is_eq, Done = D*is_one, Dfr = D*is_fric) so the kernel body is
mask-free: Pallas kernels may not capture array constants.

Integration: `constraint._make_cg_core` wraps this in
`jax.custom_batching.custom_vmap` — unbatched (and non-TPU) calls run the
reference pure-JAX scan; batched TPU calls dispatch here. Same math, f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

ALPHAS = (2.0, 1.0, 0.5, 0.25, 0.12, 0.06, 0.03, 0.015, 0.005, 0.0)


def _matvec_J(J, x, nv):
    """(nefc, nv, L) x (nv, L) -> (nefc, L): sum_v J[:, v, :] * x[v]."""
    acc = J[:, 0, :] * x[0, :][None, :]
    for v in range(1, nv):
        acc = acc + J[:, v, :] * x[v, :][None, :]
    return acc


def _matvec_M(M, x, nv):
    """(nv, nv, L) x (nv, L) -> (nv, L)."""
    acc = M[:, 0, :] * x[0, :][None, :]
    for v in range(1, nv):
        acc = acc + M[:, v, :] * x[v, :][None, :]
    return acc


def _matvec_JT(J, f, nv):
    """(nefc, nv, L)^T x (nefc, L) -> (nv, L): g[v] = sum_e J[e, v, :]*f[e]."""
    outs = []
    for v in range(nv):
        outs.append(jnp.sum(J[:, v, :] * f, axis=0, keepdims=True))
    return jnp.concatenate(outs, axis=0)


def _cg_kernel(iterations, nv, nefc,
               J_ref, aref_ref, Deq_ref, Done_ref, Dfr_ref, floss_ref,
               M_ref, Minv_ref, qs_ref, x0_ref, x_out, f_out):
    J = J_ref[:]
    aref = aref_ref[:]
    Deq = Deq_ref[:]
    Done = Done_ref[:]
    Dfr = Dfr_ref[:]
    floss = floss_ref[:]
    M = M_ref[:]
    Minv = Minv_ref[:]
    qs = qs_ref[:]
    x0 = x0_ref[:]

    def force(jar):
        # Deq/Done/Dfr are D pre-masked by row kind; floss is zero on
        # non-friction rows, so the Huber clip vanishes there
        neg = (jar < 0).astype(jar.dtype)
        return Deq * jar + Done * jar * neg + jnp.clip(
            Dfr * jar, -floss, floss
        )

    def penalty(jar):
        neg = (jar < 0).astype(jar.dtype)
        c_quad = 0.5 * (Deq + Done * neg) * jar * jar
        absDjar = jnp.abs(Dfr * jar)
        inside = (absDjar < floss).astype(jar.dtype)
        quad_f = 0.5 * Dfr * jar * jar
        lin_f = floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(
            Dfr, 1e-12
        )
        # rows with floss == 0: inside=0 and lin_f == 0 -> no contribution
        c_fric = inside * quad_f + (1.0 - inside) * lin_f
        return jnp.sum(c_quad + c_fric, axis=0, keepdims=True)

    def grad(x, jar):
        return _matvec_M(M, x - qs, nv) + _matvec_JT(J, force(jar), nv)

    jar0 = _matvec_J(J, x0, nv) - aref
    g0 = grad(x0, jar0)
    Mg0 = _matvec_M(Minv, g0, nv)
    p0 = -Mg0

    def body(_, carry):
        x, jar, g, Mg, p = carry
        Jp = _matvec_J(J, p, nv)
        dx0 = x - qs
        Mp = _matvec_M(M, p, nv)
        Mdx0 = _matvec_M(M, dx0, nv)
        c0 = jnp.sum(dx0 * Mdx0, axis=0, keepdims=True)
        c1 = jnp.sum(dx0 * Mp, axis=0, keepdims=True)
        c2 = jnp.sum(p * Mp, axis=0, keepdims=True)

        best_cost = jnp.full_like(c0, jnp.inf)
        best_a = jnp.zeros_like(c0)
        for a in ALPHAS:
            cost = 0.5 * (c0 + 2.0 * a * c1 + a * a * c2) + penalty(
                jar + a * Jp
            )
            take = cost < best_cost
            best_cost = jnp.where(take, cost, best_cost)
            best_a = jnp.where(take, a, best_a)

        x = x + best_a * p
        jar = jar + best_a * Jp
        g_new = grad(x, jar)
        Mg_new = _matvec_M(Minv, g_new, nv)
        num = jnp.sum(g_new * (Mg_new - Mg), axis=0, keepdims=True)
        den = jnp.maximum(jnp.sum(g * Mg, axis=0, keepdims=True), 1e-12)
        beta = jnp.maximum(num / den, 0.0)
        p = -Mg_new + beta * p
        return (x, jar, g_new, Mg_new, p)

    x, jar, _, _, _ = jax.lax.fori_loop(
        0, iterations, body, (x0, jar0, g0, Mg0, p0)
    )
    x_out[:] = x
    f_out[:] = -force(jar)


@functools.lru_cache(maxsize=32)
def _build_call(iterations: int, nv: int, nefc: int):
    kernel = functools.partial(_cg_kernel, iterations, nv, nefc)

    def spec3(d0, d1):
        return pl.BlockSpec((d0, d1, LANE), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(d0):
        return pl.BlockSpec((d0, LANE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def call(J, aref, Deq, Done, Dfr, floss, M, Minv, qs, x0):
        B = J.shape[-1]
        assert B % LANE == 0, B
        return pl.pallas_call(
            kernel,
            grid=(B // LANE,),
            in_specs=[
                spec3(nefc, nv), spec2(nefc), spec2(nefc), spec2(nefc),
                spec2(nefc), spec2(nefc),
                spec3(nv, nv), spec3(nv, nv), spec2(nv), spec2(nv),
            ],
            out_specs=[spec2(nv), spec2(nefc)],
            out_shape=[
                jax.ShapeDtypeStruct((nv, B), jnp.float32),
                jax.ShapeDtypeStruct((nefc, B), jnp.float32),
            ],
        )(J, aref, Deq, Done, Dfr, floss, M, Minv, qs, x0)

    return call


def solve_cg_batched(
    kind: np.ndarray, iterations: int,
    J_b, aref_b, D_b, floss_b, M_b, Minv_b, qs_b, x0_b,
) -> Tuple[jax.Array, jax.Array]:
    """Batched (leading axis) CG solve via the fused kernel.
    Returns (qacc (B, nv), efc_force (B, nefc))."""
    from robogym_tpu.physics.constraint import EQ, FRICTION, ONESIDED

    B, nefc, nv = J_b.shape
    pad = (-B) % LANE
    dt = jnp.float32
    kind = np.asarray(kind, np.int32)
    eq_np = (kind == EQ).astype(np.float32)
    one_np = (kind == ONESIDED).astype(np.float32)
    fr_np = (kind == FRICTION).astype(np.float32)

    def fm(x):  # feature-major, batch minor (+ padding)
        x = jnp.moveaxis(x, 0, -1).astype(dt)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), dt)], axis=-1
            )
        return x

    D_t = fm(D_b)
    Deq = D_t * jnp.asarray(eq_np, dt)[:, None]
    Done = D_t * jnp.asarray(one_np, dt)[:, None]
    Dfr = D_t * jnp.asarray(fr_np, dt)[:, None]

    call = _build_call(int(iterations), nv, nefc)
    # guard the padded lanes: identity M/Minv so the in-kernel math stays
    # finite (results for padded lanes are discarded)
    M_t = fm(M_b)
    Minv_t = fm(Minv_b)
    if pad:
        eye = jnp.broadcast_to(
            jnp.eye(nv, dtype=dt)[:, :, None], (nv, nv, pad)
        )
        M_t = M_t.at[:, :, B:].set(eye)
        Minv_t = Minv_t.at[:, :, B:].set(eye)
    x_t, f_t = call(
        fm(J_b), fm(aref_b), Deq, Done, Dfr, fm(floss_b),
        M_t, Minv_t, fm(qs_b), fm(x0_b),
    )
    x = jnp.moveaxis(x_t[:, :B], -1, 0)
    f = jnp.moveaxis(f_t[:, :B], -1, 0)
    return x, f
