"""Fused Pallas kernel for the constraint CG solve (TPU).

Motivation (PROFILE.md): the nonlinear-CG solve is the per-substep latency
hill — ~20 sequential iterations of ~20 small dependent XLA ops each, with
per-env matvecs that lower to pathological micro-GEMMs. This kernel runs
the WHOLE iteration loop inside one Pallas program per 128-env lane tile,
with every operand resident in VMEM and the env batch in the lane
dimension — per-iteration cost becomes VPU cycles instead of kernel
dispatches, and J is read from HBM exactly once.

Layouts (feature-major, batch minor; all feature dims padded to 8):
    J      (E, V, L)    per-env constraint Jacobian, E=nefc_pad, V=nv_pad
    M/Minv (V, V, L)    mass matrix and its inverse
    vectors (E|V, L)
Matvecs are REAL axis reductions over the 3D tiles
(`sum(J * x[None], axis=1)` / `sum(J * f[:, None], axis=0)`) — an earlier
revision unrolled per-dof slices in Python, which traced thousands of
strided ops and stalled the Mosaic compiler.

The static row-kind masks are folded into the regularization inputs
(Deq = D*is_eq, Done = D*is_one, Dfr = D*is_fric) so the kernel body is
mask-free: Pallas kernels may not capture array constants.

Integration: `constraint._make_cg_core` wraps this in
`jax.custom_batching.custom_vmap` — unbatched (and non-TPU) calls run the
reference pure-JAX scan; batched TPU calls dispatch here. Same math, f32.
Set ROBOGYM_TPU_NO_PALLAS_CG=1 to force the XLA scan path.
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

# The fused kernel keeps J (E, V, L), the M-family matrices (V, V, L),
# ~14 (E, L) row maps and ~12 (V, L) vectors resident in VMEM. Worlds with
# hundreds of constraint rows (cubelet Rubik, multi-object rearrange) would
# exceed VMEM at the full 128-lane block — _pick_lane halves the lane width
# until the estimated footprint fits the scoped-VMEM budget, and
# fused_full_fits_vmem routes to the XLA scan path only when even the
# narrowest (32-lane) block cannot fit. The budget is ~4x below the 128MB
# physical VMEM because Mosaic's register-allocator SPILL SLOTS dominate
# the real footprint: the blocks world (E=360, V=56, S=56) measures 133MB
# at lane 128 against a 37MB operand estimate — ~3.6x spill overhead.
_SCOPED_VMEM_BUDGET = 32 * 1024 * 1024


def _footprint_bytes(E: int, V: int, S: int, with_euler: bool) -> int:
    """Per-lane f32 VMEM estimate for the fat kernel: J + ~9 row-build
    facet temps + the M-family matrices + ~14 (E,) coefficient maps."""
    n_mats = 6 if with_euler else 4
    return (E * V + 9 * S * V + n_mats * V * V + 14 * E) * 4


def _pick_lane(est: int) -> int:
    lane = LANE
    while lane > 32 and est * lane > _SCOPED_VMEM_BUDGET:
        lane //= 2
    return lane


def fused_fits_vmem(E: int, V: int) -> bool:
    """Conservative VMEM-footprint check for the SKINNY CG kernel
    (_build_call), which always runs full 128-lane blocks."""
    floats = E * V + 4 * V * V + 16 * E + 16 * V
    return 4 * floats * LANE <= 11 * 1024 * 1024


def fused_full_fits_vmem(E: int, V: int, S: int,
                         with_euler: bool) -> bool:
    """True when the FAT kernel (_build_full_call) fits VMEM at SOME lane
    width >= 32 — it narrows its lane block to fit big systems, so large
    rearrange/Rubik worlds can still take the fused path."""
    est = _footprint_bytes(E, V, S, with_euler)
    return est * _pick_lane(est) <= _SCOPED_VMEM_BUDGET

# must match constraint._make_cg_core's line search (first-min tie-break
# too): frozen-active-set Newton step + these safeguard scales
LS_SCALES = (2.0, 1.0, 0.5, 0.125)

# interpret-mode switch for CPU correctness tests
INTERPRET = False


def _cg_kernel(iterations,
               J_ref, aref_ref, Deq_ref, Done_ref, Dfr_ref, floss_ref,
               M_ref, Minv_ref, qs_ref, x0_ref, x_out, f_out):
    J = J_ref[:]          # (E, V, L)
    aref = aref_ref[:]    # (E, L)
    Deq = Deq_ref[:]
    Done = Done_ref[:]
    Dfr = Dfr_ref[:]
    floss = floss_ref[:]
    M = M_ref[:]          # (V, V, L)
    Minv = Minv_ref[:]
    qs = qs_ref[:]        # (V, L)
    x0 = x0_ref[:]

    def mv_J(x):  # (V, L) -> (E, L)
        return jnp.sum(J * x[None, :, :], axis=1)

    def mv_JT(f):  # (E, L) -> (V, L)
        return jnp.sum(J * f[:, None, :], axis=0)

    def mv_M(A, x):  # (V, V, L) x (V, L) -> (V, L)
        return jnp.sum(A * x[None, :, :], axis=1)

    def force(jar):
        # Deq/Done/Dfr are D pre-masked by row kind; floss is zero on
        # non-friction rows, so the Huber clip vanishes there
        neg = (jar < 0).astype(jar.dtype)
        return Deq * jar + Done * jar * neg + jnp.clip(
            Dfr * jar, -floss, floss
        )

    def penalty(jar):  # (E, L) -> (1, L)
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
        return mv_M(M, x - qs) + mv_JT(force(jar))

    jar0 = mv_J(x0) - aref
    g0 = grad(x0, jar0)
    Mg0 = mv_M(Minv, g0)
    p0 = -Mg0

    def body(_, carry):
        x, jar, g, Mg, p = carry
        Jp = mv_J(p)
        x, jar = _line_search_step(
            x, jar, p, Jp, mv_M, M, qs, force, penalty,
            Deq, Done, Dfr, floss,
        )
        g_new = grad(x, jar)
        Mg_new = mv_M(Minv, g_new)
        # Polak-Ribiere+ with automatic restart
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


def _line_search_step(x, jar, p, Jp, mv_M, M, qs, force, penalty,
                      Deq, Done, Dfr, floss):
    """Frozen-active-set Newton line search (shared by both CG kernels).

    phi(a) is convex piecewise-quadratic: a1 = -phi'(0)/phi''(0+) is exact
    when no row crosses a breakpoint; LS_SCALES safeguards cover over/under-
    shoot. Only cost DELTAS vs a=0 are compared, so no M @ (x - qs) matvec
    is needed. Must stay numerically identical to the XLA reference
    (constraint._scan_cg_solve)."""
    dx0 = x - qs
    Mp = mv_M(M, p)
    c1 = jnp.sum(dx0 * Mp, axis=0, keepdims=True)    # (1, L)
    c2 = jnp.sum(p * Mp, axis=0, keepdims=True)
    f0 = force(jar)
    neg = (jar < 0).astype(jar.dtype)
    inside = (jnp.abs(Dfr * jar) < floss).astype(jar.dtype)
    deff = Deq + Done * neg + Dfr * inside
    phi_p = c1 + jnp.sum(f0 * Jp, axis=0, keepdims=True)
    phi_pp = jnp.maximum(
        c2 + jnp.sum(deff * Jp * Jp, axis=0, keepdims=True), 1e-12
    )
    a1 = jnp.clip(-phi_p / phi_pp, 0.0, 2.0)
    pen0 = penalty(jar)
    best_cost = jnp.zeros_like(c1)
    best_a = jnp.zeros_like(c1)
    for s in LS_SCALES:
        a = a1 * s
        dcost = a * c1 + 0.5 * a * a * c2 + penalty(jar + a * Jp) - pen0
        take = dcost < best_cost
        best_cost = jnp.where(take, dcost, best_cost)
        best_a = jnp.where(take, a, best_a)
    return x + best_a * p, jar + best_a * Jp


@functools.lru_cache(maxsize=32)
def _build_call(iterations: int, nv: int, nefc: int):
    kernel = functools.partial(_cg_kernel, iterations)

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
            # the J tile + reduction temporaries exceed the 16MB default
            # scoped-vmem budget; v5e has 128MB physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=INTERPRET,
        )(J, aref, Deq, Done, Dfr, floss, M, Minv, qs, x0)

    return call


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


# ---------------------------------------------------------------------------
# "fat" kernel: aref + regularizer + CG + J^T f, all in VMEM
# ---------------------------------------------------------------------------


def _build_rows(Js, off1, off2, frame, fric, m1, m2, cdof, F, Ep, use_js):
    """Contact facet rows built IN KERNEL from gathered per-contact data
    (mirrors constraint_batched._contact_rows_single exactly). Inputs are
    batch-minor VMEM values:
      Js (n_s, V, L) scalar rows, off1/off2 (S, 3, L) contact-to-root-com
      offsets, frame (S, 9, L) flattened contact frames, fric (S, 5, L),
      m1/m2 (S, V, L) dof path masks, cdof (V, 6, L).
    Returns J (Ep, V, L). Building J here removes its HBM round trip and
    the XLA-side (S, V, B) facet intermediates."""
    S = off1.shape[0]
    a = [cdof[:, i, :][None] for i in range(3)]      # ang (1, V, L)
    lin = [cdof[:, 3 + i, :][None] for i in range(3)]

    def jrel(off):
        oc = [off[:, i, :][:, None, :] for i in range(3)]   # (S, 1, L)
        return [
            lin[0] + a[1] * oc[2] - a[2] * oc[1],
            lin[1] + a[2] * oc[0] - a[0] * oc[2],
            lin[2] + a[0] * oc[1] - a[1] * oc[0],
        ]

    j1 = jrel(off1)
    j2 = jrel(off2)
    Jrel = [j2[i] * m2 - j1[i] * m1 for i in range(3)]       # (S, V, L)

    def project(row, comps):
        n0 = frame[:, 3 * row + 0, :][:, None, :]
        n1 = frame[:, 3 * row + 1, :][:, None, :]
        n2 = frame[:, 3 * row + 2, :][:, None, :]
        return n0 * comps[0] + n1 * comps[1] + n2 * comps[2]

    Jn = project(0, Jrel)
    facets = [Jn]
    if F >= 4:
        Jt1 = project(1, Jrel)
        Jt2 = project(2, Jrel)
        f0 = fric[:, 0, :][:, None, :]
        f1 = fric[:, 1, :][:, None, :]
        facets = [
            Jn + f0 * Jt1, Jn - f0 * Jt1,
            Jn + f1 * Jt2, Jn - f1 * Jt2,
        ]
    if F >= 6:
        dm = m2 - m1
        Jr = [a[i] * dm for i in range(3)]
        Jtn = project(0, Jr)
        f2 = fric[:, 2, :][:, None, :]
        facets += [Jn + f2 * Jtn, Jn - f2 * Jtn]
    if F == 10:
        Jr1_ = project(1, Jr)
        Jr2_ = project(2, Jr)
        f3 = fric[:, 3, :][:, None, :]
        f4 = fric[:, 4, :][:, None, :]
        facets += [
            Jn + f3 * Jr1_, Jn - f3 * Jr1_,
            Jn + f4 * Jr2_, Jn - f4 * Jr2_,
        ]
    # row order: contact-major, facet-minor (matches the XLA stack+reshape)
    V, L = Jn.shape[1], Jn.shape[2]
    rows = jnp.stack(facets, axis=1).reshape(S * F, V, L)
    # use_js=False: the model has no scalar rows and Js is a dummy block
    J = jnp.concatenate([Js, rows], axis=0) if use_js else rows
    E = J.shape[0]
    if Ep > E:
        J = jnp.concatenate(
            [J, jnp.zeros((Ep - E, V, L), J.dtype)], axis=0
        )
    return J


def _cg_full_kernel(iterations, with_euler, with_smooth, row_build,
                    J_ref, pos_ref, kimp_ref, bref_ref, rcoef_ref, act_ref,
                    floss_ref, eqm_ref, onem_ref, frm_ref,
                    M_ref, Minv_ref, qvel_ref, qs_ref, x0_ref,
                    *rest):
    """Like _cg_kernel, but additionally computes per-row aref
    (-bref*J@qvel - kimp*pos), the regularizer D = active / rdiag (rcoef_ref
    carries MuJoCo's full R = (1-imp)/imp * invweight0 diagApprox, computed
    in XLA-land — see physics/setconst.py), and the output qfrc = J^T f — so
    the only XLA-side work per solve is building J and the (E, L)
    coefficient maps.

    with_euler fuses the implicit-damping semi-implicit Euler velocity
    update (physics/step.py::euler) into the same kernel: extra inputs
    Mimp/Minv_imp (V, V, L) and dt (1, L); extra output qvel_new (V, L).
    This removes the per-substep chain of (B, nv, nv) x (B, nv) micro-GEMMs
    (qM@qacc, Minv_imp applications, the refinement residual) that XLA
    lowers to MXU-padded batched GEMMs at <1% utilization.

    with_smooth additionally computes qacc_smooth = Minv @ qfrc_smooth and
    the warmstart x0 = qacc_prev-if-finite-else-qacc_smooth IN-kernel: the
    qs_ref/x0_ref inputs are reinterpreted as qfrc_smooth/qacc_prev and an
    extra qacc_smooth output is appended."""
    outs = 3 + (1 if with_euler else 0) + (1 if with_smooth else 0)
    tail_refs = rest[:len(rest) - outs]
    out_refs = rest[len(rest) - outs:]
    x_out, f_out, qfrc_out = out_refs[:3]
    if row_build:
        # J_ref is the scalar-row block; the next 7 refs carry the gathered
        # contact data; J is built in VMEM (see _build_rows)
        (off1_ref, off2_ref, frame_ref, fric_ref, m1_ref, m2_ref,
         cdof_ref) = tail_refs[:7]
        tail_refs = tail_refs[7:]
    if with_euler:
        Mimp_ref, Minvimp_ref, dt_ref = tail_refs
        qvel_out = out_refs[3]
    if with_smooth:
        qs_out = out_refs[-1]
    if row_build:
        F, Ep, use_js = row_build
        J = _build_rows(
            J_ref[:], off1_ref[:], off2_ref[:], frame_ref[:], fric_ref[:],
            m1_ref[:], m2_ref[:], cdof_ref[:], F, Ep, use_js,
        )
    else:
        J = J_ref[:]      # (E, V, L)
    pos = pos_ref[:]      # (E, L)
    kimp = kimp_ref[:]
    bref = bref_ref[:]
    rcoef = rcoef_ref[:]
    act = act_ref[:]
    floss = floss_ref[:]
    eqm = eqm_ref[:]
    onem = onem_ref[:]
    frm = frm_ref[:]
    M = M_ref[:]          # (V, V, L)
    Minv = Minv_ref[:]
    qvel = qvel_ref[:]    # (V, L)
    qs = qs_ref[:]
    x0 = x0_ref[:]
    V = J.shape[1]

    def mv_J(x):
        return jnp.sum(J * x[None, :, :], axis=1)

    def mv_JT(f):
        return jnp.sum(J * f[:, None, :], axis=0)

    def mv_M(A, x):
        return jnp.sum(A * x[None, :, :], axis=1)

    if with_smooth:
        # qs_ref/x0_ref arrived as qfrc_smooth/qacc_prev
        qfs, qacc_prev = qs, x0
        qs = mv_M(Minv, qfs)
        finite = jnp.all(
            jnp.abs(qacc_prev) < 1e10, axis=0, keepdims=True
        ).astype(qs.dtype)
        x0 = finite * qacc_prev + (1.0 - finite) * qs
        qs_out[:] = qs

    # aref and regularizer (rcoef already IS MuJoCo's R = (1-imp)/imp *
    # invweight0-diagApprox; no in-kernel diag(J Minv J^T) pass)
    aref = -bref * mv_J(qvel) - kimp * pos
    D = act / jnp.maximum(rcoef, 1e-12)
    Deq = D * eqm
    Done = D * onem
    Dfr = D * frm

    def force(jar):
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
        c_fric = inside * quad_f + (1.0 - inside) * lin_f
        return jnp.sum(c_quad + c_fric, axis=0, keepdims=True)

    def grad(x, jar):
        return mv_M(M, x - qs) + mv_JT(force(jar))

    jar0 = mv_J(x0) - aref
    g0 = grad(x0, jar0)
    Mg0 = mv_M(Minv, g0)
    p0 = -Mg0

    def body(_, carry):
        x, jar, g, Mg, p = carry
        Jp = mv_J(p)
        x, jar = _line_search_step(
            x, jar, p, Jp, mv_M, M, qs, force, penalty,
            Deq, Done, Dfr, floss,
        )
        g_new = grad(x, jar)
        Mg_new = mv_M(Minv, g_new)
        num = jnp.sum(g_new * (Mg_new - Mg), axis=0, keepdims=True)
        den = jnp.maximum(jnp.sum(g * Mg, axis=0, keepdims=True), 1e-12)
        beta = jnp.maximum(num / den, 0.0)
        p = -Mg_new + beta * p
        return (x, jar, g_new, Mg_new, p)

    x, jar, _, _, _ = jax.lax.fori_loop(
        0, iterations, body, (x0, jar0, g0, Mg0, p0)
    )
    f = -force(jar)
    x_out[:] = x
    f_out[:] = f
    qfrc_out[:] = mv_JT(f)
    if with_euler:
        Mimp = Mimp_ref[:]        # (V, V, L)
        Minvimp = Minvimp_ref[:]
        dt = dt_ref[:]            # (1, L)
        qfrc_total = mv_M(M, x)   # momentum-consistent: M qacc
        qacc1 = mv_M(Minvimp, qfrc_total)
        # one iterative-refinement step recovers cho_solve-level accuracy
        qacc_imp = qacc1 + mv_M(Minvimp, qfrc_total - mv_M(Mimp, qacc1))
        qvel_out[:] = qvel + dt * qacc_imp


@functools.lru_cache(maxsize=32)
def _build_full_call(iterations: int, nv: int, nefc: int,
                     with_euler: bool = False, with_smooth: bool = False,
                     row_build=None):
    """row_build (static): None, or (n_s, S, F) — the first input is then
    the (n_s, nv) scalar-row block followed by 7 gathered-contact tensors,
    and J is built in VMEM (_build_rows)."""
    kernel = functools.partial(
        _cg_full_kernel, iterations, with_euler, with_smooth,
        (row_build[2], nefc, row_build[0] > 0) if row_build else None,
    )

    # lane width: big constraint systems (rearrange: E~360, V~56, S~57)
    # exceed the ~100MB scoped-VMEM budget at 128 lanes once J and the
    # row-build intermediates live in VMEM — halve the block instead of
    # failing to compile (same estimate as fused_fits_vmem).
    S_rb = row_build[1] if row_build else 0
    lane = _pick_lane(_footprint_bytes(nefc, nv, S_rb, with_euler))

    def spec3(d0, d1):
        return pl.BlockSpec((d0, d1, lane), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(d0):
        return pl.BlockSpec((d0, lane), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def call(J, pos, kimp, bref, rcoef, act, floss, eqm, onem, frm,
             M, Minv, qvel, qs, x0, *tail_inputs):
        B = pos.shape[-1]
        assert B % lane == 0, B
        if row_build:
            n_s, S, F = row_build
            # scalar rows; an 8-row dummy block when the model has none
            j_spec = spec3(n_s if n_s > 0 else 8, nv)
            rb_specs = [
                spec3(S, 3), spec3(S, 3), spec3(S, 9), spec3(S, 5),
                spec3(S, nv), spec3(S, nv), spec3(nv, 6),
            ]
        else:
            j_spec = spec3(nefc, nv)
            rb_specs = []
        # operand order: J-or-Js, 9 row maps, M/Minv, qvel/qs/x0,
        # [7 row-build tensors], [3 euler tensors]
        in_specs = [j_spec] + [
            spec2(nefc), spec2(nefc), spec2(nefc), spec2(nefc),
            spec2(nefc), spec2(nefc), spec2(nefc), spec2(nefc),
            spec2(nefc),
            spec3(nv, nv), spec3(nv, nv),
            spec2(nv), spec2(nv), spec2(nv),
        ] + rb_specs
        out_specs = [spec2(nv), spec2(nefc), spec2(nv)]
        out_shape = [
            jax.ShapeDtypeStruct((nv, B), jnp.float32),
            jax.ShapeDtypeStruct((nefc, B), jnp.float32),
            jax.ShapeDtypeStruct((nv, B), jnp.float32),
        ]
        if with_euler:
            in_specs += [spec3(nv, nv), spec3(nv, nv), spec2(1)]
            out_specs.append(spec2(nv))
            out_shape.append(jax.ShapeDtypeStruct((nv, B), jnp.float32))
        if with_smooth:
            out_specs.append(spec2(nv))
            out_shape.append(jax.ShapeDtypeStruct((nv, B), jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(B // lane,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=INTERPRET,
        )(J, pos, kimp, bref, rcoef, act, floss, eqm, onem, frm,
          M, Minv, qvel, qs, x0, *tail_inputs)

    return call


def pad_spd_bm(A: jax.Array, V: int, Vp: int, B: int, pad: int) -> jax.Array:
    """Pad a batch-minor (V, V, B) SPD tile to (Vp, Vp, B+pad) with identity
    on padded dofs/lanes so in-kernel factorizations/solves stay finite."""
    dt = jnp.float32
    A = A.astype(dt)
    if Vp > V or pad:
        A = jnp.pad(A, ((0, Vp - V), (0, Vp - V), (0, pad)))
        dpad = np.zeros((Vp, Vp, 1), np.float32)
        for i in range(V, Vp):
            dpad[i, i, 0] = 1.0
        A = A + jnp.asarray(dpad)
        if pad:
            eye = jnp.broadcast_to(
                jnp.eye(Vp, dtype=dt)[:, :, None], (Vp, Vp, pad)
            )
            A = A.at[:, :, B:].set(eye)
    return A


def solve_cg_full(kind: np.ndarray, iterations: int, inputs: dict,
                  euler_inputs: dict = None, with_smooth: bool = False):
    """Fat-kernel entry. All inputs ALREADY batch-minor:
      J (E, V, B), row maps pos/kimp/bref/rcoef/active/floss (E, B),
      M/Minv (V, V, B), qvel/qs/x0 (V, B).
    E and V may be unpadded; this pads to 8 and B to 128.
    Returns (x (V, B), f (E, B), qfrc (V, B)) unpadded.

    euler_inputs (optional): Mimp/Minv_imp (V, V, B) and dt (B,) fuse the
    implicit-damping Euler velocity update; adds qvel_new (V, B) to the
    returns.

    with_smooth: inputs qs/x0 are reinterpreted as qfrc_smooth/qacc_prev and
    qacc_smooth + warmstart are computed in-kernel; adds qacc_smooth (V, B)
    to the returns.

    Instead of "J", inputs may carry the row-build bundle
    (Js (n_s, V, B), off1/off2 (S, 3, B), frame (S, 9, B), fric (S, 5, B),
    m1/m2 (S, V, B), cdof (V, 6, B)): the contact facet rows are then built
    IN KERNEL (no (E, V, B) J through HBM)."""
    from robogym_tpu.physics.constraint import EQ, FRICTION, ONESIDED

    row_build = "J" not in inputs
    if row_build:
        Js = inputs["Js"]
        n_s, V, B = Js.shape
        S = inputs["off1"].shape[0]
        F = (inputs["pos"].shape[0] - n_s) // S
        E = n_s + S * F
    else:
        J = inputs["J"]
        E, V, B = J.shape
    Ep, Vp = _pad8(E), _pad8(max(V, 8))
    pad = (-B) % LANE
    dt = jnp.float32
    kind = np.asarray(kind, np.int32)

    def pad2(x, p0):
        if p0 or pad:
            x = jnp.pad(x.astype(dt), ((0, p0), (0, pad)))
        return x.astype(dt)

    def pad3(x, p0, p1):
        if p0 or p1 or pad:
            x = jnp.pad(x.astype(dt), ((0, p0), (0, p1), (0, pad)))
        return x.astype(dt)

    def kmask(k):
        v = np.pad((kind == k).astype(np.float32), (0, Ep - E))
        return jnp.broadcast_to(jnp.asarray(v, dt)[:, None], (Ep, B + pad))

    M_t = pad_spd_bm(inputs["M"], V, Vp, B, pad)
    Minv_t = pad_spd_bm(inputs["Minv"], V, Vp, B, pad)

    # padded rows: act=0 -> D=0 -> no force; rcoef pad 1 avoids 0-div
    rcoef = pad2(inputs["rcoef"], Ep - E)
    if Ep > E:
        rcoef = rcoef.at[E:, :].set(1.0)

    if row_build:
        # scalar rows only; an all-zero dummy block when the model has none
        J3 = pad3(Js, 8 if n_s == 0 else 0, Vp - V)
        rb = (
            pad3(inputs["off1"], 0, 0), pad3(inputs["off2"], 0, 0),
            pad3(inputs["frame"], 0, 0), pad3(inputs["fric"], 0, 0),
            pad3(inputs["m1"], 0, Vp - V), pad3(inputs["m2"], 0, Vp - V),
            pad3(inputs["cdof"], Vp - V, 0),
        )
    else:
        J3 = jnp.pad(J.astype(dt), ((0, Ep - E), (0, Vp - V), (0, pad)))
        rb = ()

    extra = ()
    if euler_inputs is not None:
        extra = (
            pad_spd_bm(euler_inputs["Mimp"], V, Vp, B, pad),
            pad_spd_bm(euler_inputs["Minv_imp"], V, Vp, B, pad),
            pad2(euler_inputs["dt"][None, :], 0),
        )

    call = _build_full_call(int(iterations), Vp, Ep,
                            euler_inputs is not None, with_smooth,
                            (n_s, S, F) if row_build else None)
    out = call(
        J3,
        pad2(inputs["pos"], Ep - E), pad2(inputs["kimp"], Ep - E),
        pad2(inputs["bref"], Ep - E), rcoef,
        pad2(inputs["active"], Ep - E), pad2(inputs["floss"], Ep - E),
        kmask(EQ), kmask(ONESIDED), kmask(FRICTION),
        M_t, Minv_t,
        pad2(inputs["qvel"], Vp - V), pad2(inputs["qs"], Vp - V),
        pad2(inputs["x0"], Vp - V),
        *rb, *extra,
    )
    # output order: x (V), f (E), qfrc (V), [qvel_new (V)], [qacc_smooth (V)]
    return tuple(
        o[:E, :B] if i == 1 else o[:V, :B] for i, o in enumerate(out)
    )


def solve_cg_batched(
    iterations: int,
    J_b, aref_b, Deq_b, Done_b, Dfr_b, floss_b, M_b, Minv_b, qs_b, x0_b,
) -> Tuple[jax.Array, jax.Array]:
    """Batched (leading axis) CG solve via the fused kernel; row weights
    arrive premasked by kind (constraint.kind_masked_D).
    Returns (qacc (B, nv), efc_force (B, nefc))."""
    B, nefc, nv = J_b.shape
    Ep, Vp = _pad8(nefc), _pad8(nv)
    pad = (-B) % LANE
    dt = jnp.float32

    def fm(x, *feat_pad):
        """batch-minor transpose + zero padding of feature dims and lanes."""
        x = jnp.moveaxis(x, 0, -1).astype(dt)
        pads = [(0, p) for p in feat_pad] + [(0, pad)]
        if any(p for _, p in pads):
            x = jnp.pad(x, pads)
        return x

    Deq = fm(Deq_b, Ep - nefc)
    Done = fm(Done_b, Ep - nefc)
    Dfr = fm(Dfr_b, Ep - nefc)

    # padded dof rows/cols get identity M/Minv so the in-kernel math stays
    # finite there (x0/qs pads are zero -> those dofs stay exactly zero)
    M_t = fm(M_b, Vp - nv, Vp - nv)
    Minv_t = fm(Minv_b, Vp - nv, Vp - nv)
    if Vp > nv or pad:
        diag_pad = np.zeros((Vp, Vp, 1), np.float32)
        for i in range(nv, Vp):
            diag_pad[i, i, 0] = 1.0
        dpj = jnp.asarray(diag_pad, dt)
        M_t = M_t + dpj
        Minv_t = Minv_t + dpj
    if pad:
        eye = jnp.broadcast_to(jnp.eye(Vp, dtype=dt)[:, :, None], (Vp, Vp, pad))
        M_t = M_t.at[:, :, B:].set(eye)
        Minv_t = Minv_t.at[:, :, B:].set(eye)

    call = _build_call(int(iterations), Vp, Ep)
    x_t, f_t = call(
        fm(J_b, Ep - nefc, Vp - nv), fm(aref_b, Ep - nefc),
        Deq, Done, Dfr, fm(floss_b, Ep - nefc),
        M_t, Minv_t, fm(qs_b, Vp - nv), fm(x0_b, Vp - nv),
    )
    x = jnp.moveaxis(x_t[:nv, :B], -1, 0)
    f = jnp.moveaxis(f_t[:nefc, :B], -1, 0)
    return x, f
