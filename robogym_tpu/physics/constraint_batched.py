"""Batch-minor constraint solve path (TPU).

`constraint.solve` assembles contact Jacobian rows per env and solves the
primal problem. Under vmap, the per-env assembly lowers to (B, S, nv, 3)
tensors whose minor dims (3, then nv=30) tile at ~2-9% density on TPU —
the assembly, not the CG iteration, dominated the constraint phase
(scripts/profile_constraint.py).

This module moves the whole post-gather pipeline behind ONE batched
dispatch boundary (physics/pallas_dispatch primitive):

  * reference path (unbatched / CPU): exactly the make_efc contact-facet
    construction + the XLA scan CG — bitwise-compatible semantics.
  * batched TPU path: builds J directly in (rows, nv, B) batch-minor
    layout (lane-dense elementwise ops, cross products written per
    component), computes the (E, B) row coefficient maps batch-major
    (dense) and transposes them (small), then calls the fused Pallas
    kernel `cg_kernel.solve_cg_full` which computes aref, the
    diag(J M^-1 J^T) regularizer, the CG loop and J^T f in VMEM.

Static configuration (scalar-row kinds, facet count, iteration count) is
captured via an lru factory keyed on hashables, mirroring
constraint._make_cg_core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e10


def _facets_per_condim(max_cd: int) -> int:
    return {1: 1, 3: 4, 4: 6, 6: 10}[max_cd]


@functools.lru_cache(maxsize=64)
def _make_core(kind_s_key: bytes, iterations: int, nfacet: int,
               with_euler: bool = False, with_smooth: bool = False):
    """with_euler additionally fuses the implicit-damping Euler velocity
    update (step.py::euler) behind the same boundary: extra trailing args
    (damp (nv,), dt scalar) and an extra qvel_new return.

    with_smooth (requires with_euler) moves M^-1, qacc_smooth and the
    finite-warmstart selection behind the boundary too: the (Minv, qs, x0)
    trailing args become (qfrc_smooth, qacc_prev) and qacc_smooth is
    appended to the returns. The full hot-path step then runs exactly TWO
    batched matrix ops outside the fused kernels (none in XLA batch-major)."""
    assert with_euler or not with_smooth
    from robogym_tpu.physics import constraint as cl

    kind_s = np.frombuffer(kind_s_key, np.int32)

    def _contact_rows_single(pos_c, frame_c, dist_c, margin_c, fric_c, act_c,
                             cd_sel, mask1, mask2, rc1, rc2, cdof):
        """Per-env facet rows from pre-gathered contact data.
        Mirrors make_efc's contact section exactly."""
        S = pos_c.shape[0]
        off1 = pos_c - rc1                                    # (S, 3)
        off2 = pos_c - rc2
        jac1 = (
            cdof[None, :, 3:] + jnp.cross(cdof[None, :, :3], off1[:, None, :])
        ) * mask1[:, :, None]                                 # (S, nv, 3)
        jac2 = (
            cdof[None, :, 3:] + jnp.cross(cdof[None, :, :3], off2[:, None, :])
        ) * mask2[:, :, None]
        Jrel = jac2 - jac1
        Jn = jnp.einsum("si,svi->sv", frame_c[:, 0], Jrel)

        facets = [Jn]
        facet_ok = [cd_sel >= 1]
        if nfacet >= 4:
            Jt1 = jnp.einsum("si,svi->sv", frame_c[:, 1], Jrel)
            Jt2 = jnp.einsum("si,svi->sv", frame_c[:, 2], Jrel)
            facets = [
                Jn + fric_c[:, 0:1] * Jt1,
                Jn - fric_c[:, 0:1] * Jt1,
                Jn + fric_c[:, 1:2] * Jt2,
                Jn - fric_c[:, 1:2] * Jt2,
            ]
            facet_ok = [cd_sel >= 3] * 4
        if nfacet >= 6:
            Jr = cdof[None, :, :3] * (mask2 - mask1)[:, :, None]
            Jtn = jnp.einsum("si,svi->sv", frame_c[:, 0], Jr)
            facets += [
                Jn + fric_c[:, 2:3] * Jtn,
                Jn - fric_c[:, 2:3] * Jtn,
            ]
            facet_ok += [cd_sel >= 4] * 2
        if nfacet == 10:
            Jr1_ = jnp.einsum("si,svi->sv", frame_c[:, 1], Jr)
            Jr2_ = jnp.einsum("si,svi->sv", frame_c[:, 2], Jr)
            facets += [
                Jn + fric_c[:, 3:4] * Jr1_,
                Jn - fric_c[:, 3:4] * Jr1_,
                Jn + fric_c[:, 4:5] * Jr2_,
                Jn - fric_c[:, 4:5] * Jr2_,
            ]
            facet_ok += [cd_sel >= 6] * 4
        rows = jnp.stack(facets, axis=1)                      # (S, F, nv)
        ok = jnp.stack(facet_ok, axis=1)
        ok = ok | (jnp.arange(nfacet)[None, :] == 0)
        active = act_c[:, None] & ok                          # (S, F)
        return rows, active

    def _row_maps(pos_s, solref_s, solimp_s, floss_s, active_s,
                  diagA_s, dist_c, margin_c, solref_c, solimp_c, active_cf,
                  iw_c):
        """All per-row coefficient maps, batch-major friendly shapes.
        Returns pos, kimp, bref, rdiag, active, floss (each (..., E)).
        rdiag = (1-imp)/imp * diagApprox is MuJoCo's full regularizer R
        (mj_diagApprox invweight0 semantics, physics/setconst.py)."""
        F = nfacet
        pos_con = jnp.repeat(dist_c - margin_c, F, axis=-1)
        pos = jnp.concatenate([pos_s, pos_con], axis=-1)
        solref = jnp.concatenate(
            [solref_s, jnp.repeat(solref_c, F, axis=-2)], axis=-2
        )
        solimp = jnp.concatenate(
            [solimp_s, jnp.repeat(solimp_c, F, axis=-2)], axis=-2
        )
        floss = jnp.concatenate(
            [floss_s, jnp.zeros_like(pos_con)], axis=-1
        )
        active = jnp.concatenate(
            [active_s,
             active_cf.reshape(active_cf.shape[:-2] + (-1,)).astype(pos.dtype)],
            axis=-1,
        )
        imp = cl._impedance(solimp, pos)
        k_ref, b_ref = cl._ref_kb(solref, solimp)
        kimp = k_ref * imp
        diagA = jnp.concatenate(
            [diagA_s, jnp.repeat(iw_c, F, axis=-1)], axis=-1
        )
        rdiag = jnp.maximum(
            jnp.maximum((1.0 - imp) / imp, 1e-8) * diagA, 1e-12
        )
        return pos, kimp, b_ref, rdiag, active, floss

    def reference(J_s, pos_s, solref_s, solimp_s, floss_s, active_s,
                  diagA_s,
                  pos_c, frame_c, dist_c, margin_c, fric_c, act_c, cd_sel,
                  iw_c,
                  mask1, mask2, rc1, rc2, solref_c, solimp_c,
                  cdof, qvel, qM, *tail):
        from robogym_tpu.physics import factor_kernel

        if with_smooth:
            qfs, qacc_prev, damp, dtv = tail
            Minv = factor_kernel._spd_inverse_ref(qM)
            qs = Minv @ qfs
            finite = jnp.all(jnp.abs(qacc_prev) < 1e10)
            x0 = jnp.where(finite, qacc_prev, qs)
        elif with_euler:
            Minv, qs, x0, damp, dtv = tail
        else:
            Minv, qs, x0 = tail
        rows, active_cf = _contact_rows_single(
            pos_c, frame_c, dist_c, margin_c, fric_c, act_c, cd_sel,
            mask1, mask2, rc1, rc2, cdof,
        )
        S = pos_c.shape[0]
        nv = cdof.shape[0]
        J = jnp.concatenate([J_s, rows.reshape(S * nfacet, nv)])
        pos, kimp, bref, rdiag, active, floss = _row_maps(
            pos_s, solref_s, solimp_s, floss_s, active_s.astype(J.dtype),
            diagA_s, dist_c, margin_c, solref_c, solimp_c, active_cf, iw_c,
        )
        aref = -bref * (J @ qvel) - kimp * pos
        D = jnp.where(active > 0, 1.0 / rdiag, 0.0)

        kind_full = np.concatenate(
            [kind_s, np.full(S * nfacet, cl.ONESIDED, np.int32)]
        )
        core = cl._make_cg_core(iterations)
        Deq, Done, Dfr = cl.kind_masked_D(kind_full, D)
        x, f = core(J, aref, Deq, Done, Dfr, floss, qM, Minv, qs, x0)
        qfrc = J.T @ f
        if not with_euler:
            return x, qfrc, f
        # same math as the fused kernel: explicit (M + dt diag(damp))^-1
        # apply + one iterative-refinement step (step.py::euler semantics)
        Mimp = qM + dtv * jnp.diag(damp)
        Minv_imp = factor_kernel._spd_inverse_ref(Mimp)
        qfrc_total = qM @ x
        qacc1 = Minv_imp @ qfrc_total
        qacc_imp = qacc1 + Minv_imp @ (qfrc_total - Mimp @ qacc1)
        qvel_new = qvel + dtv * qacc_imp
        if with_smooth:
            return x, qfrc, f, qvel_new, qs
        return x, qfrc, f, qvel_new

    def batched(J_s, pos_s, solref_s, solimp_s, floss_s, active_s,
                diagA_s,
                pos_c, frame_c, dist_c, margin_c, fric_c, act_c, cd_sel,
                iw_c,
                mask1, mask2, rc1, rc2, solref_c, solimp_c,
                cdof, qvel, qM, *tail):
        # every operand arrives with a uniform leading batch axis:
        # pallas_dispatch's batching rule broadcasts the unbatched ones
        # (constant scalar-block rows, model-constant solref/floss, shared
        # damp/dt) before calling here
        import os

        from robogym_tpu.physics import cg_kernel as _ck

        n_s = J_s.shape[1]
        S_rows = mask1.shape[1]
        nv = cdof.shape[1]
        use_pallas = (
            (
                jax.default_backend() not in ("cpu", "gpu")
                or os.environ.get("ROBOGYM_TPU_FORCE_PALLAS")
            )
            and not os.environ.get("ROBOGYM_TPU_NO_PALLAS")
            # oversized systems (many contact facet rows / wide nv) exceed
            # VMEM in the fused kernel and kill the TPU compile — use the
            # vmapped XLA reference there (which itself guards its inner
            # CG core the same way). The gate is lane-aware: big rearrange/
            # Rubik systems run the fat kernel at a narrower lane block.
            and _ck.fused_full_fits_vmem(n_s + S_rows * nfacet, nv, S_rows,
                                         with_euler)
        )
        if not use_pallas:
            return jax.vmap(reference)(
                J_s, pos_s, solref_s, solimp_s, floss_s, active_s, diagA_s,
                pos_c, frame_c, dist_c, margin_c, fric_c, act_c, cd_sel,
                iw_c,
                mask1, mask2, rc1, rc2, solref_c, solimp_c,
                cdof, qvel, qM, *tail,
            )

        from robogym_tpu.physics import cg_kernel

        B, S, nv = mask1.shape
        F = nfacet
        dt = jnp.float32
        t = lambda x: jnp.moveaxis(x.astype(dt), 0, -1)  # B -> minor

        # ---- J is built INSIDE the Pallas kernel (cg_kernel._build_rows)
        # from the small gathered tensors below: no (E, nv, B) J (or its
        # (S, nv, B) facet intermediates) ever goes through HBM
        row_bundle = dict(
            Js=t(J_s),
            off1=t(pos_c - rc1),                         # (S, 3, B)
            off2=t(pos_c - rc2),
            frame=t(frame_c.reshape(B, S, 9)),           # (S, 9, B)
            fric=t(fric_c),                              # (S, 5, B)
            m1=t(mask1),                                 # (S, nv, B)
            m2=t(mask2),
            cdof=t(cdof),                                # (nv, 6, B)
        )

        # ---- (B, E) coefficient maps (dense batch-major), then transpose
        oks = [cd_sel >= 1]
        if F >= 4:
            oks = [cd_sel >= 3] * 4
        if F >= 6:
            oks += [cd_sel >= 4] * 2
        if F == 10:
            oks += [cd_sel >= 6] * 4
        ok = jnp.stack(oks, axis=-1)                      # (B, S, F)
        ok = ok | (jnp.arange(F)[None, None, :] == 0)
        active_cf = act_c[:, :, None] & ok                # (B, S, F)

        pos, kimp, bref, rdiag, active, floss = _row_maps(
            pos_s, solref_s, solimp_s, floss_s, active_s.astype(dt),
            diagA_s, dist_c, margin_c, solref_c, solimp_c, active_cf, iw_c,
        )

        M_t = t(qM)
        from robogym_tpu.physics import constraint as cl
        from robogym_tpu.physics import factor_kernel

        if with_smooth:
            qfs_b, qaccp_b, damp_b, dt_b = tail
            Minv_t = factor_kernel.spd_inverse_bm(M_t)
            qs_t, x0_t = t(qfs_b), t(qaccp_b)  # reinterpreted in-kernel
        elif with_euler:
            Minv_b, qs_b, x0_b, damp_b, dt_b = tail
            Minv_t, qs_t, x0_t = t(Minv_b), t(qs_b), t(x0_b)
        else:
            Minv_b, qs_b, x0_b = tail
            Minv_t, qs_t, x0_t = t(Minv_b), t(qs_b), t(x0_b)
        inputs = dict(
            pos=t(pos), kimp=t(kimp), bref=t(bref), rcoef=t(rdiag),
            active=t(active), floss=t(floss),
            M=M_t, Minv=Minv_t, qvel=t(qvel), qs=qs_t, x0=x0_t,
            **row_bundle,
        )

        kind_full = np.concatenate(
            [kind_s, np.full(S * F, cl.ONESIDED, np.int32)]
        )
        back = lambda x: jnp.moveaxis(x, -1, 0)
        if with_euler:
            damp_t = t(damp_b)                               # (V, B)
            dt_t = dt_b.astype(dt)                           # (B,)
            Vn = damp_t.shape[0]
            eye = jnp.asarray(np.eye(Vn, dtype=np.float32))[:, :, None]
            Mimp_t = M_t + eye * (damp_t * dt_t[None, :])[None, :, :]
            Minv_imp_t = factor_kernel.spd_inverse_bm(Mimp_t)
            out_t = cg_kernel.solve_cg_full(
                kind_full, iterations, inputs,
                euler_inputs=dict(Mimp=Mimp_t, Minv_imp=Minv_imp_t,
                                  dt=dt_t),
                with_smooth=with_smooth,
            )
            # kernel order (x, f, qfrc, ...) -> core order (x, qfrc, f, ...)
            x_t, f_t, qfrc_t = out_t[0], out_t[1], out_t[2]
            return (back(x_t), back(qfrc_t), back(f_t)) + tuple(
                back(o) for o in out_t[3:]
            )
        x_t, f_t, qfrc_t = cg_kernel.solve_cg_full(
            kind_full, iterations, inputs
        )
        return back(x_t), back(qfrc_t), back(f_t)

    from robogym_tpu.physics.pallas_dispatch import make_batched_dispatch

    return make_batched_dispatch(
        f"cg_full_f{nfacet}_i{iterations}"
        f"_e{int(with_euler)}_s{int(with_smooth)}",
        reference, batched,
    )
