"""Compile-time derived constants (MuJoCo mj_setConst analogue).

MuJoCo regularizes constraint rows with `diagApprox` values drawn from
*_invweight0 arrays precomputed ONCE at qpos0 (engine_support.c
mj_setConst / engine_core_constraint.c mj_diagApprox), NOT from the
instantaneous diag(J M^-1 J^T). Round-3 conformance probes showed the
instantaneous approximation is exactly where the Shadow-Hand passive
trajectories diverged from MuJoCo (constraint-force error ~1e-3 on
friction/limit rows with posture-dependent inertia).

Verified numerically against MuJoCo 3 efc_R:
  friction dof row:  R = (1-imp)/imp * dof_invweight0[dof]
  joint limit row:   R = (1-imp)/imp * dof_invweight0[dof]
  tendon limit row:  R = (1-imp)/imp * tendon_invweight0[t]
  eq joint row:      R = (1-imp)/imp * (dof_iw0[d1] + dof_iw0[d2])
  eq connect row:    R = (1-imp)/imp * (body_iw0[b1,trn] + body_iw0[b2,trn])
  eq weld rows:      trn rows use trn sums, rot rows rot sums
  contact row (pyramidal): R = (1-imp)/imp * 4*(body_iw0[b1,trn]+body_iw0[b2,trn])
    (factor 4 measured constant across mu/condim)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from robogym_tpu.mjcf.model import Data, Model, make_data


def compute_invweight0(m: Model):
    """(dof_invweight0 (nv,), body_invweight0 (nbody, 2),
    tendon_invweight0 (ntendon,)) at qpos0, as numpy."""
    # This is episodic host-side setup math over tiny arrays. Pin it to the
    # CPU backend: under a remote-TPU default device the eager op-by-op
    # dispatch below pays a device round trip PER OP (measured 380 s for
    # the locked world through the axon tunnel; <2 s on CPU).
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return _compute_invweight0_cpu(m)


def _compute_invweight0_cpu(m: Model):
    from robogym_tpu.physics import smooth

    c = m.const
    nv = c.nv
    if nv == 0:
        return (np.zeros(0), np.zeros((c.nbody, 2)), np.zeros(c.ntendon))

    # model dtype (f64 under x64-enabled test runs, f32 on device-only
    # runs); the host-side inverse below is always f64
    m = jax.device_put(m)
    d = make_data(m)
    d = d.replace(qpos=m.qpos0)
    # smooth position stage only (no collision / factor kernels)
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.crb(m, d)
    d = smooth.tendon(m, d)

    Minv = np.linalg.inv(np.asarray(d.qM, np.float64))
    dof_iw = np.diag(Minv).copy()
    # MuJoCo averages the rotational invweight across a free/ball joint's
    # rotation dofs (mj_setConst; verified against dof_invweight0)
    from robogym_tpu.mjcf.model import JointType

    for j in range(c.njnt):
        jt = int(c.jnt_type[j])
        adr = int(c.jnt_dofadr[j])
        if jt == JointType.FREE:
            dof_iw[adr:adr + 3] = dof_iw[adr:adr + 3].mean()
            dof_iw[adr + 3:adr + 6] = dof_iw[adr + 3:adr + 6].mean()
        elif jt == JointType.BALL:
            dof_iw[adr:adr + 3] = dof_iw[adr:adr + 3].mean()

    body_iw = np.zeros((c.nbody, 2))
    for b in range(1, c.nbody):
        Jt = np.asarray(smooth.point_jacobian(m, d, d.xipos[b], b))
        Jr = np.asarray(smooth.rotation_jacobian(m, d, b))
        At = Jt @ Minv @ Jt.T
        Ar = Jr @ Minv @ Jr.T
        body_iw[b, 0] = np.trace(At) / 3.0
        body_iw[b, 1] = np.trace(Ar) / 3.0

    if c.ntendon:
        tj = np.asarray(d.ten_J, np.float64)          # (ntendon, nv)
        ten_iw = np.einsum("ti,ij,tj->t", tj, Minv, tj)
    else:
        ten_iw = np.zeros(0)
    return dof_iw, body_iw, ten_iw


def invweight0(m: Model):
    """Cached accessor: computes once per compiled model (cache rides on
    the static ModelConst, the same pattern as the actuation partition).

    The compute path goes through numpy (host-side f64 inverse), so when
    the first call happens INSIDE a jit trace (a fresh ModelConst used
    straight under jit — e.g. the effort-mode model swap), omnistaging
    would hand numpy a tracer. ensure_compile_time_eval keeps the
    computation eager; Model leaves here are compile-time constants by
    construction (invweight0 is mj_setConst data)."""
    c = m.const
    cached = getattr(c, "_invweight0", None)
    if cached is None:
        with jax.ensure_compile_time_eval():
            cached = compute_invweight0(m)
        object.__setattr__(c, "_invweight0", cached)
    return cached
