"""Fused Pallas kernel: batched SPD inverse (TPU).

The per-substep pipeline needs M^-1 (explicit, reused by qacc_smooth, the
constraint regularizer and the CG preconditioner) and (M + dt*damping)^-1
(implicit-damping Euler). XLA lowers batched (B, nv, nv) cholesky +
triangular solves to its generic batched LAPACK-style loops — measured
~5.5 ms/substep at B=1024 on dactyl/locked (PROFILE.md), all latency.

This kernel runs the WHOLE factor+invert sequence for 128 envs per program
with the batch in the lane dimension: right-looking Cholesky (V static
steps of rank-1 (V,V,L) updates), forward substitution for Linv, then
Ainv = Linv^T Linv — ~3*V FMA sweeps over a (V,V,128) VMEM tile, no HBM
round-trips.

Used via `spd_inverse` (physics/pallas_dispatch primitive): unbatched or
non-TPU calls run the XLA cholesky reference path; batched TPU calls
dispatch here. Set ROBOGYM_TPU_NO_PALLAS=1 to force the reference path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# interpret-mode switch for CPU correctness tests
INTERPRET = False


def _spd_inverse_kernel(V, A_ref, out_ref):
    A = A_ref[:]  # (V, V, L)
    L = A.shape[-1]
    dtype = A.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0)

    # right-looking Cholesky: after step j, column j of Lmat is final; the
    # trailing block of A has the rank-1 update applied. Leading columns of
    # A get contaminated but are never read again.
    cols = []
    for j in range(V):
        col = A[:, j, :]                                   # (V, L)
        dj = jnp.sqrt(jnp.maximum(col[j:j + 1, :], 1e-20))  # (1, L)
        colL = jnp.where(rows > j, col / dj, 0.0)
        colL = jnp.where(rows == j, dj, colL)
        A = A - colL[:, None, :] * colL[None, :, :]
        cols.append(colL[:, None, :])
    Lmat = jnp.concatenate(cols, axis=1)                    # (V, V, L)

    # forward substitution: X = L^-1 (solve L X = I row by row)
    R = jnp.broadcast_to(jnp.eye(V, dtype=dtype)[:, :, None], (V, V, L))
    xrows = []
    for i in range(V):
        yi = R[i] / Lmat[i, i:i + 1, :]                     # (V, L)
        R = R - Lmat[:, i, :][:, None, :] * yi[None, :, :]
        xrows.append(yi[None])
    X = jnp.concatenate(xrows, axis=0)                      # (V, V, L)

    # Ainv = X^T X
    acc = X[0][:, None, :] * X[0][None, :, :]
    for i in range(1, V):
        acc = acc + X[i][:, None, :] * X[i][None, :, :]
    out_ref[:] = acc


@functools.lru_cache(maxsize=16)
def _build_call(V: int):
    kernel = functools.partial(_spd_inverse_kernel, V)

    def call(A):
        B = A.shape[-1]
        assert B % LANE == 0, B
        spec = pl.BlockSpec((V, V, LANE), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B // LANE,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((V, V, B), jnp.float32),
            interpret=INTERPRET,
        )(A)

    return call


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def spd_inverse_batched(A_b: jax.Array) -> jax.Array:
    """(B, V, V) SPD matrices -> (B, V, V) inverses via the fused kernel."""
    B, V, _ = A_b.shape
    Vp = _pad8(max(V, 8))
    pad = (-B) % LANE
    At = jnp.moveaxis(A_b, 0, -1).astype(jnp.float32)       # (V, V, B)
    if Vp > V or pad:
        At = jnp.pad(At, ((0, Vp - V), (0, Vp - V), (0, pad)))
        # identity on padded dofs/lanes keeps the factorization finite
        dpad = np.zeros((Vp, Vp, 1), np.float32)
        for i in range(V, Vp):
            dpad[i, i, 0] = 1.0
        At = At + jnp.asarray(dpad)
        if pad:
            eye = jnp.broadcast_to(
                jnp.eye(Vp, dtype=jnp.float32)[:, :, None], (Vp, Vp, pad)
            )
            At = At.at[:, :, B:].set(eye)
    out = _build_call(Vp)(At)
    return jnp.moveaxis(out[:V, :V, :B], -1, 0).astype(A_b.dtype)


def spd_inverse_bm(A_t: jax.Array) -> jax.Array:
    """Batch-MINOR (V, V, B) SPD inverse via the fused kernel — used by
    callers that already hold batch-minor tiles (constraint_batched), so no
    layout round-trip through (B, V, V)."""
    V, _, B = A_t.shape
    Vp = _pad8(max(V, 8))
    pad = (-B) % LANE
    At = A_t.astype(jnp.float32)
    if Vp > V or pad:
        At = jnp.pad(At, ((0, Vp - V), (0, Vp - V), (0, pad)))
        dpad = np.zeros((Vp, Vp, 1), np.float32)
        for i in range(V, Vp):
            dpad[i, i, 0] = 1.0
        At = At + jnp.asarray(dpad)
        if pad:
            eye = jnp.broadcast_to(
                jnp.eye(Vp, dtype=jnp.float32)[:, :, None], (Vp, Vp, pad)
            )
            At = At.at[:, :, B:].set(eye)
    out = _build_call(Vp)(At)
    return out[:V, :V, :B].astype(A_t.dtype)


def _spd_inverse_ref(A: jax.Array) -> jax.Array:
    Lc = jax.scipy.linalg.cholesky(A, lower=True)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    Linv = jax.scipy.linalg.solve_triangular(Lc, eye, lower=True)
    return Linv.T @ Linv


def _spd_inverse_batched_dispatch(A: jax.Array) -> jax.Array:
    use_pallas = (
        A.ndim == 3
        and jax.default_backend() not in ("cpu", "gpu")
        and not os.environ.get("ROBOGYM_TPU_NO_PALLAS")
    )
    if use_pallas:
        return spd_inverse_batched(A)
    return jax.vmap(_spd_inverse_ref)(A)


from robogym_tpu.physics.pallas_dispatch import make_batched_dispatch

# SPD inverse of an (nv, nv) matrix; whole-batch vmap -> Pallas on TPU.
spd_inverse = make_batched_dispatch(
    "spd_inverse", _spd_inverse_ref, _spd_inverse_batched_dispatch,
    single_output=True,
)
