"""Parity: fused Pallas CG kernel (interpret mode) vs the reference XLA scan.

The production TPU path dispatches the batched constraint solve to
physics/cg_kernel.py; on CPU the custom_vmap rule falls back to the scan.
Here the kernel runs in Pallas interpret mode so both paths execute on CPU
and must agree bit-for-bit in structure (same math, same alphas, f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robogym_tpu.physics import cg_kernel
from robogym_tpu.physics import constraint


def _random_problem(rng, B, nefc, nv):
    A = rng.standard_normal((B, nv, nv)).astype(np.float32)
    M = A @ np.swapaxes(A, 1, 2) + 3.0 * np.eye(nv, dtype=np.float32)
    Minv = np.linalg.inv(M)
    J = rng.standard_normal((B, nefc, nv)).astype(np.float32)
    aref = rng.standard_normal((B, nefc)).astype(np.float32)
    D = np.abs(rng.standard_normal((B, nefc))).astype(np.float32) + 0.1
    kind = rng.integers(0, 3, nefc).astype(np.int32)
    floss = np.where(
        kind == constraint.FRICTION,
        np.abs(rng.standard_normal((B, nefc))).astype(np.float32) + 0.05,
        0.0,
    ).astype(np.float32)
    # inactive rows have D == 0 (as emitted by make_efc)
    D = D * (rng.random((B, nefc)) > 0.2)
    qs = rng.standard_normal((B, nv)).astype(np.float32)
    x0 = qs + 0.1 * rng.standard_normal((B, nv)).astype(np.float32)
    return J, aref, D.astype(np.float32), floss, M, Minv, qs, x0, kind


@pytest.mark.parametrize("B,nefc,nv", [(4, 11, 5), (8, 24, 16)])
def test_pallas_cg_matches_scan(B, nefc, nv):
    rng = np.random.default_rng(0)
    J, aref, D, floss, M, Minv, qs, x0, kind = _random_problem(
        rng, B, nefc, nv
    )
    iters = 12
    core = constraint._make_cg_core(iters)
    Deq, Done, Dfr = constraint.kind_masked_D(kind, jnp.asarray(D))
    args = (jnp.asarray(J), jnp.asarray(aref), Deq, Done, Dfr,
            jnp.asarray(floss), jnp.asarray(M), jnp.asarray(Minv),
            jnp.asarray(qs), jnp.asarray(x0))
    x_ref, f_ref = jax.vmap(lambda *a: core(*a))(*args)

    old = cg_kernel.INTERPRET
    cg_kernel.INTERPRET = True
    try:
        x_k, f_k = cg_kernel.solve_cg_batched(iters, *args)
    finally:
        cg_kernel.INTERPRET = old

    # differences are pure f32 accumulation order (different reduce trees)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=5e-3, atol=5e-3)
