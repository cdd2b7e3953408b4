"""Parity: fused Pallas SPD-inverse kernel (interpret mode) vs XLA cholesky."""

import numpy as np
import pytest

import jax.numpy as jnp

from robogym_tpu.physics import factor_kernel


@pytest.mark.parametrize("B,V", [(4, 5), (8, 30), (3, 1)])
def test_spd_inverse_matches_reference(B, V):
    rng = np.random.default_rng(1)
    A = rng.standard_normal((B, V, V)).astype(np.float32)
    M = A @ np.swapaxes(A, 1, 2) + 2.0 * np.eye(V, dtype=np.float32)

    ref = np.linalg.inv(M)

    old = factor_kernel.INTERPRET
    factor_kernel.INTERPRET = True
    try:
        out = np.asarray(factor_kernel.spd_inverse_batched(jnp.asarray(M)))
    finally:
        factor_kernel.INTERPRET = old

    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)
