"""Parity: fused box-box manifold kernel (interpret mode) vs the XLA
primitive, on random poses including touching/penetrating stacks."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from robogym_tpu.physics.collision import boxbox_kernel, primitives as prim


def _rand_rot(rng, n):
    q = rng.standard_normal((n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q.T
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                      2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                      2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                      1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    ).astype(np.float32)


def _cases(rng, B, K):
    xp1 = (rng.standard_normal((B, K, 3)) * 0.02).astype(np.float32)
    # near-touching second boxes, biased into overlap
    xp2 = xp1 + (rng.standard_normal((B, K, 3)) * 0.04).astype(np.float32)
    xm1 = _rand_rot(rng, B * K).reshape(B, K, 3, 3)
    xm2 = _rand_rot(rng, B * K).reshape(B, K, 3, 3)
    s1 = (0.02 + rng.random((B, K, 3)) * 0.04).astype(np.float32)
    s2 = (0.02 + rng.random((B, K, 3)) * 0.04).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (xp1, xm1, s1, xp2, xm2, s2))


def test_boxbox_kernel_matches_primitive():
    rng = np.random.default_rng(7)
    B, K = 4, 6
    args = _cases(rng, B, K)

    ref = jax.jit(jax.vmap(jax.vmap(prim.box_box)))(*args)

    core = boxbox_kernel.make_core()
    old = boxbox_kernel.INTERPRET
    boxbox_kernel.INTERPRET = True
    os.environ["ROBOGYM_TPU_FORCE_PALLAS"] = "1"
    try:
        got = jax.jit(jax.vmap(core))(*args)
    finally:
        boxbox_kernel.INTERPRET = old
        os.environ.pop("ROBOGYM_TPU_FORCE_PALLAS", None)

    rd, rp, rn = (np.asarray(a, np.float64) for a in ref)
    gd, gp, gn = (np.asarray(a, np.float64) for a in got)
    # valid (non-BIG) slots must agree; BIG sentinels must agree in mask
    valid = rd < 1e9
    assert np.array_equal(valid, gd < 1e9)
    np.testing.assert_allclose(gd[valid], rd[valid], atol=2e-5)
    np.testing.assert_allclose(gn[valid], rn[valid], atol=2e-5)
    np.testing.assert_allclose(gp[valid], rp[valid], atol=2e-5)


def test_boxbox_kernel_resting_stack():
    """Axis-aligned box resting exactly on another: the face-face manifold
    must contain 4 corner contacts at ~zero depth."""
    xp1 = jnp.asarray([[[0.0, 0.0, 0.0]]])
    xp2 = jnp.asarray([[[0.0, 0.0, 0.1]]])
    eye = jnp.eye(3)[None, None]
    s1 = jnp.asarray([[[0.1, 0.1, 0.05]]])
    s2 = jnp.asarray([[[0.04, 0.04, 0.05]]])

    core = boxbox_kernel.make_core()
    old = boxbox_kernel.INTERPRET
    boxbox_kernel.INTERPRET = True
    os.environ["ROBOGYM_TPU_FORCE_PALLAS"] = "1"
    try:
        dist, pos, n = jax.jit(jax.vmap(core))(xp1, eye, s1, xp2, eye, s2)
    finally:
        boxbox_kernel.INTERPRET = old
        os.environ.pop("ROBOGYM_TPU_FORCE_PALLAS", None)

    d = np.asarray(dist)[0, 0]
    touching = np.abs(d) < 1e-4
    assert touching.sum() >= 4, d
    nrm = np.asarray(n)[0, 0, 0]
    assert abs(abs(nrm[2]) - 1.0) < 1e-5, nrm
