"""Parity: fused hull-hull narrowphase kernel (interpret) vs XLA reference,
plus analytic sanity on overlapping cubes."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robogym_tpu.physics.collision import convex_kernel


def _cube_verts(center, half):
    signs = np.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )
    v = center[None] + signs * half
    return v.T  # (3, 8)


def _random_hulls(rng, B, K, V):
    pts = rng.standard_normal((B, K, 3, V)).astype(np.float32) * 0.05
    offs = rng.standard_normal((B, K, 3, 1)).astype(np.float32) * 0.08
    v = pts + offs
    c = v.mean(-1)
    return jnp.asarray(v), jnp.asarray(c)


def test_kernel_matches_reference_random():
    rng = np.random.default_rng(3)
    B, K, V = 4, 5, 16
    v1, c1 = _random_hulls(rng, B, K, V)
    v2, c2 = _random_hulls(rng, B, K, V)
    xd = jnp.zeros((B, K, 1, 3), jnp.float32)

    core = convex_kernel._make_hull_core(0)
    dirs12 = jnp.asarray(convex_kernel._dirs12_np())
    ring = jnp.asarray(convex_kernel._ring_np())
    ref = jax.jit(jax.vmap(core, in_axes=(0, 0, 0, 0, 0, None, None)))(
        v1, v2, c1, c2, xd, dirs12, ring)

    old = convex_kernel.INTERPRET
    convex_kernel.INTERPRET = True
    os.environ["ROBOGYM_TPU_FORCE_PALLAS"] = "1"
    try:
        got = jax.jit(jax.vmap(core, in_axes=(0, 0, 0, 0, 0, None, None)))(
            v1, v2, c1, c2, xd, dirs12, ring)
    finally:
        convex_kernel.INTERPRET = old
        del os.environ["ROBOGYM_TPU_FORCE_PALLAS"]

    # dist must agree everywhere; pos/n/p2 may diverge on near-tie direction
    # selections (bf16 reduce-order differs between kernel and XLA) — both
    # witnesses are valid support points, so allow a small mismatch fraction
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=0, atol=2e-3, err_msg="dist")
    for r, g, name, tol in zip(ref[1:], got[1:], ["pos", "n", "p2"],
                               [5e-3, 5e-2, 5e-3]):
        bad = np.abs(np.asarray(g) - np.asarray(r)) > tol
        frac = bad.mean()
        assert frac <= 0.10, (name, frac)


def test_overlapping_cubes_analytic():
    # unit cubes offset 0.9 along x: overlap 0.1, normal +-x
    v1 = jnp.asarray(_cube_verts(np.zeros(3, np.float32), 0.5))[None]
    v2 = jnp.asarray(_cube_verts(np.asarray([0.9, 0, 0], np.float32), 0.5))[None]
    c1 = jnp.zeros((1, 3))
    c2 = jnp.asarray([[0.9, 0.0, 0.0]])
    xd = jnp.zeros((1, 1, 3))
    core = convex_kernel._make_hull_core(0)
    dirs12 = jnp.asarray(convex_kernel._dirs12_np())
    ring = jnp.asarray(convex_kernel._ring_np())
    dist, pos, n, p2 = core(v1, v2, c1, c2, xd, dirs12, ring)
    assert float(dist[0]) == pytest.approx(-0.1, abs=5e-3)
    assert abs(float(n[0, 0])) == pytest.approx(1.0, abs=1e-5)
    assert float(pos[0, 0]) == pytest.approx(0.45, abs=5e-3)


def test_separated_cubes_distance():
    v1 = jnp.asarray(_cube_verts(np.zeros(3, np.float32), 0.5))[None]
    v2 = jnp.asarray(_cube_verts(np.asarray([1.3, 0, 0], np.float32), 0.5))[None]
    c1 = jnp.zeros((1, 3))
    c2 = jnp.asarray([[1.3, 0.0, 0.0]])
    xd = jnp.zeros((1, 1, 3))
    core = convex_kernel._make_hull_core(0)
    dirs12 = jnp.asarray(convex_kernel._dirs12_np())
    ring = jnp.asarray(convex_kernel._ring_np())
    dist, pos, n, p2 = core(v1, v2, c1, c2, xd, dirs12, ring)
    assert float(dist[0]) == pytest.approx(0.3, abs=5e-3)
