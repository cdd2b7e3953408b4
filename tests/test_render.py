"""Raycast renderer: analytic scene checks (no GL on this host, so the
cross-check is geometric truth, not mujoco's renderer)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import make_data
import robogym_tpu.physics.step as S
from robogym_tpu.render import raycast

SCENE = """
<mujoco>
  <compiler angle="radian"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 1" rgba="0.3 0.3 0.3 1"/>
    <camera name="topcam" pos="0 0 2" quat="1 0 0 0" fovy="45"/>
    <camera name="sidecam" pos="2 0 0.5" quat="0.5 0.5 0.5 0.5" fovy="45"/>
    <body name="ball" pos="0 0 0.5">
      <geom name="ball" type="sphere" size="0.3" rgba="1 0 0 1"/>
    </body>
    <body name="crate" pos="1.0 0 0.2">
      <geom name="crate" type="box" size="0.2 0.2 0.2" rgba="0 0 1 1"/>
    </body>
    <body name="post" pos="-1.0 0 0.4">
      <geom name="post" type="cylinder" size="0.1 0.4" rgba="0 1 0 1"/>
    </body>
    <body name="pill" pos="0 1.0 0.4">
      <geom name="pill" type="capsule" size="0.1 0.2" rgba="1 1 0 1"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def scene():
    m = compile_xml(SCENE, dtype=jnp.float32)
    d = S.forward(m, make_data(m, dtype=jnp.float32))
    return m, d


def test_camera_tables(scene):
    m, _ = scene
    assert m.const.ncam == 2
    assert raycast.camera_id(m, "topcam") == 0
    assert float(m.cam_fovy[1]) == 45.0


def test_topdown_hits(scene):
    m, d = scene
    img = np.asarray(
        jax.jit(raycast.render_rgb, static_argnums=(2, 3, 4))(m, d, 0, 64, 64)
    )
    assert img.shape == (64, 64, 3)
    # image center looks straight down at the red ball
    cpix = img[32, 32]
    assert cpix[0] > 2.0 * max(cpix[1], 1e-3)
    # ball: angular radius asin(0.3/1.5)=11.5deg; half-fov 22.5deg = 32 px
    # -> radius ~ tan(11.5)/tan(22.5)*32 ~ 15.8 px -> area ~ pi*15.8^2 ~ 780
    red = (img[:, :, 0] > 1.5 * np.maximum(img[:, :, 1], 1e-3)) & (
        img[:, :, 0] > 0.2
    )
    area = red.sum()
    assert 400 < area < 1200, area
    # floor (gray) fills most of the rest
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_side_camera_sees_ball_above_floor(scene):
    m, d = scene
    img = np.asarray(raycast.render_uint8(m, d, 1, 48, 48))
    assert img.dtype == np.uint8
    red = (img[:, :, 0].astype(int) > 1.5 * img[:, :, 1].astype(int) + 20)
    ys, xs = np.nonzero(red)
    assert len(ys) > 10
    # sidecam at (2, 0, 0.5) looking along -x: ball center projects near
    # image center row (same height as camera)
    assert abs(ys.mean() - 24) < 8


def test_visibility_mask_hides_geom(scene):
    m, d = scene
    ball_gid = m.const.names["geom"]["ball"]
    vis = jnp.ones(m.const.ngeom).at[ball_gid].set(0.0)
    img = np.asarray(raycast.render_rgb(m, d, 0, 32, 32, geom_visible=vis))
    red = (img[:, :, 0] > 1.5 * np.maximum(img[:, :, 1], 1e-3)) & (
        img[:, :, 0] > 0.2
    )
    assert red.sum() == 0


def test_mesh_hull_matches_box():
    # a cube STL-less check: build mesh planes directly from hull verts of a
    # cube and compare the raycast against the analytic box
    from robogym_tpu.mjcf import mesh as mesh_lib

    signs = np.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    ) * 0.25
    planes = mesh_lib.hull_face_planes(signs, 64)
    assert planes.shape[1] == 4 and 6 <= len(planes) <= 12
    o = jnp.asarray([[2.0, 0.0, 0.0]], jnp.float32)
    v = jnp.asarray([[[-1.0, 0.0, 0.0]]], jnp.float32)
    t, n = raycast._isect_hull(
        jnp.asarray(planes, jnp.float32)[None],
        jnp.ones((1, len(planes)), jnp.float32),
        o, v,
    )
    assert float(t[0, 0]) == pytest.approx(1.75, abs=1e-5)
    assert float(n[0, 0, 0]) == pytest.approx(1.0, abs=1e-5)


def test_batched_render_vmaps(scene):
    m, d = scene
    B = 3
    d_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), d)
    imgs = jax.jit(
        jax.vmap(lambda dd: raycast.render_rgb(m, dd, 0, 24, 24)),
    )(d_b)
    assert imgs.shape == (B, 24, 24, 3)
    np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(imgs[2]))
