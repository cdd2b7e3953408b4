"""Camera/lighting domain-randomization tests (reference
rearrange/common/base.py:637-730 semantics, TPU model_fields path)."""

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import make_data
from robogym_tpu.physics import step as physics
from robogym_tpu.randomization import vision as vision_rand
from robogym_tpu.render import raycast

XML = """
<mujoco>
  <worldbody>
    <light directional="true" ambient="0.2 0.2 0.2" diffuse="0.8 0.8 0.8"
           pos="0 1 4" dir="0 0 -1" name="light0"/>
    <geom name="floor" type="plane" size="2 2 .1" rgba="0.5 0.5 0.5 1"/>
    <body name="box" pos="0 0 0.1">
      <geom name="box" type="box" size="0.1 0.1 0.1" rgba="0.9 0.2 0.1 1"/>
    </body>
    <body name="cambody" pos="0.7 0 0.6">
      <camera name="cam" quat="0.8446232  0.19134172 0.19134172 0.46193977"
              fovy="45"/>
    </body>
  </worldbody>
</mujoco>
"""


def _world():
    m = compile_xml(XML, dtype=jnp.float64)
    d = physics.fwd_position(m, make_data(m, dtype=jnp.float64))
    return m, d


def test_lights_parsed_from_mjcf():
    m, _ = _world()
    assert m.const.nlight == 1
    assert bool(m.const.light_directional[0])
    np.testing.assert_allclose(np.asarray(m.light_pos[0]), [0, 1, 4])
    np.testing.assert_allclose(float(m.light_diffuse[0]), 0.8)
    np.testing.assert_allclose(float(m.light_ambient[0]), 0.2)


def test_directional_light_shades_top_brighter_than_side():
    """With the (0,0,-1) directional light, upward-facing faces receive the
    diffuse term; the box top must out-bright the box side."""
    m, d = _world()
    img = np.asarray(raycast.render_rgb(m, d, 0, 48, 48))
    red = (img[..., 0] > 1.5 * img[..., 2]) & (img[..., 0] > 0.1)
    assert red.sum() > 20  # box visible
    rows = np.nonzero(red.any(axis=1))[0]
    k = max(len(rows) // 4, 1)
    top_rows, bot_rows = red[rows[:k]], red[rows[-k:]]
    top = img[rows[:k], :, 0][top_rows].mean()
    bot = img[rows[-k:], :, 0][bot_rows].mean()
    assert top > bot + 0.1, (top, bot)


def test_light_fields_change_image():
    """Overriding light intensity via model_fields changes the render —
    the DR path reaches the shader."""
    m, d = _world()
    img0 = np.asarray(raycast.render_rgb(m, d, 0, 32, 32))
    m2 = core.apply_model_fields(
        m, {"light_diffuse": m.light_diffuse * 0.0,
            "light_ambient": m.light_ambient * 0.0}
    )
    img1 = np.asarray(raycast.render_rgb(m2, d, 0, 32, 32))
    assert np.abs(img0 - img1).max() > 0.2


def test_sample_vision_fields_bounds_and_determinism():
    m, _ = _world()
    p = vision_rand.VisionRandomizationParams(
        camera_fovy_radius=2.0, camera_pos_radius=0.01,
        camera_quat_radius=0.09, light_pos_range=0.8,
        light_diffuse_intensity=0.55, light_ambient_intensity=0.3,
    )
    f1 = vision_rand.sample_vision_fields(jax.random.key(3), m, p)
    f2 = vision_rand.sample_vision_fields(jax.random.key(3), m, p)
    f3 = vision_rand.sample_vision_fields(jax.random.key(4), m, p)
    # deterministic per key
    for k in f1:
        np.testing.assert_array_equal(np.asarray(f1[k]), np.asarray(f2[k]))
    assert np.abs(np.asarray(f1["cam_pos"]) - np.asarray(f3["cam_pos"])).max() > 0

    # fovy within radius
    assert np.abs(np.asarray(f1["cam_fovy"] - m.cam_fovy)).max() <= 2.0
    # pos delta exactly on the radius sphere (base.py:652-660)
    dpos = np.asarray(f1["cam_pos"] - m.cam_pos)
    np.testing.assert_allclose(np.linalg.norm(dpos, axis=-1), 0.01, rtol=1e-5)
    # light stays 4 m from origin, dir unit-norm opposite the raw position
    lp = np.asarray(f1["light_pos"])
    np.testing.assert_allclose(np.linalg.norm(lp, axis=-1), 4.0, rtol=1e-6)
    ld = np.asarray(f1["light_dir"])
    np.testing.assert_allclose(np.linalg.norm(ld, axis=-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(ld, -lp / 4.0, atol=1e-6)
    # headlight intensities are set, not sampled
    np.testing.assert_allclose(float(f1["headlight_diffuse"]), 0.55)
    np.testing.assert_allclose(float(f1["headlight_ambient"]), 0.3)


def test_randomized_camera_changes_image_same_seed_matches():
    m, d = _world()
    p = vision_rand.VisionRandomizationParams(
        camera_pos_radius=0.05, camera_quat_radius=0.09,
        light_pos_range=0.8,
    )

    def render_with(key):
        fields = vision_rand.sample_vision_fields(key, m, p)
        m2 = core.apply_model_fields(m, fields)
        return np.asarray(raycast.render_rgb(m2, d, 0, 32, 32))

    a = render_with(jax.random.key(0))
    b = render_with(jax.random.key(0))
    c = render_with(jax.random.key(1))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.02
