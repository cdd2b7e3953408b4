"""Cross-engine conformance harness: our JAX engine vs MuJoCo 3 (CPU).

The TPU-build analogue of the reference's FK-vs-sim cross-check
(/root/reference/robogym/mujoco/test/test_mujoco_utils.py) extended to full
dynamics, per BASELINE.json's conformance north star. MuJoCo 3 is the
available ground-truth C engine in this image (the reference pinned
mujoco-py 2.0, not installable here); solver details differ slightly, so
trajectory tolerances are looser than the in-engine determinism tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import make_data
from robogym_tpu.physics import step as S

PENDULUM = """
<mujoco><compiler angle="radian"/><option timestep="0.002" gravity="0 0 -9.81"/>
<worldbody>
  <body name="pole" pos="0 0 1">
    <joint name="hinge" type="hinge" axis="0 1 0" damping="0.02"/>
    <geom name="rod" type="capsule" fromto="0 0 0 0 0 -0.4" size="0.02"
          density="800" contype="0" conaffinity="0"/>
  </body>
</mujoco></worldbody></mujoco>
""".replace("</mujoco></worldbody></mujoco>", "</worldbody></mujoco>")

BOX_DROP = """
<mujoco><compiler angle="radian"/><option timestep="0.002" gravity="0 0 -9.81"/>
<worldbody>
  <geom name="floor" type="plane" size="1 1 1" pos="0 0 0"/>
  <body name="b" pos="0.01 0.02 0.06">
    <freejoint name="f"/>
    <geom name="g" type="box" size=".03 .03 .03" density="421" condim="4"/>
  </body>
</worldbody></mujoco>
"""

BOX_ON_BOX = """
<mujoco><compiler angle="radian"/><option timestep="0.002" gravity="0 0 -9.81"/>
<worldbody>
  <geom name="base" type="box" size=".1 .1 .05" pos="0 0 0.05"/>
  <body name="b" pos="0.02 0.01 0.16">
    <freejoint name="f"/>
    <geom name="g" type="box" size=".03 .03 .03" density="421" condim="4"/>
  </body>
</worldbody></mujoco>
"""


def run_pair(xml: str, n_substeps: int, qpos0=None):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_data = mujoco.MjData(mj_model)
    m = compile_xml(xml, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    if qpos0 is not None:
        d = d.replace(qpos=jnp.asarray(qpos0, jnp.float64))
    mj_data.qpos[:] = np.asarray(d.qpos)
    mujoco.mj_forward(mj_model, mj_data)
    step_j = jax.jit(lambda dd: S.step(m, dd))
    ours, theirs = [], []
    for _ in range(n_substeps):
        mujoco.mj_step(mj_model, mj_data)
        d = step_j(d)
        ours.append(np.asarray(d.qpos))
        theirs.append(mj_data.qpos.copy())
    return np.stack(ours), np.stack(theirs)


def test_pendulum_conformance():
    """Smooth dynamics: tight tolerance over 0.5 s."""
    ours, theirs = run_pair(PENDULUM, 250, qpos0=[0.8])
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_box_drop_conformance():
    """Plane contact: resting height matches to 0.5 mm; no residual motion."""
    ours, theirs = run_pair(BOX_DROP, 300)
    # final resting pose
    np.testing.assert_allclose(ours[-1][:3], theirs[-1][:3], atol=5e-4)
    # no energy injection: last 50 substeps nearly static
    drift = np.abs(np.diff(ours[-50:, :3], axis=0)).max()
    assert drift < 1e-5


def test_box_on_box_conformance():
    """Box-box manifold: resting height matches; no chatter."""
    ours, theirs = run_pair(BOX_ON_BOX, 300)
    np.testing.assert_allclose(ours[-1][2], theirs[-1][2], atol=1.5e-3)
    drift = np.abs(np.diff(ours[-50:, 2])).max()
    assert drift < 1e-4
