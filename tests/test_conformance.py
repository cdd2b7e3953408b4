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


# ---------------------------------------------------------------------------
# Round-4 depth (VERDICT #4): env-level dactyl/reach trajectory conformance.
# MuJoCo 3 has no cymj user-gain callback, so the C engine is driven by a
# NUMPY reimplementation of the same PID (force injected via qfrc_applied
# per substep) while our engine runs its in-engine controller — this
# cross-checks both the PID semantics (physics/actuation.py) and the full
# hand dynamics on the real reach world (BASELINE config #1).
# ---------------------------------------------------------------------------


class _NumpyPid:
    """mujoco-py cymj PID (position) controller, numpy (actuation.py:85-121
    semantics; gainprm = [Kp, Ti, iMax, Td, dSmooth, deadband])."""

    def __init__(self, m, pid_ids):
        gp = np.asarray(m.actuator_gainprm, np.float64)[pid_ids]
        self.kp, self.ti, self.imax = gp[:, 0], gp[:, 1], gp[:, 2]
        self.td, self.dsmooth, self.deadband = gp[:, 3], gp[:, 4], gp[:, 5]
        n = len(pid_ids)
        self.integral = np.zeros(n)
        self.prev_err = np.zeros(n)
        self.dsm = np.zeros(n)

    def __call__(self, target, length, dt):
        error = target - length
        error = np.where(np.abs(error) < self.deadband, 0.0, error)
        self.integral += error * dt
        lim = np.where(
            self.ti > 1e-12,
            self.imax * self.ti / np.maximum(self.kp, 1e-12), 0.0,
        )
        self.integral = np.clip(self.integral, -lim, lim)
        deriv = (error - self.prev_err) / max(dt, 1e-12)
        self.dsm = self.dsmooth * self.dsm + (1.0 - self.dsmooth) * deriv
        iterm = np.where(
            self.ti > 1e-12,
            self.kp * self.integral / np.maximum(self.ti, 1e-12), 0.0,
        )
        f = self.kp * error + iterm + self.kp * self.td * self.dsm
        self.prev_err = error
        return f


def test_reach_env_conformance():
    """dactyl/reach world (BASELINE config #1, batch=1): 100 substeps of
    sinusoidal position targets must track MuJoCo 3 within 1e-4 rad.
    Contacts are disabled in both engines (the reach task is contact-free;
    hand self-collision engages only at extreme curls)."""
    import xml.etree.ElementTree as ET

    from robogym_tpu.envs.dactyl.reach import build_reach_xml
    from robogym_tpu.mjcf.model import GainType, TrnType
    from robogym_tpu.physics import tables

    xml_str = build_reach_xml().xml_string()
    m = compile_xml(xml_str, dtype=jnp.float64)
    c = m.const

    # MuJoCo 3 side: scrub 2.0-era attrs, drop actuators (no user-gain
    # callback exists there; forces arrive via qfrc_applied instead)
    root = ET.fromstring(xml_str)
    for opt in root.iter("option"):
        for bad in ("apirate", "collision", "impratio"):
            opt.attrib.pop(bad, None)
    for flag in root.iter("flag"):
        flag.attrib.pop("refsafe", None)
    for parent in root.iter():
        for child in list(parent):
            if child.tag == "actuator":
                parent.remove(child)
    mj_model = mujoco.MjModel.from_xml_string(
        ET.tostring(root, encoding="unicode")
    )
    mj_model.geom_contype[:] = 0
    mj_model.geom_conaffinity[:] = 0
    mj_data = mujoco.MjData(mj_model)

    # Dense (ntendon, nv) tendon-Jacobian rows built from the model's wrap
    # tables: mujoco 3.10 stores mjData.ten_J COMPRESSED (indexing it by
    # tendon id reads garbage — the round-4 'reach conformance failure' was
    # this harness bug feeding wrong coupled-joint forces to the C side).
    # All shadow-hand tendons are FIXED tendons, whose Jacobian row is the
    # per-joint coefficient, a model constant.
    # (Spatial tendons also exist in the hand XML; no PID actuator drives
    # them, so only FIXED-tendon rows are materialized and an actuated
    # spatial tendon would hit the zero-row assert below.)
    mj_ten_J = np.zeros((mj_model.ntendon, mj_model.nv))
    for tid in range(mj_model.ntendon):
        adr, num = mj_model.tendon_adr[tid], mj_model.tendon_num[tid]
        if not all(
            mj_model.wrap_type[w] == mujoco.mjtWrap.mjWRAP_JOINT
            for w in range(adr, adr + num)
        ):
            continue
        for w in range(adr, adr + num):
            jid = mj_model.wrap_objid[w]
            mj_ten_J[tid, mj_model.jnt_dofadr[jid]] = mj_model.wrap_prm[w]

    # our side: collisions off to match
    object.__setattr__(c, "collision_pairs", c.collision_pairs[:0])
    d = make_data(m, dtype=jnp.float64)
    mj_data.qpos[:] = np.asarray(d.qpos)
    mujoco.mj_forward(mj_model, mj_data)
    step_j = jax.jit(lambda dd: S.step(m, dd))

    # transmission mapping for the numpy driver (smooth.transmission)
    gt = np.asarray(c.actuator_gaintype)
    pid_ids = np.nonzero(gt == GainType.USER)[0]
    assert len(pid_ids) == 20, "reach hand should have 20 PID actuators"
    pid = _NumpyPid(m, pid_ids)
    gear = np.asarray(m.actuator_gear, np.float64)[pid_ids, 0]
    trntype = np.asarray(c.actuator_trntype)[pid_ids]
    trnid = np.asarray(c.actuator_trnid)[pid_ids]
    jnt_qposadr = np.asarray(c.jnt_qposadr)
    jnt_dofadr = np.asarray(c.jnt_dofadr)
    frclim = np.asarray(c.actuator_forcelimited)[pid_ids]
    frcrange = np.asarray(m.actuator_forcerange, np.float64)[pid_ids]
    ctrl_low = np.asarray(m.actuator_ctrlrange, np.float64)[:, 0]
    ctrl_high = np.asarray(m.actuator_ctrlrange, np.float64)[:, 1]
    dt = float(m.opt.timestep)

    # tendon name -> MuJoCo tendon id (ours and MuJoCo order both come
    # from the same XML, but map by name to be safe)
    mj_ten = {
        mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_TENDON, i): i
        for i in range(mj_model.ntendon)
    }
    ten_id2name = {v: k for k, v in c.names.get("tendon", {}).items()}
    ten_names = [ten_id2name[i] for i in range(c.ntendon)]

    rng = np.random.RandomState(0)
    phase = rng.uniform(0, 2 * np.pi, 20)
    ours, theirs = [], []
    for t in range(100):
        # identical sinusoidal position targets inside ctrlrange
        frac = 0.5 + 0.35 * np.sin(0.03 * t + phase)
        target = ctrl_low + frac * (ctrl_high - ctrl_low)

        # --- MuJoCo driven by the numpy PID through qfrc_applied
        mujoco.mj_forward(mj_model, mj_data)
        length = np.zeros(len(pid_ids))
        for k, (tt, ti_) in enumerate(zip(trntype, trnid)):
            if tt == TrnType.JOINT:
                length[k] = gear[k] * mj_data.qpos[jnt_qposadr[ti_]]
            else:
                mj_tid = mj_ten[ten_names[ti_]]
                length[k] = gear[k] * mj_data.ten_length[mj_tid]
        f = pid(target[pid_ids], length, dt)
        f = np.where(frclim, np.clip(f, frcrange[:, 0], frcrange[:, 1]), f)
        qfrc = np.zeros(mj_model.nv)
        for k, (tt, ti_) in enumerate(zip(trntype, trnid)):
            if tt == TrnType.JOINT:
                qfrc[jnt_dofadr[ti_]] += gear[k] * f[k]
            else:
                mj_tid = mj_ten[ten_names[ti_]]
                assert mj_ten_J[mj_tid].any(), "actuated non-fixed tendon"
                qfrc += gear[k] * f[k] * mj_ten_J[mj_tid]
        mj_data.qfrc_applied[:] = qfrc
        mujoco.mj_step(mj_model, mj_data)

        # --- our engine runs its own in-engine PID
        d = d.replace(ctrl=jnp.asarray(target, jnp.float64))
        d = step_j(d)
        ours.append(np.asarray(d.qpos))
        theirs.append(mj_data.qpos.copy())

    ours = np.stack(ours)
    theirs = np.stack(theirs)
    err = np.abs(ours - theirs).max(axis=1)
    # Documented budget (PARITY.md): while the dynamics stay smooth the two
    # engines agree to MACHINE precision (measured ~3e-11 over the first 30
    # substeps — 6 orders tighter than the old 1e-5 gate). Past that, the
    # trajectory crosses discrete-event boundaries (PID error deadband,
    # frictionloss stick-slip, joint-limit engagement) where an O(1e-11)
    # state difference flips a finite branch: one flip at ~substep 50
    # produces O(1e-2) separation that no solver-semantics tightening can
    # remove (mujoco vs itself under a different BLAS behaves the same).
    # So: tight bound on the smooth window, coarse envelope after events.
    assert err[24] < 1e-8, f"early divergence {err[24]:.2e}"
    assert err[:30].max() < 1e-8, f"smooth-window divergence {err[:30].max():.2e}"
    assert err.max() < 0.2, f"post-event envelope {err.max():.2e}"


# ---------------------------------------------------------------------------
# Round-5 depth (VERDICT #4): contact-rich trajectory conformance on the
# dactyl/locked world — the cube IN CONTACT WITH the hand, PID holding the
# reset pose, vs MuJoCo 3 at matched option/timestep settings.
# ---------------------------------------------------------------------------


def test_locked_in_hand_conformance():
    """Cube-in-hand contact tracking vs MuJoCo 3 under a pose-hold PID.

    Budget (measured, documented in PARITY.md): the engines' contact
    manifolds differ by construction (our fixed 4-slot hull manifolds vs
    MuJoCo 3's mesh narrowphase), so divergence starts at the first
    substep (~1e-3 rad on fingers in contact) instead of machine epsilon.
    What must hold is that the CUBE — the physically meaningful object —
    stays put the same way: ≤2.5 mm cube-position divergence after 10
    substeps, ≤8 mm at any point over 150 substeps, and no fall in either
    engine. Reference world semantics:
    /root/reference/robogym/envs/dactyl/locked.py:36-305."""
    import xml.etree.ElementTree as ET

    from robogym_tpu.envs.dactyl import locked as locked_lib
    from robogym_tpu.envs.dactyl.cube_env import build_cube_world_xml
    from robogym_tpu.mjcf.model import GainType, TrnType

    env = locked_lib.make_env(dict(mujoco_substeps=10), dtype=jnp.float64)
    m = env.model
    c = m.const
    state, _ = jax.jit(env.reset)(jax.random.key(0))
    d0 = state.physics

    xml_str = build_cube_world_xml("rubik/rubik_locked.xml").xml_string()
    root = ET.fromstring(xml_str)
    for opt in root.iter("option"):
        for bad in ("apirate", "collision", "impratio"):
            opt.attrib.pop(bad, None)
    for flag in root.iter("flag"):
        flag.attrib.pop("refsafe", None)
    for inert in root.iter("inertial"):
        if "fullinertia" in inert.attrib:
            inert.attrib.pop("quat", None)
    for parent in root.iter():
        for child in list(parent):
            if child.tag == "actuator":
                parent.remove(child)
    mj_model = mujoco.MjModel.from_xml_string(
        ET.tostring(root, encoding="unicode")
    )
    mj_data = mujoco.MjData(mj_model)
    mj_model.opt.timestep = float(m.opt.timestep)
    for jname, jid in c.names["joint"].items():
        mj_j = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_JOINT, jname)
        assert mj_j >= 0 and int(mj_model.jnt_qposadr[mj_j]) == int(
            np.asarray(c.jnt_qposadr)[jid]
        ), jname
    mj_data.qpos[:] = np.asarray(d0.qpos)
    mj_data.qvel[:] = np.asarray(d0.qvel)
    mujoco.mj_forward(mj_model, mj_data)

    gt = np.asarray(c.actuator_gaintype)
    pid_ids = np.nonzero(gt == GainType.USER)[0]
    pid = _NumpyPid(m, pid_ids)
    gear = np.asarray(m.actuator_gear, np.float64)[pid_ids, 0]
    trntype = np.asarray(c.actuator_trntype)[pid_ids]
    trnid = np.asarray(c.actuator_trnid)[pid_ids]
    jnt_qposadr = np.asarray(c.jnt_qposadr)
    jnt_dofadr = np.asarray(c.jnt_dofadr)
    frclim = np.asarray(c.actuator_forcelimited)[pid_ids]
    frcrange = np.asarray(m.actuator_forcerange, np.float64)[pid_ids]
    dt = float(m.opt.timestep)
    mj_ten = {
        mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_TENDON, i): i
        for i in range(mj_model.ntendon)
    }
    t2n = {v: k for k, v in c.names.get("tendon", {}).items()}
    ten_names = [t2n[i] for i in range(c.ntendon)]
    mj_ten_J = np.zeros((mj_model.ntendon, mj_model.nv))
    for tid in range(mj_model.ntendon):
        adr, num = mj_model.tendon_adr[tid], mj_model.tendon_num[tid]
        if all(
            mj_model.wrap_type[w] == mujoco.mjtWrap.mjWRAP_JOINT
            for w in range(adr, adr + num)
        ):
            for w in range(adr, adr + num):
                jid = mj_model.wrap_objid[w]
                mj_ten_J[tid, mj_model.jnt_dofadr[jid]] = mj_model.wrap_prm[w]

    hold = np.zeros(c.nu)
    for k, (tt, ti_) in enumerate(
        zip(np.asarray(c.actuator_trntype), np.asarray(c.actuator_trnid))
    ):
        if tt == TrnType.JOINT:
            hold[k] = np.asarray(d0.qpos)[jnt_qposadr[ti_]]
        else:
            hold[k] = np.asarray(d0.ten_length)[ti_]
    cube_q = [
        np.asarray(c.jnt_qposadr)[c.names["joint"][f"cube:cube_t{a}"]]
        for a in "xyz"
    ]

    step_j = jax.jit(lambda dd: S.step(m, dd))
    d = d0.replace(ctrl=jnp.asarray(hold, jnp.float64))
    cube_err = []
    for t in range(150):
        mujoco.mj_forward(mj_model, mj_data)
        length = np.zeros(len(pid_ids))
        for k, (tt, ti_) in enumerate(zip(trntype, trnid)):
            if tt == TrnType.JOINT:
                length[k] = gear[k] * mj_data.qpos[jnt_qposadr[ti_]]
            else:
                length[k] = gear[k] * mj_data.ten_length[
                    mj_ten[ten_names[ti_]]
                ]
        f = pid(hold[pid_ids], length, dt)
        f = np.where(frclim, np.clip(f, frcrange[:, 0], frcrange[:, 1]), f)
        qfrc = np.zeros(mj_model.nv)
        for k, (tt, ti_) in enumerate(zip(trntype, trnid)):
            if tt == TrnType.JOINT:
                qfrc[jnt_dofadr[ti_]] += gear[k] * f[k]
            else:
                qfrc += gear[k] * f[k] * mj_ten_J[mj_ten[ten_names[ti_]]]
        mj_data.qfrc_applied[:] = qfrc
        mujoco.mj_step(mj_model, mj_data)
        d = step_j(d)
        cube_err.append(
            np.abs(np.asarray(d.qpos)[cube_q] - mj_data.qpos[cube_q]).max()
        )
    cube_err = np.asarray(cube_err)
    assert cube_err[9] < 2.5e-3, f"10-substep cube divergence {cube_err[9]:.2e}"
    assert cube_err.max() < 8e-3, f"peak cube divergence {cube_err.max():.2e}"
    # neither engine drops the cube (z stays near the palm in both)
    z_ours = float(np.asarray(d.qpos)[cube_q[2]])
    z_mj = float(mj_data.qpos[cube_q[2]])
    assert abs(z_ours) < 0.1 and abs(z_mj) < 0.1, (z_ours, z_mj)
