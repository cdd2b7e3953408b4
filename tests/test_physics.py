"""Physics engine correctness tests (smooth dynamics, contacts, limits).

These are the TPU-build analogues of the reference's behavioral physics
tests (e.g. /root/reference/robogym/robot/shadow_hand/test/test_mujoco_hand.py,
mujoco/test/test_mujoco_utils.py): analytic cross-checks plus vmap/jit
equivalence, run on CPU in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogym_tpu.mjcf.compiler import compile_xml
from robogym_tpu.mjcf.model import make_data
import robogym_tpu.physics.step as S
from robogym_tpu.physics import smooth

PENDULUM = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.001" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" pos="0 0 0" damping="0"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0 0 -0.5" size="0.02"
            density="1000" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""

BALL_BOX = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="1 1 1" pos="0 0 0"/>
    <body name="ball" pos="0 0 0.2">
      <freejoint name="ball_j"/>
      <geom name="ball" type="sphere" size="0.05" density="1000"/>
    </body>
    <body name="box" pos="0.5 0 0.1">
      <freejoint name="box_j"/>
      <geom name="box" type="box" size="0.04 0.04 0.04" density="500"/>
    </body>
  </worldbody>
</mujoco>
"""

LIMITED = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.001" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" pos="0 0 0" damping="0.01"
             limited="true" range="-0.3 0.3"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0 0 -0.3" size="0.02"
            density="1000" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def pendulum():
    m = compile_xml(PENDULUM, dtype=jnp.float64)
    return m, make_data(m, dtype=jnp.float64)


def test_pendulum_analytic_qacc(pendulum):
    m, d = pendulum
    d = d.replace(qpos=jnp.asarray([0.1]))
    d = S.forward(m, d)
    mass = float(m.body_mass[1])
    Ipiv = float(d.qM[0, 0])
    expected = -mass * 9.81 * 0.25 * np.sin(0.1) / Ipiv
    assert np.isclose(float(d.qacc[0]), expected, rtol=1e-9)


def test_pendulum_energy_conservation(pendulum):
    m, d = pendulum
    d = d.replace(qpos=jnp.asarray([0.5]))
    stepper = jax.jit(lambda d: S.step_n(m, d, 500))

    def energy(d):
        d = S.forward(m, d)
        mass = float(m.body_mass[1])
        zcom = float(d.xipos[1, 2])
        ke = 0.5 * float(d.qvel @ (d.qM @ d.qvel))
        return ke + mass * 9.81 * zcom

    e0 = energy(d)
    for _ in range(4):
        d = stepper(d)
    e1 = energy(d)
    assert abs(e1 - e0) < 2e-3 * abs(e0) + 1e-5


def test_ball_and_box_rest_on_plane():
    m = compile_xml(BALL_BOX, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    stepper = jax.jit(lambda d: S.step_n(m, d, 100))
    for _ in range(8):
        d = stepper(d)
    q = np.asarray(d.qpos)
    assert abs(q[2] - 0.05) < 2e-3, f"ball rest height {q[2]}"
    assert abs(q[9] - 0.04) < 2e-3, f"box rest height {q[9]}"
    # box stays upright
    assert abs(q[10]) > 0.999
    # velocities died out
    assert np.all(np.abs(np.asarray(d.qvel)) < 0.05)


def test_contact_normal_force_balances_gravity():
    m = compile_xml(BALL_BOX, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    stepper = jax.jit(lambda d: S.step_n(m, d, 400))
    d = stepper(d)
    d = S.forward(m, d)
    fz = np.asarray(d.efc_force_contact)
    total_up = fz[fz > 0].sum()
    weight = float((m.body_mass[1] + m.body_mass[2]) * 9.81)
    assert abs(total_up - weight) / weight < 0.1, (total_up, weight)


def test_joint_limit_enforced():
    m = compile_xml(LIMITED, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    d = d.replace(qvel=jnp.asarray([5.0]))  # fling into the limit
    stepper = jax.jit(lambda d: S.step_n(m, d, 200))
    maxq = 0.0
    for _ in range(5):
        d = stepper(d)
        maxq = max(maxq, abs(float(d.qpos[0])))
    assert maxq < 0.35, f"limit overshoot: {maxq}"


def test_vmap_matches_single():
    m = compile_xml(BALL_BOX, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    # batch of 4 with different initial heights
    qpos_b = jnp.tile(d.qpos[None], (4, 1))
    qpos_b = qpos_b.at[:, 2].set(jnp.asarray([0.2, 0.25, 0.3, 0.35]))
    d_b = jax.vmap(lambda q: d.replace(qpos=q))(qpos_b)
    step_b = jax.jit(jax.vmap(lambda d: S.step_n(m, d, 50)))
    out_b = step_b(d_b)
    # env 0 must match the single-env run exactly
    d0 = jax.jit(lambda d: S.step_n(m, d, 50))(d.replace(qpos=qpos_b[0]))
    np.testing.assert_allclose(
        np.asarray(out_b.qpos[0]), np.asarray(d0.qpos), atol=1e-12
    )
    # different initial conditions diverge
    assert not np.allclose(np.asarray(out_b.qpos[1]), np.asarray(out_b.qpos[0]))


def test_free_fall_accuracy():
    m = compile_xml(BALL_BOX, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    # 0.1 s of free fall before any contact: z = z0 - g t^2 / 2
    stepper = jax.jit(lambda d: S.step_n(m, d, 50))
    d = stepper(d)
    t = float(d.time)
    # semi-implicit Euler: z = z0 - g*dt^2*(n(n+1)/2)
    n = 50
    dt = 0.002
    expected = 0.2 - 9.81 * dt * dt * n * (n + 1) / 2
    assert abs(float(d.qpos[2]) - expected) < 1e-10


def test_bounding_capsule_covers_box_corners():
    """Broadphase bounding capsules must cover every box corner, including
    for TIED box dimensions (a cube): averaging tied longest-axis one-hots
    produced a non-unit axis whose capsule missed the far corners
    (round-4 advisor finding, collision/driver.py geom_capsules)."""
    from robogym_tpu.physics.collision import driver

    xml = """
    <mujoco>
      <compiler angle="radian"/>
      <worldbody>
        <body name="cube" pos="0 0 1" euler="0.3 0.5 0.7">
          <freejoint/>
          <geom name="cube" type="box" size="0.05 0.05 0.05" density="1000"/>
        </body>
        <body name="slab" pos="1 0 1">
          <freejoint/>
          <geom name="slab" type="box" size="0.05 0.05 0.02" density="1000"/>
        </body>
        <body name="tall" pos="2 0 1">
          <freejoint/>
          <geom name="tall" type="box" size="0.02 0.05 0.05" density="1000"/>
        </body>
      </worldbody>
    </mujoco>
    """
    m = compile_xml(xml, dtype=jnp.float64)
    d = S.fwd_position(m, make_data(m, dtype=jnp.float64))
    a, b, r = driver.geom_capsules(m, d)
    a, b, r = np.asarray(a), np.asarray(b), np.asarray(r)
    s = np.asarray(m.geom_size)
    xp = np.asarray(d.geom_xpos)
    xm = np.asarray(d.geom_xmat)
    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    )
    for g in range(int(m.const.ngeom)):
        corners = xp[g] + (signs * s[g]) @ xm[g].T          # (8, 3)
        seg = b[g] - a[g]
        L2 = max(float(seg @ seg), 1e-16)
        t = np.clip(((corners - a[g]) @ seg) / L2, 0.0, 1.0)
        closest = a[g] + t[:, None] * seg
        dist = np.linalg.norm(corners - closest, axis=-1)
        assert (dist <= r[g] + 1e-9).all(), (g, dist.max(), r[g])
