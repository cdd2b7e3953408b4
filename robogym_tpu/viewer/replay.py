"""Viewer / replay layer (TPU build).

The reference viewer stack (GLFW windows:
/root/reference/robogym/viewer/env_viewer.py:13-168,
robot_control_viewer.py:18-130) has no display on a TPU host. The TPU-native
replacement renders recorded or live qpos trajectories offscreen — through
the MuJoCo 3 python bindings when GL is available, or through the built-in
analytic raycaster (render/raycast.py) on GL-less hosts — from the env's
own Model. Frames come back as numpy images for notebooks, videos, or disk.

  * `render_trajectory(env, qpos_traj)` -> (T, H, W, 3) uint8 frames
  * `EnvReplayViewer(env).run(n_steps)` — examine-style live loop that
    steps the jitted env and renders each frame
  * `scripts/examine.py --record` produces the .npz these consume
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional, Sequence

import numpy as np


def _scrub_mj2_attrs(xml_str: str) -> str:
    """Strip MuJoCo-2.0-era attrs MuJoCo 3's schema rejects (same scrub the
    conformance harness applies)."""
    root = ET.fromstring(xml_str)
    for opt in root.iter("option"):
        for bad in ("apirate", "collision", "impratio"):
            opt.attrib.pop(bad, None)
    for inert in root.iter("inertial"):
        # mj3 rejects fullinertia + orientation together; rendering only
        # needs kinematics, so keep the diagonal
        if "fullinertia" in inert.attrib and (
            "quat" in inert.attrib or "euler" in inert.attrib
        ):
            full = inert.attrib.pop("fullinertia").split()
            inert.set("diaginertia", " ".join(full[:3]))
    for parent in root.iter():
        for act in list(parent):
            if act.tag == "actuator":
                # user-gain PID actuators need a callback mj3 doesn't have;
                # rendering only needs kinematics
                parent.remove(act)
    return ET.tostring(root, encoding="unicode")


def _mj_model_for(env):
    import mujoco

    xml_str = getattr(env.model.const, "_source_xml", None)
    assert xml_str, "env model has no stashed source XML"
    return mujoco.MjModel.from_xml_string(_scrub_mj2_attrs(xml_str))


def render_trajectory(
    env,
    qpos_traj: np.ndarray,
    width: int = 320,
    height: int = 240,
    camera: Optional[str] = None,
    backend: str = "auto",
) -> np.ndarray:
    """Render a (T, nq) qpos trajectory to (T, H, W, 3) uint8 frames.

    backend: "mujoco" (GL offscreen, needs EGL/OSMesa), "raycast" (the
    on-device analytic renderer, render/raycast.py — works on GL-less
    hosts like this one), or "auto" (mujoco if GL is available, else
    raycast)."""
    if backend == "raycast":
        return _render_trajectory_raycast(env, qpos_traj, width, height,
                                          camera)
    if backend == "auto":
        try:
            return _render_trajectory_mujoco(env, qpos_traj, width, height,
                                             camera)
        except Exception:
            return _render_trajectory_raycast(env, qpos_traj, width, height,
                                              camera)
    return _render_trajectory_mujoco(env, qpos_traj, width, height, camera)


def _render_trajectory_raycast(env, qpos_traj, width, height,
                               camera) -> np.ndarray:
    """GL-free path: forward kinematics + render/raycast.py per frame.
    Uses the named <camera> if given, camera 0 if compiled in, else a free
    look-at camera framing the scene's geom bbox."""
    import jax
    import jax.numpy as jnp

    from robogym_tpu.mjcf.model import make_data
    from robogym_tpu.physics import step as phys
    from robogym_tpu.render import raycast

    m = env.model
    d0 = make_data(m, dtype=jnp.float32)

    if camera is not None:
        cam = raycast.camera_id(m, camera)
        fn = lambda d: raycast.render_uint8(m, d, cam, height, width)
    elif m.const.ncam > 0:
        fn = lambda d: raycast.render_uint8(m, d, 0, height, width)
    else:
        d_probe = phys.fwd_position(
            m, d0.replace(qpos=jnp.asarray(qpos_traj[0], jnp.float32))
        )
        gp = np.asarray(d_probe.geom_xpos)
        center = gp.mean(axis=0)
        radius = float(np.linalg.norm(gp - center, axis=1).max()) + 0.3
        eye = center + np.asarray([radius, -radius, 0.8 * radius])
        cpos, cmat = raycast.lookat_pose(eye, center)

        def fn(d):
            return (jnp.clip(
                raycast.render_rgb_pose(m, d, cpos, cmat, 45.0, height,
                                        width), 0.0, 1.0
            ) * 255.0 + 0.5).astype(jnp.uint8)

    render = jax.jit(lambda q: fn(
        phys.fwd_position(m, d0.replace(qpos=q))
    ))
    frames = [
        np.asarray(render(jnp.asarray(q, jnp.float32)))
        for q in np.asarray(qpos_traj)
    ]
    return np.stack(frames)


def _render_trajectory_mujoco(
    env,
    qpos_traj: np.ndarray,
    width: int = 320,
    height: int = 240,
    camera: Optional[str] = None,
) -> np.ndarray:
    """MuJoCo 3 offscreen renderer path (requires GL)."""
    import mujoco

    mj_model = _mj_model_for(env)
    mj_data = mujoco.MjData(mj_model)
    renderer = mujoco.Renderer(mj_model, height=height, width=width)
    frames = []
    cam = camera if camera is not None else -1
    for q in np.asarray(qpos_traj):
        mj_data.qpos[: mj_model.nq] = q[: mj_model.nq]
        mujoco.mj_forward(mj_model, mj_data)
        renderer.update_scene(mj_data, camera=cam)
        frames.append(renderer.render().copy())
    renderer.close()
    return np.stack(frames)


def replay_npz(env, npz_path: str, **kw) -> np.ndarray:
    """Render a `scripts/examine.py --record` qpos dump."""
    data = np.load(npz_path)
    return render_trajectory(env, data["qpos"], **kw)


class EnvReplayViewer:
    """examine-style loop: step the jitted env with a policy (default:
    random actions) and render each env step (env_viewer.py:122-141
    analogue, offscreen)."""

    def __init__(self, env, width: int = 320, height: int = 240):
        self.env = env
        self.width = width
        self.height = height

    def run(self, n_steps: int = 50, seed: int = 0,
            policy=None) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        env = self.env
        reset = jax.jit(env.reset)
        step = jax.jit(env.step)
        state, obs = reset(jax.random.key(seed))
        key = jax.random.key(seed + 1)
        traj = [np.asarray(state.physics.qpos)]
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            if policy is None:
                action = jax.random.uniform(
                    k, (env.action_size,), minval=-1.0, maxval=1.0
                )
            else:
                action = jnp.asarray(policy(obs))
            state, obs, reward, done, info = step(state, action)
            traj.append(np.asarray(state.physics.qpos))
        return render_trajectory(
            env, np.stack(traj), width=self.width, height=self.height
        )
