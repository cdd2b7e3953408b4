"""Terminal-interactive env viewer (curses) — the live keyboard loop.

The reference viewers are GLFW windows with per-key actuator control and
teleop (/root/reference/robogym/viewer/env_viewer.py:13-168,
robot_control_viewer.py:18-130); this container has no GL, so the TPU build
drives the same loop in a curses TUI: single-keystroke control, the env
stepped live at a fixed cadence with the currently-held action, and a status
pane (reward triple, goal distance, tracker stats, action vector). Key
bindings mirror the reference:

Env mode (EnvViewer semantics):
  j / k   move the selected action dimension        (env_viewer.py:92-95)
  a / z   selected action -= / += 0.05              (env_viewer.py:77-90)
  n / p   seed +1 / -1 then reset                   (env_viewer.py:61-75)
  g       resample goal (falls back to reset when the env has no
          host-side goal resample)                  (env_viewer.py:66-68)
  0       zero the action
  q / ESC quit

Teleop mode (--teleop; RobotControlViewer semantics, sticky keys replaced
by one-step impulses since terminals have no key-release events):
  arrows  +-x / +-y TCP moves     z / x   z up/down
  c / v   gripper close/open      w / e   wrist rotate (GLFW Q is quit here)
  y / u   gripper tilt            - / =   speed down/up
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class InteractiveViewer:
    """Curses live loop over a functional env (jit reset/step on host)."""

    def __init__(self, env, seed: int = 0, teleop: bool = False,
                 rate_hz: float = 10.0):
        self.env = env
        self.seed = seed
        self.teleop = teleop
        self.period = 1.0 / rate_hz
        self.action = np.zeros(env.action_size)
        self.action_index = 0
        self.status = ""
        if teleop:
            from robogym_tpu.robot.teleop import URGripperArmController

            self.controller = URGripperArmController(env)

    # -- env plumbing -------------------------------------------------------
    def _build(self):
        import jax

        self._reset = jax.jit(self.env.reset)
        self._step = jax.jit(self.env.step)

    def _do_reset(self):
        import jax

        self.state, self.obs = self._reset(jax.random.key(self.seed))
        self.reward = np.zeros(3)
        self.done = False
        self.info = {}
        self.action[:] = 0.0

    def _resample_goal(self):
        """EnvViewer 'G': new goal mid-episode. Functional envs resample
        goals inside step on success; for the viewer, re-reset with a
        bumped key is the honest host-side equivalent unless the env
        exposes `reset_goal(state, key)`."""
        import jax

        if hasattr(self.env, "reset_goal"):
            self.state = self.env.reset_goal(
                self.state, jax.random.key(self.seed + 991)
            )
        else:
            self.seed += 991
            self._do_reset()

    # -- key handling -------------------------------------------------------
    def _handle_env_key(self, ch) -> Optional[str]:
        import curses

        n = self.env.action_size
        if ch in (ord("q"), 27):
            return "quit"
        if ch == ord("k"):
            self.action_index = (self.action_index + 1) % n
        elif ch == ord("j"):
            self.action_index = (self.action_index - 1) % n
        elif ch == ord("a"):
            self.action[self.action_index] = max(
                -1.0, self.action[self.action_index] - 0.05
            )
        elif ch == ord("z"):
            self.action[self.action_index] = min(
                1.0, self.action[self.action_index] + 0.05
            )
        elif ch == ord("n"):
            self.seed += 1
            self._do_reset()
        elif ch == ord("p"):
            self.seed = max(self.seed - 1, 0)
            self._do_reset()
        elif ch == ord("g"):
            self._resample_goal()
        elif ch == ord("0"):
            self.action[:] = 0.0
        _ = curses
        return None

    def _handle_teleop_key(self, ch) -> Optional[str]:
        import curses

        c = self.controller
        keymap = {
            curses.KEY_UP: lambda: c.move_x(-1),
            curses.KEY_DOWN: lambda: c.move_x(+1),
            curses.KEY_LEFT: lambda: c.move_y(-1),
            curses.KEY_RIGHT: lambda: c.move_y(+1),
            ord("z"): lambda: c.move_z(+1),
            ord("x"): lambda: c.move_z(-1),
            ord("c"): lambda: c.move_gripper(+1),
            ord("v"): lambda: c.move_gripper(-1),
            ord("w"): lambda: c.rotate_wrist(+1),
            ord("e"): lambda: c.rotate_wrist(-1),
            ord("y"): lambda: c.tilt_gripper(+1),
            ord("u"): lambda: c.tilt_gripper(-1),
        }
        if ch in (ord("q"), 27):
            return "quit"
        if ch == ord("-"):
            c.speed_down()
        elif ch == ord("="):
            c.speed_up()
        elif ch == ord("n"):
            self.seed += 1
            self._do_reset()
        elif ch in keymap:
            self.action = np.asarray(keymap[ch]())
        else:
            # terminals deliver no key-release: actions are one-step
            # impulses, decayed back to zero each tick below
            pass
        return None

    # -- main loop ----------------------------------------------------------
    def run(self, max_steps: Optional[int] = None):
        import curses

        self._build()
        self._do_reset()

        def loop(scr):
            import jax.numpy as jnp

            curses.curs_set(0)
            scr.nodelay(True)
            steps = 0
            last = time.time()
            sps = 0.0
            while max_steps is None or steps < max_steps:
                ch = scr.getch()
                if ch != -1:
                    handler = (
                        self._handle_teleop_key if self.teleop
                        else self._handle_env_key
                    )
                    if handler(ch) == "quit":
                        return
                t0 = time.time()
                self.state, self.obs, reward, done, self.info = self._step(
                    self.state, jnp.asarray(self.action)
                )
                self.reward = np.asarray(reward)
                self.done = bool(done)
                steps += 1
                now = time.time()
                sps = 0.9 * sps + 0.1 / max(now - t0, 1e-9)
                if self.done:
                    self._do_reset()
                if self.teleop:
                    self.action = 0.0 * self.action  # impulse decay

                self._draw(scr, steps, sps)
                dt = self.period - (time.time() - last)
                if dt > 0:
                    time.sleep(dt)
                last = time.time()

        curses.wrapper(loop)

    def _draw(self, scr, steps, sps):
        scr.erase()
        mode = "TELEOP" if self.teleop else "ENV"
        scr.addstr(0, 0, f"[{mode}] {type(self.env).__name__}  "
                         f"seed={self.seed} step={steps} {sps:5.1f} sps")
        scr.addstr(1, 0, f"reward [env goal success] = "
                         f"{np.array2string(self.reward, precision=3)}")
        row = 2
        for k in ("goal_dist", "successes_so_far", "trial_success",
                  "is_successful", "steps_since_success"):
            if k in self.info:
                scr.addstr(row, 0, f"{k} = "
                           f"{np.array2string(np.asarray(self.info[k]), precision=3)}"[:78])
                row += 1
        acts = np.array2string(self.action, precision=2,
                               max_line_width=76)[:300]
        for i, line in enumerate(acts.splitlines()):
            scr.addstr(row + i, 0, ("action " if i == 0 else "       ") + line)
        row += len(acts.splitlines())
        if not self.teleop:
            scr.addstr(row, 0, f"selected dim: {self.action_index} "
                               f"(j/k move, a/z adjust, n/p seed, g goal, q quit)")
        else:
            scr.addstr(row, 0, "arrows/z/x/c/v/w/e/y/u move | -/= speed | "
                               "n reset | q quit")
        # a few observation scalars
        row += 1
        shown = 0
        for k in sorted(self.obs):
            v = np.asarray(self.obs[k]).ravel()
            if v.size <= 6 and shown < 6:
                scr.addstr(row + shown, 0,
                           f"obs[{k}] = "
                           f"{np.array2string(v, precision=3)}"[:78])
                shown += 1
        scr.refresh()
