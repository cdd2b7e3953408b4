"""Per-phase physics profiler: times each pipeline stage in isolation.

Produces the profile breakdown demanded alongside BENCH numbers: how much of
one substep goes to kinematics / com / CRB / tendons / collision / velocity /
actuation / constraint-solve / integrate, vmapped over the bench batch on the
real chip.

Each phase is jitted separately (vmapped over batch) and timed over repeated
calls on a representative mid-episode state. Phase boundaries mirror
robogym_tpu/physics/step.py::forward. Output: PROFILE.md-ready table + JSON.

Usage: python scripts/profile_phases.py [--env locked] [--batch 1024] [--reps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from robogym_tpu.physics import actuation as actuation_lib
from robogym_tpu.physics import constraint as constraint_lib
from robogym_tpu.physics import smooth
from robogym_tpu.physics import step as step_lib
from robogym_tpu.physics.collision import driver as collision_driver


def build(name):
    if name == "blocks":
        from robogym_tpu.envs.rearrange.blocks import make_env

        env = make_env(dict(), dict(simulation_params=dict(num_objects=5)),
                       dtype=jnp.float32)
    elif name == "reach":
        from robogym_tpu.envs.dactyl.reach import make_env

        env = make_env(dict(goal_stabilize_steps=0), dtype=jnp.float32)
    else:
        from robogym_tpu.envs.dactyl.locked import make_env

        env = make_env(dtype=jnp.float32)
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="locked")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--inner", type=int, default=5,
                    help="phase applications per timed call (scan) to amortize dispatch")
    args = ap.parse_args()

    env = build(args.env)
    m = env.model
    B = args.batch

    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    # advance a few env steps so contacts and velocities are representative
    def adv(state, key):
        acts = jax.random.uniform(key, (B, env.action_size), minval=-1, maxval=1)
        state, *_ = jax.vmap(env.step)(state, acts)
        return state
    adv_j = jax.jit(adv)
    for i in range(3):
        state = adv_j(state, jax.random.key(i + 1))
    d0 = state.physics
    jax.block_until_ready(d0.qpos)

    mb = state.model if hasattr(state, "model") else None

    def phase_full(d):
        return step_lib.step(m, d)

    def ph_kinematics(d):
        return smooth.kinematics(m, d)

    def ph_com_pos(d):
        return smooth.com_pos(m, d)

    def ph_crb(d):
        return smooth.crb(m, d)

    def ph_tendon(d):
        return smooth.tendon(m, d)

    def ph_collision(d):
        return collision_driver.collision(m, d)

    def ph_velocity(d):
        d, cdofdot = smooth.com_vel(m, d)
        return smooth.rne(m, d, cdofdot)

    def ph_act_passive(d):
        d, moment = smooth.transmission(m, d)
        d = actuation_lib.actuation(m, d, moment)
        return smooth.passive(m, d)

    def ph_constraint(d):
        qfrc_smooth = (
            d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied - d.qfrc_bias
        )
        qacc_smooth = smooth.solve_m(d, qfrc_smooth)
        d = d.replace(qacc_smooth=qacc_smooth)
        return constraint_lib.solve(m, d, qfrc_smooth)

    def ph_euler(d):
        return step_lib.euler(m, d)

    phases = [
        ("kinematics", ph_kinematics),
        ("com_pos", ph_com_pos),
        ("crb_factor", ph_crb),
        ("tendon", ph_tendon),
        ("collision", ph_collision),
        ("velocity_rne", ph_velocity),
        ("act_passive", ph_act_passive),
        ("constraint", ph_constraint),
        ("euler_integrate", ph_euler),
        ("FULL_SUBSTEP", phase_full),
    ]

    results = {}
    for name, fn in phases:
        def scan_fn(d, fn=fn):
            def body(carry, _):
                out = fn(carry)
                # keep pytree type stable for scan when fn returns Data
                return out, ()
            out, _ = jax.lax.scan(body, d, None, length=args.inner)
            return out
        f = jax.jit(jax.vmap(scan_fn))
        try:
            out = f(d0)
            jax.block_until_ready(out.qpos)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = f(d0)
            jax.block_until_ready(out.qpos)
            dt = (time.perf_counter() - t0) / (args.reps * args.inner)
            results[name] = dt
            print(f"{name:18s} {dt*1e3:9.3f} ms/substep-call  "
                  f"({B / dt:12.0f} substep-calls*envs/s)", flush=True)
        except Exception as e:  # noqa
            print(f"{name:18s} FAILED: {e}", flush=True)
            results[name] = None

    full = results.get("FULL_SUBSTEP")
    print()
    if full:
        print(f"{'phase':18s} {'ms':>9s} {'% of sum':>9s}")
        ssum = sum(v for k, v in results.items() if v and k != "FULL_SUBSTEP")
        for k, v in results.items():
            if v is None or k == "FULL_SUBSTEP":
                continue
            print(f"{k:18s} {v*1e3:9.3f} {100*v/ssum:8.1f}%")
        print(f"{'sum(phases)':18s} {ssum*1e3:9.3f}")
        print(f"{'full substep':18s} {full*1e3:9.3f}")
        nsub = getattr(env, "nsubsteps", 10)
        print(f"implied env-steps/s @ B={B}, nsubsteps={nsub}: "
              f"{B / (full * nsub):.0f}")
    with open("/tmp/profile_phases.json", "w") as fh:
        json.dump({k: v for k, v in results.items()}, fh)


if __name__ == "__main__":
    main()
