"""Validate the fat-CG-kernel routing for BIG constraint systems on TPU.

Round-5 change: `fused_full_fits_vmem` is lane-aware, so rearrange/Rubik
worlds (E~360, nv~56+) now take the fused Pallas path instead of the
vmapped XLA scan. This script steps one big env a few times on the real
chip with the fused path ON and OFF (ROBOGYM_TPU_NO_PALLAS) and reports
max |qpos| divergence plus per-path wall time — run before trusting a
bench number from the new route.

Usage: python scripts/check_fused_big.py [blocks|ycb|full_perp] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def build(name):
    if name == "blocks":
        from robogym_tpu.envs.rearrange.blocks import make_env

        return make_env(
            dict(), dict(simulation_params=dict(num_objects=5)),
            dtype=jnp.float32,
        )
    if name == "ycb":
        from robogym_tpu.envs.rearrange.mesh import make_env

        return make_env(
            dict(),
            dict(simulation_params=dict(num_objects=3, max_num_objects=3)),
            dtype=jnp.float32,
        )
    from robogym_tpu.envs.dactyl.full_perpendicular import make_env

    return make_env(dict(goal_generation="face_free"), dtype=jnp.float32)


def run(env, B, n_steps, seed=0):
    keys = jax.random.split(jax.random.key(seed), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)

    def body(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (B, env.action_size), minval=-1.0,
                               maxval=1.0)
        state, obs, reward, done, info = jax.vmap(env.step)(state, a)
        return (state, key), reward.sum()

    def rollout(state, key):
        (state, _), rews = jax.lax.scan(body, (state, key), None,
                                        length=n_steps)
        return state, rews.sum()

    rj = jax.jit(rollout)
    state, _ = rj(state, jax.random.key(1))
    jax.block_until_ready(state.physics.qpos)
    t0 = time.perf_counter()
    state2, rsum = rj(state, jax.random.key(2))
    jax.block_until_ready((state2, rsum))
    dt = time.perf_counter() - t0
    return state2.physics.qpos, float(rsum), dt


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "blocks"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_steps = 5
    env = build(name)

    qpos_f, r_f, dt_f = run(env, B, n_steps)
    os.environ["ROBOGYM_TPU_NO_PALLAS"] = "1"
    # the routing flag is read at TRACE time: rebuild the jits fresh
    jax.clear_caches()
    qpos_x, r_x, dt_x = run(env, B, n_steps)
    del os.environ["ROBOGYM_TPU_NO_PALLAS"]

    div = float(jnp.max(jnp.abs(qpos_f - qpos_x)))
    print(
        f"{name} B={B}: fused {B * n_steps / dt_f:.0f} steps/s, "
        f"xla {B * n_steps / dt_x:.0f} steps/s "
        f"(speedup {dt_x / dt_f:.2f}x), max|dqpos|={div:.2e}, "
        f"rew fused={r_f:.4f} xla={r_x:.4f}"
    )


if __name__ == "__main__":
    main()
