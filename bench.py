"""Throughput benchmark: batched env steps per second on the flagship config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "env-steps/s", "vs_baseline": N}

Flagship config = dactyl/locked (BASELINE.md north star: >=1M env-steps/s
aggregate at 4096 envs/chip on a v5p-8, i.e. 125k/chip). vs_baseline
reports value / (125_000 * n_local_chips). Select the env with BENCH_ENV
(locked | reach | blocks), batch with BENCH_BATCH, steps with BENCH_STEPS.
"""

import json
import sys
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the heavy physics compiles are reused across
# bench runs / rounds
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def build_env(name: str):
    if name == "reach":
        from robogym_tpu.envs.dactyl.reach import make_env

        return make_env(dict(goal_stabilize_steps=0), dtype=jnp.float32)
    if name == "blocks":
        from robogym_tpu.envs.rearrange.blocks import make_env

        return make_env(
            dict(), dict(simulation_params=dict(num_objects=5)),
            dtype=jnp.float32,
        )
    if name == "ycb":
        from robogym_tpu.envs.rearrange.mesh import make_env

        return make_env(
            dict(), dict(simulation_params=dict(num_objects=3,
                                                max_num_objects=3)),
            dtype=jnp.float32,
        )
    if name == "full_perp":
        # BASELINE config #4: Rubik's cube, 6 driver DoF + 20 cubelets
        from robogym_tpu.envs.dactyl.full_perpendicular import make_env

        return make_env(
            dict(goal_generation="face_free"), dtype=jnp.float32
        )
    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(dtype=jnp.float32)
    if os.environ.get("BENCH_WRAPPED"):
        # headline number including the full default wrapper-stack cost
        from robogym_tpu import wrappers as W

        env = W.apply_dactyl_wrappers(env, randomize=True)
    return env


def main():
    name = os.environ.get("BENCH_ENV", "locked")
    B = int(os.environ.get("BENCH_BATCH", 1024))
    N_STEPS = int(os.environ.get("BENCH_STEPS", 20))

    env = build_env(name)

    keys = jax.random.split(jax.random.key(0), B)
    reset_b = jax.jit(jax.vmap(env.reset))
    state, obs = reset_b(keys)
    jax.block_until_ready(state.physics.qpos)

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.uniform(
                k, (B, env.action_size), minval=-1.0, maxval=1.0
            )
            state, obs, reward, done, info = jax.vmap(env.step)(state, actions)
            return (state, key), reward.sum()

        (state, _), rews = jax.lax.scan(body, (state, key), None, length=N_STEPS)
        return state, rews.sum()

    rollout_j = jax.jit(rollout)
    # warmup / compile
    state2, _ = rollout_j(state, jax.random.key(1))
    jax.block_until_ready(state2.physics.qpos)

    # two timed runs, keep the faster; block on the FULL output (a one-off
    # glitch once reported a ~1ms rollout because only part of the result
    # was awaited after a device hiccup) and sanity-check finiteness
    min_plausible = 1e-4 * N_STEPS  # >10k batched steps/s is not real today
    dts = []
    for trial in range(4):
        t0 = time.perf_counter()
        state3, rsum = rollout_j(state2, jax.random.key(2 + trial))
        jax.block_until_ready((state3, rsum))
        elapsed = time.perf_counter() - t0
        state2 = state3
        dts.append(elapsed)
        if len([t for t in dts if t > min_plausible]) == 2:
            break
    plausible = [t for t in dts if t > min_plausible]
    if plausible:
        dt = min(plausible)
    else:
        # every trial fell under the plausibility floor: report the fastest
        # raw trial rather than crashing (the floor is a heuristic)
        print(f"warning: all trials under plausibility floor "
              f"{min_plausible:.4f}s; using fastest raw trial",
              file=sys.stderr)
        dt = min(dts)

    steps_per_s = B * N_STEPS / dt
    n_chips = max(len(jax.devices()), 1)
    baseline_per_chip = 1_000_000 / 8.0  # north-star aggregate over v5p-8
    tag = "wrapped " if os.environ.get("BENCH_WRAPPED") else ""
    family = "rearrange" if name in ("blocks", "ycb") else "dactyl"
    print(
        json.dumps(
            {
                "metric": f"{family}/{name} {tag}env-steps/s @ batch={B} (1 chip)",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / (baseline_per_chip * n_chips), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
