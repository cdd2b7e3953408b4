"""Throughput benchmark: batched dactyl/reach env steps per second.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "env-steps/s", "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the north-star
target is 1e6 env-steps/s aggregate (dactyl @ 4096 envs/chip on v5p-8, i.e.
125k/chip). vs_baseline reports value / 125_000 (per-chip share of the
north star) scaled by the number of local chips.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from robogym_tpu.envs.dactyl.reach import make_env

    B = int(os.environ.get("BENCH_BATCH", 512))
    N_STEPS = int(os.environ.get("BENCH_STEPS", 20))

    env = make_env(dict(goal_stabilize_steps=0), dtype=jnp.float32)

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

    t0 = time.perf_counter()
    state3, rsum = rollout_j(state2, jax.random.key(2))
    jax.block_until_ready(state3.physics.qpos)
    dt = time.perf_counter() - t0

    steps_per_s = B * N_STEPS / dt
    n_chips = max(len(jax.devices()), 1)
    baseline_per_chip = 1_000_000 / 8.0  # north-star aggregate over v5p-8
    print(
        json.dumps(
            {
                "metric": f"dactyl/reach env-steps/s @ batch={B} (1 chip)",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / (baseline_per_chip * n_chips), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
