"""Benchmark matrix: env-steps/s for each BASELINE.md config over a batch
sweep, on the local chip(s). Produces the "metric to report" table
(BASELINE.json `metric`: env-steps/s per chip per task).

Usage:
    python scripts/bench_matrix.py                 # default matrix
    BENCH_CONFIGS=locked,reach BENCH_BATCHES=1024,4096 python scripts/bench_matrix.py

Prints one JSON line per (config, batch) cell plus a final summary line.
"""

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

import bench  # repo-root bench harness


def run_cell(name: str, B: int, n_steps: int) -> float:
    env = bench.build_env(name)
    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
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

        (state, _), rews = jax.lax.scan(
            body, (state, key), None, length=n_steps
        )
        return state, rews.sum()

    rollout_j = jax.jit(rollout)
    state2, _ = rollout_j(state, jax.random.key(1))
    jax.block_until_ready(state2.physics.qpos)
    t0 = time.perf_counter()
    state3, _ = rollout_j(state2, jax.random.key(2))
    jax.block_until_ready(state3.physics.qpos)
    dt = time.perf_counter() - t0
    return B * n_steps / dt


def main():
    configs = os.environ.get(
        "BENCH_CONFIGS", "locked,reach,blocks,ycb,full_perp"
    ).split(",")
    batches = [
        int(b) for b in os.environ.get("BENCH_BATCHES", "1024,4096").split(",")
    ]
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    results = {}
    for name in configs:
        for B in batches:
            # heavier dual-sim configs get a smaller sweep
            if name in ("blocks", "ycb") and B > 1024:
                continue
            try:
                v = run_cell(name.strip(), B, n_steps)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({
                    "config": name, "batch": B, "error": repr(e)[:200]
                }), flush=True)
                continue
            results[f"{name}@{B}"] = round(v, 1)
            print(json.dumps({
                "config": name, "batch": B,
                "env_steps_per_s": round(v, 1),
                "per_chip_vs_north_star": round(v / 125_000, 4),
            }), flush=True)
    print(json.dumps({"matrix": results}), flush=True)


if __name__ == "__main__":
    main()
