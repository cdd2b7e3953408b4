"""Ablation sweep: marginal cost of solver/contact budgets on the full step.

Rebuilds the locked env with modified static solver options and measures
rollout throughput for each config on the real chip. Drives perf decisions:
the fused step's cost attribution across CG iterations / active-contact
rows / broadphase caps is hard to read from XLA fusion names, so measure by
ablation instead.

Usage: python scripts/ablate_step.py [--batch 1024] [--steps 10]
"""

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def measure(env, B, n_steps, reps=3):
    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    jax.block_until_ready(state.physics.qpos)

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            acts = jax.random.uniform(
                k, (B, env.action_size), minval=-1.0, maxval=1.0
            )
            state, obs, reward, done, info = jax.vmap(env.step)(state, acts)
            return (state, key), reward.sum()

        (state, _), rews = jax.lax.scan(body, (state, key), None, length=n_steps)
        return state, rews.sum()

    rj = jax.jit(rollout)
    s2, r = rj(state, jax.random.key(1))
    jax.block_until_ready(s2.physics.qpos)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        s3, r = rj(s2, jax.random.key(2 + i))
        jax.block_until_ready((s3, r))
        best = min(best, time.perf_counter() - t0)
    return B * n_steps / best, float(r)


def build(opt_overrides=None, caps=None):
    from robogym_tpu.physics.collision import driver as cd

    if caps is not None:
        cd.KIND_GROUP_CAP = dict(caps)
    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(dtype=jnp.float32)
    if opt_overrides:
        env.model = env.model.replace(
            opt=env.model.opt.replace(**opt_overrides)
        )
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--configs", default="")
    args = ap.parse_args()

    base_caps = {"convex": 16, "box_convex": 32}
    configs = [
        ("base", {}, base_caps),
        ("iters12", dict(cg_iterations=12), base_caps),
        ("iters10", dict(cg_iterations=10), base_caps),
        ("ncon24", dict(ncon_active=24), base_caps),
        ("ncon16", dict(ncon_active=16), base_caps),
        ("bc24", {}, {"convex": 16, "box_convex": 24}),
        ("bc16_cx8", {}, {"convex": 8, "box_convex": 16}),
        ("lean", dict(cg_iterations=12, ncon_active=24),
         {"convex": 8, "box_convex": 24}),
    ]
    if args.configs:
        want = set(args.configs.split(","))
        configs = [c for c in configs if c[0] in want]

    for name, opt, caps in configs:
        env = build(opt, caps)
        sps, r = measure(env, args.batch, args.steps)
        print(f"{name:12s} {sps:10.1f} env-steps/s  (rsum {r:.2f})", flush=True)


if __name__ == "__main__":
    main()
