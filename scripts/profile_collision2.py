"""In-situ collision cost attribution: run the REAL collision() driver with
selected groups filtered out, to see each group's marginal in-situ cost
(captures the top_k+gather structure the isolated profiler misses)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from robogym_tpu.physics.collision import driver as cd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--inner", type=int, default=5)
    args = ap.parse_args()

    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(dtype=jnp.float32)
    m = env.model
    B = args.batch

    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    d0 = state.physics
    jax.block_until_ready(d0.qpos)

    orig_build = cd.build_groups

    def timeit(name, fn):
        def scan_fn(d):
            def body(carry, _):
                out = fn(d)
                return carry + jnp.sum(out.contact.dist), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=args.inner)
            return out
        f = jax.jit(jax.vmap(scan_fn))
        r = f(d0)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = f(d0)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(f"{name:34s} {dt*1e3:9.3f} ms", flush=True)

    all_groups = orig_build(m.const)
    kinds = [g["kind"] for g in all_groups]

    def collide_only(keep_kinds):
        def fn(d):
            cd.build_groups.cache_clear()
            # monkeypatch: filter groups by kind
            def patched(const, group_cap=cd.DEFAULT_GROUP_CAP):
                return [g for g in orig_build(const, group_cap)
                        if g["kind"] in keep_kinds]
            cd.build_groups = patched
            try:
                out = cd.collision(m, d)
            finally:
                cd.build_groups = orig_build
            return out
        return fn

    timeit("full", collide_only(set(kinds)))
    for skip in sorted(set(kinds)):
        keep = set(kinds) - {skip}
        timeit(f"without {skip}", collide_only(keep))
    timeit("only prim+plane_prim", collide_only({"prim", "plane_prim"}))
    # no-topk variant: raise caps so K == n (no gather indirection)
    def no_topk(d):
        cd.build_groups.cache_clear()
        def patched(const, group_cap=10_000):
            saved = dict(cd.KIND_GROUP_CAP)
            cd.KIND_GROUP_CAP.clear()
            try:
                return orig_build(const, 10_000)
            finally:
                cd.KIND_GROUP_CAP.update(saved)
        cd.build_groups = patched
        try:
            return cd.collision(m, d, group_cap=10_000)
        finally:
            cd.build_groups = orig_build
    timeit("full, no topk (K=n all pairs)", no_topk)


if __name__ == "__main__":
    main()
