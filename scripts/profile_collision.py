"""Collision-internals profiler: which part of the 62ms substep collision
cost is broadphase/top_k vs narrowphase vs the mesh world-vert cache.

Usage: python scripts/profile_collision.py [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from robogym_tpu.physics.collision import driver as cd
from robogym_tpu.physics.collision import convex as cx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--inner", type=int, default=5)
    args = ap.parse_args()

    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(dtype=jnp.float32)
    m = env.model
    c = m.const
    B = args.batch

    groups = cd.build_groups(c)
    print(f"nmesh={c.nmesh} ngeom={c.ngeom} "
          f"MAXV={m.mesh_convex_vert.shape[1]} npairs={len(c.collision_pairs)}")
    for g in groups:
        print(f"  group kind={g['kind']} t=({g['t1']},{g['t2']}) "
              f"n={len(g['g1'])} K={g['K']} ncon={g['ncon']}")

    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    d0 = state.physics
    jax.block_until_ready(d0.qpos)

    def timeit(name, fn):
        def scan_fn(d):
            def body(carry, _):
                out = fn(d)
                # fold output into a scalar carry so scan iterations aren't DCE'd
                s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)
                        if jnp.issubdtype(x.dtype, jnp.floating))
                return carry + s, ()
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
        print(f"{name:28s} {dt*1e3:9.3f} ms", flush=True)
        return dt

    # full collision
    timeit("collision_full", lambda d: cd.collision(m, d).contact.dist)

    # mesh world cache only
    timeit("mesh_world_cache", lambda d: cd._mesh_world_cache(m, d))

    # broadphase only (scores + top_k + gathers for every group)
    def broadphase(d):
        rbound = cd.geom_rbound(m)
        outs = []
        for grp in groups:
            g1 = jnp.asarray(grp["g1"]); g2 = jnp.asarray(grp["g2"])
            margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
            cdist = jnp.linalg.norm(d.geom_xpos[g2] - d.geom_xpos[g1], axis=-1)
            if grp["kind"].startswith("plane"):
                nrm = d.geom_xmat[g1][:, :, 2]
                h = jnp.einsum("ki,ki->k", d.geom_xpos[g2] - d.geom_xpos[g1], nrm)
                score = rbound[g2] + margin - h
            else:
                score = rbound[g1] + rbound[g2] + margin - cdist
            n, K = len(grp["g1"]), grp["K"]
            if K < n:
                sk, sel = jax.lax.top_k(score, K)
                outs.append(sk)
            else:
                outs.append(score)
        return outs
    timeit("broadphase+topk", broadphase)

    # per-group narrowphase with FIXED first-K pairs (no top_k)
    mesh_cache_fn = lambda d: cd._mesh_world_cache(m, d) if c.nmesh else None
    for grp in groups:
        kind = grp["kind"]
        K = grp["K"]
        g1k = jnp.asarray(grp["g1"][:K])
        g2k = jnp.asarray(grp["g2"][:K])
        t1, t2 = grp["t1"], grp["t2"]

        def narrow(d, kind=kind, g1k=g1k, g2k=g2k, t1=t1, t2=t2, grp=grp):
            mesh_cache = mesh_cache_fn(d)
            if kind == "plane_prim" or kind == "prim":
                fn = grp["fn"]
                return jax.vmap(
                    lambda xp1, xm1, s1, xp2, xm2, s2: fn(
                        xp1, xm1, s1, xp2, xm2, s2)
                )(
                    d.geom_xpos[g1k], d.geom_xmat[g1k], m.geom_size[g1k],
                    d.geom_xpos[g2k], d.geom_xmat[g2k], m.geom_size[g2k],
                )
            if kind == "plane_convex":
                data2 = cd._gather_geom(m, d, g2k, t2, mesh_cache)
                nrm = d.geom_xmat[g1k][:, :, 2]
                rel = data2["world_vert"] - d.geom_xpos[g1k][:, None, :]
                vd = jnp.einsum("kvi,ki->kv", rel, nrm)
                vd = jnp.where(data2["mask"] > 0, vd, cd.BIG)
                sel = jnp.argsort(vd, axis=1)[:, :4]
                return jnp.take_along_axis(vd, sel, axis=1)
            if kind == "box_convex":
                data1 = cd._gather_geom(m, d, g1k, t1, mesh_cache)
                data2 = cd._gather_geom(m, d, g2k, t2, mesh_cache)
                return cd._collide_box_convex_group(t2, data1, data2)
            data1 = cd._gather_geom(m, d, g1k, t1, mesh_cache)
            data2 = cd._gather_geom(m, d, g2k, t2, mesh_cache)
            return cd._collide_convex_group(t1, t2, data1, data2)

        timeit(f"narrow[{kind} n={len(grp['g1'])} K={K}]", narrow)


if __name__ == "__main__":
    main()
