"""Measure runtime broadphase/contact activity for cap sizing.

Rolls out the locked env with random actions and reports, per collision
group, the distribution (mean/p99/max over envs x steps) of the number of
broadphase-active pairs (bounding-sphere overlap score > 0), plus the
number of active contact slots (dist < includemargin). These numbers size
the per-group K caps and opt.ncon_active.

Usage: python scripts/measure_active.py [--batch 256] [--steps 50]
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from robogym_tpu.envs.dactyl.locked import make_env
    from robogym_tpu.physics.collision import driver

    env = make_env(dtype=jnp.float32)
    m = env.model
    c = m.const
    groups = driver.build_groups(c, m.opt.group_cap)

    B = args.batch
    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)

    # static slot ranges per group (driver concatenation order)
    slot_ranges = []
    base = 0
    for g in groups:
        nslots = g["K"] * g["ncon"]
        slot_ranges.append((base, base + nslots))
        base += nslots

    def group_counts(d):
        """Per-group bp-active pair count + per-group touching-slot count."""
        scores = driver.broadphase_scores(m, d, m.opt.group_cap)
        out = [jnp.sum(s > 0) for s in scores]
        con = d.contact
        out.append(jnp.sum(con.active))
        for lo, hi in slot_ranges:
            out.append(jnp.sum(con.active[lo:hi]))
        return jnp.stack(out)

    def adv(state, key):
        acts = jax.random.uniform(key, (B, env.action_size), minval=-1, maxval=1)
        state, *_ = jax.vmap(env.step)(state, acts)
        counts = jax.vmap(group_counts)(state.physics)
        return state, counts

    adv_j = jax.jit(adv)
    allc = []
    for i in range(args.steps):
        state, counts = adv_j(state, jax.random.key(i + 1))
        allc.append(np.asarray(counts))
    allc = np.concatenate(allc, 0)  # (steps*B, ngroups+1)

    names = (
        [g["kind"] for g in groups]
        + ["contact_slots_active"]
        + [g["kind"] + ":touching" for g in groups]
    )
    caps = (
        [g["K"] for g in groups]
        + [m.opt.ncon_active]
        + [g["K"] * g["ncon"] for g in groups]
    )
    print(f"{'group':<24}{'cap':>5}{'mean':>8}{'p99':>6}{'max':>6}")
    for j, nm in enumerate(names):
        col = allc[:, j]
        print(
            f"{nm:<24}{caps[j]:>5}{col.mean():>8.2f}"
            f"{int(np.percentile(col, 99)):>6}{int(col.max()):>6}"
        )


if __name__ == "__main__":
    main()
