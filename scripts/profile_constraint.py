"""Sub-phase profiler for the constraint stack: selection, Jacobian build,
row emission, regularizer, kernel transposes, CG kernel call.

Usage: python scripts/profile_constraint.py [--batch 1024]"""

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

from robogym_tpu.physics import constraint as cl
from robogym_tpu.physics import factor_kernel, smooth
from robogym_tpu.physics.collision import driver as collision_driver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--inner", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    from robogym_tpu.envs.dactyl.locked import make_env

    env = make_env(dtype=jnp.float32)
    m = env.model

    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)

    def adv(state, key):
        acts = jax.random.uniform(key, (B, env.action_size), minval=-1, maxval=1)
        state, *_ = jax.vmap(env.step)(state, acts)
        return state

    adv_j = jax.jit(adv)
    for i in range(3):
        state = adv_j(state, jax.random.key(i + 1))
    d0 = state.physics
    jax.block_until_ready(d0.qpos)

    c = m.const

    def sel_topk(d):
        con = d.contact
        S = min(m.opt.ncon_active, con.dist.shape[0])
        score = jnp.where(con.active, con.dist - con.includemargin, cl.BIG)
        _, sel = jax.lax.top_k(-score, S)
        return sel

    def gather_after_sel(d):
        con = d.contact
        sel = sel_topk(d)
        geom_bodyid = jnp.asarray(c.geom_bodyid)
        from robogym_tpu.physics.collision import driver as _drv

        solref_f, solimp_f, fric_f = _drv.contact_full_params(
            c, m.opt.group_cap, con
        )
        return (con.pos[sel], _drv.contact_frame(con)[sel], con.dist[sel],
                con.includemargin[sel], fric_f[sel], con.active[sel],
                con.condim[sel], geom_bodyid[con.geom1[sel]],
                geom_bodyid[con.geom2[sel]], solref_f[sel], solimp_f[sel])

    def point_jacs(d):
        con = d.contact
        sel = sel_topk(d)
        geom_bodyid = jnp.asarray(c.geom_bodyid)
        b1 = geom_bodyid[con.geom1[sel]]
        b2 = geom_bodyid[con.geom2[sel]]
        pos_c = con.pos[sel]
        Jp1 = cl._point_jac_batch(m, d, pos_c, b1)
        Jp2 = cl._point_jac_batch(m, d, pos_c, b2)
        return Jp2 - Jp1

    def full_make_efc(d):
        Minv = factor_kernel.spd_inverse(d.qM)
        efc = cl.make_efc(m, d, Minv)
        return efc["J"], efc["aref"], efc["D"]

    def full_solve(d):
        qfrc_smooth = (
            d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied - d.qfrc_bias
        )
        Minv = factor_kernel.spd_inverse(d.qM)
        d = d.replace(qacc_smooth=Minv @ qfrc_smooth)
        return cl.solve(m, d, qfrc_smooth, Minv).qacc

    def efc_no_reg(d):
        # make_efc minus the MinvJT regularizer: isolate its cost
        Minv = factor_kernel.spd_inverse(d.qM)
        efc = cl.make_efc(m, d, Minv)
        return efc["J"]

    phases = [
        ("sel_topk", sel_topk),
        ("gather_after_sel", gather_after_sel),
        ("point_jacs", point_jacs),
        ("make_efc_J_only", efc_no_reg),
        ("make_efc_full", full_make_efc),
        ("constraint_full", full_solve),
    ]

    for name, fn in phases:
        def scan_fn(d, fn=fn):
            def body(carry, i):
                out = fn(carry)
                leaves = jax.tree_util.tree_leaves(out)
                # fold a scalar back into qpos so scan can't DCE the phase
                bump = sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)
                return carry.replace(qpos=carry.qpos + bump), ()
            out, _ = jax.lax.scan(body, d, None, length=args.inner)
            return out
        f = jax.jit(jax.vmap(scan_fn))
        out = f(d0)
        jax.block_until_ready(out.qpos)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(d0)
        jax.block_until_ready(out.qpos)
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(f"{name:18s} {dt*1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
