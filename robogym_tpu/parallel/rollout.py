"""Sharded rollout driver — batch-parallel env execution over a device mesh.

The TPU-native replacement for the reference's absent rollout infrastructure
(SURVEY.md §2.3: the reference runs one MjSim per process; rollout
parallelism lived outside the repo). Two equivalent paths:

  * `make_rollout_fn` — GSPMD: the env batch axis is sharded over the
    mesh's `dp` axis via in/out shardings; XLA inserts the metric
    all-reduces implied by the global means. Zero cross-chip traffic for
    the physics itself (embarrassingly parallel).
  * `make_shardmap_rollout_fn` — explicit SPMD: the same rollout under
    `shard_map`, with per-step metrics reduced by `jax.lax.pmean` over the
    `dp` axis (collectives ride ICI). Exercised on the virtual 8-device
    CPU mesh in tests/test_parallel.py.

Multi-host status: exercised in-process-count=2 form by
tests/test_multihost.py — two worker processes each owning 4 virtual CPU
devices join a `jax.distributed.initialize` cluster, build the global
8-device mesh with `parallel.mesh.make_mesh`, and run a shard_map physics
rollout whose pmean-reduced metrics must agree across processes and match a
single-process run. On TPU hardware the same code path scales to a real
multi-host slice (ICI/DCN collectives instead of the CPU transport).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from robogym_tpu.parallel import mesh as mesh_lib


def sharded_reset(env, mesh: Mesh, batch_size: int, key: jax.Array):
    """Batched env.reset with the batch axis sharded over dp."""
    assert batch_size % mesh.shape["dp"] == 0, (batch_size, mesh.shape)
    keys = jax.random.split(key, batch_size)
    keys = jax.device_put(keys, NamedSharding(mesh, P("dp")))
    reset_b = jax.jit(
        jax.vmap(env.reset),
        out_shardings=(NamedSharding(mesh, P("dp")), NamedSharding(mesh, P("dp"))),
    )
    return reset_b(keys)


def make_rollout_fn(
    env,
    mesh: Mesh,
    n_steps: int,
    policy_fn: Optional[Callable] = None,
):
    """Build a jitted rollout: (state_b, key) -> (state_b, metrics).

    `policy_fn(key, obs_b) -> actions_b` defaults to uniform random actions.
    Metrics are mesh-wide means/sums (psum/pmean over dp inside the same
    program — the info-dict contract of the reference reduced via
    collectives, SURVEY.md §5 observability)."""

    def default_policy(key, obs_b, batch):
        return jax.random.uniform(
            key, (batch, env.action_size), minval=-1.0, maxval=1.0
        )

    def rollout(state_b, key):
        batch = jax.tree_util.tree_leaves(state_b)[0].shape[0]

        def body(carry, _):
            state_b, key = carry
            key, k_act = jax.random.split(key)
            if policy_fn is None:
                obs_b = None
                actions = default_policy(k_act, obs_b, batch)
            else:
                obs_b = jax.vmap(env._observe)(state_b)
                actions = policy_fn(k_act, obs_b)
            state_b, obs, reward, done, info = jax.vmap(env.step)(
                state_b, actions
            )
            step_metrics = {
                "reward_mean": reward.sum(-1).mean(),
                "done_frac": done.mean(),
                "success_rate": info["is_successful"].mean()
                if "is_successful" in info else jnp.zeros(()),
            }
            return (state_b, key), step_metrics

        (state_b, _), ms = jax.lax.scan(body, (state_b, key), None, length=n_steps)
        metrics = {k: v.mean() for k, v in ms.items()}
        return state_b, metrics

    return jax.jit(
        rollout,
        out_shardings=(
            NamedSharding(mesh, P("dp")),
            NamedSharding(mesh, P()),
        ),
    )


def make_shardmap_rollout_fn(env, mesh: Mesh, n_steps: int):
    """Explicit-SPMD rollout: runs per-shard under `shard_map`, reducing the
    per-step metrics with `jax.lax.pmean` over `dp` (ICI collectives). The
    physics itself needs no collectives — each shard steps its local envs.

    Per-shard action RNG: the caller key is folded with the shard's dp index
    so shards draw independent actions (deterministic in (key, mesh))."""
    from jax.experimental.shard_map import shard_map

    n_dp = mesh.shape["dp"]

    def rollout_shard(state_b, key):
        local = jax.tree_util.tree_leaves(state_b)[0].shape[0]
        key = jax.random.fold_in(key[0], jax.lax.axis_index("dp"))

        def body(carry, _):
            state_b, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.uniform(
                k_act, (local, env.action_size), minval=-1.0, maxval=1.0
            )
            state_b, obs, reward, done, info = jax.vmap(env.step)(
                state_b, actions
            )
            step_metrics = {
                "reward_mean": jax.lax.pmean(reward.sum(-1).mean(), "dp"),
                "done_frac": jax.lax.pmean(done.mean(), "dp"),
            }
            if "is_successful" in info:
                step_metrics["success_rate"] = jax.lax.pmean(
                    info["is_successful"].mean(), "dp"
                )
            return (state_b, key), step_metrics

        (state_b, _), ms = jax.lax.scan(
            body, (state_b, key), None, length=n_steps
        )
        return state_b, {k: v.mean()[None] for k, v in ms.items()}

    f = shard_map(
        rollout_shard,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_rep=False,
    )

    def run(state_b, key):
        keys = jnp.broadcast_to(key, (n_dp, *key.shape))
        state_b, metrics = f(state_b, keys)
        # pmean left identical copies on every shard; take the global mean
        return state_b, {k: v.mean() for k, v in metrics.items()}

    return jax.jit(run)


def scaling_report(env, batch_per_device: int = 128, n_steps: int = 10,
                   key: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Measure env-steps/s at 1 device and at the full mesh — the
    BASELINE.md scaling-efficiency metric."""
    import time

    key = key if key is not None else jax.random.key(0)
    out = {}
    for n_dev in (1, len(jax.devices())):
        mesh = mesh_lib.make_mesh(n_dev, tp=1, axis_names=("dp", "tp"))
        B = batch_per_device * n_dev
        state_b, _ = sharded_reset(env, mesh, B, key)
        fn = make_rollout_fn(env, mesh, n_steps)
        state_b, _ = fn(state_b, key)          # compile
        jax.block_until_ready(state_b.physics.qpos)
        t0 = time.perf_counter()
        state_b, metrics = fn(state_b, key)
        jax.block_until_ready(state_b.physics.qpos)
        dt = time.perf_counter() - t0
        out[f"steps_per_s@{n_dev}dev"] = B * n_steps / dt
    if out and len(jax.devices()) > 1:
        n = len(jax.devices())
        out["scaling_efficiency"] = (
            out[f"steps_per_s@{n}dev"] / (n * out["steps_per_s@1dev"])
        )
    return out
