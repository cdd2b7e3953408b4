"""Capture a jax profiler trace of the full jitted env step and dump the
top device ops by total duration.

Writes the trace under /tmp/jax_trace, then parses the .trace.json.gz
(Chrome trace events) and aggregates XLA op durations on the device track.

Usage: python scripts/trace_step.py [--env locked] [--batch 1024] [--steps 3]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="locked")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/jax_trace")
    args = ap.parse_args()

    if args.env == "locked":
        from robogym_tpu.envs.dactyl.locked import make_env

        env = make_env(dtype=jnp.float32)
    else:
        raise SystemExit(f"unknown env {args.env}")

    B = args.batch
    keys = jax.random.split(jax.random.key(0), B)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)

    def adv(state, key):
        acts = jax.random.uniform(key, (B, env.action_size), minval=-1, maxval=1)
        state, *_ = jax.vmap(env.step)(state, acts)
        return state

    adv_j = jax.jit(adv)
    # warm up until compile is certainly done: one call compiles, then a
    # couple more flush autotuning; match the traced count so long --steps
    # runs don't fold compile noise into the first traced iterations
    for i in range(max(3, args.steps)):
        state = adv_j(state, jax.random.key(i + 1))
    jax.block_until_ready(state.physics.qpos)

    import shutil

    shutil.rmtree(args.outdir, ignore_errors=True)
    with jax.profiler.trace(args.outdir):
        for i in range(args.steps):
            state = adv_j(state, jax.random.key(100 + i))
        jax.block_until_ready(state.physics.qpos)

    # parse the chrome trace
    paths = glob.glob(
        os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit("no trace written")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # find device-track pids (TPU / device compute lanes)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if ("TPU" in n or "/device" in n.lower() or "Device" in n)
        and "host" not in n.lower()
    }

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[: args.top]
    print(f"device pids: { {p: pid_names[p] for p in dev_pids} }")
    print(f"total device op time: {total:.2f} ms over {args.steps} env steps")
    print(f"{'ms':>9} {'calls':>6}  op")
    for name, (ms, n) in rows:
        print(f"{ms:9.3f} {n:6d}  {name[:110]}")

    # aggregate leaf-op time by source file:line via the compiled HLO's
    # metadata (op names change between compiles, so map from THIS compile)
    import re

    hlo = adv_j.lower(state, jax.random.key(0)).compile().as_text()
    src_of = {}
    pat = re.compile(
        r"%([a-zA-Z0-9_.\-]+) = .*?source_file=\"([^\"]*)\" source_line=(\d+)"
    )
    for mt in pat.finditer(hlo):
        src_of[mt.group(1)] = f"{mt.group(2).split('robogym_tpu/')[-1]}:{mt.group(3)}"
    by_src = defaultdict(float)
    for name, (ms, n) in agg.items():
        if name.startswith("jit_") or name.startswith("while"):
            continue  # containers double-count their children
        by_src[src_of.get(name, "<unattributed: " + name.split(".")[0] + ">")] += ms
    print("\nby source line (leaf device ms):")
    for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms:9.3f}  {src}")


if __name__ == "__main__":
    main()
