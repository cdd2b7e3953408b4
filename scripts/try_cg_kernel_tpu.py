"""Compile + time the fused Pallas CG kernel on the real chip at
dactyl/locked-like shapes. Usage: python scripts/try_cg_kernel_tpu.py"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from robogym_tpu.physics import cg_kernel, constraint

B = int(os.environ.get("B", 1024))
NEFC = int(os.environ.get("NEFC", 248))
NV = int(os.environ.get("NV", 30))
ITERS = int(os.environ.get("ITERS", 20))

rng = np.random.default_rng(0)
A = rng.standard_normal((B, NV, NV)).astype(np.float32)
M = A @ np.swapaxes(A, 1, 2) + 3.0 * np.eye(NV, dtype=np.float32)
Minv = np.linalg.inv(M)
J = rng.standard_normal((B, NEFC, NV)).astype(np.float32)
aref = rng.standard_normal((B, NEFC)).astype(np.float32)
D = (np.abs(rng.standard_normal((B, NEFC))) + 0.1).astype(np.float32)
kind = rng.integers(0, 3, NEFC).astype(np.int32)
floss = np.where(kind == 2, 0.5, 0.0).astype(np.float32)[None].repeat(B, 0)
qs = rng.standard_normal((B, NV)).astype(np.float32)
x0 = qs.copy()

args = list(map(jnp.asarray, (J, aref, D, floss, M, Minv, qs, x0)))

fn = jax.jit(lambda *a: cg_kernel.solve_cg_batched(kind, ITERS, *a))
print(f"compiling B={B} NEFC={NEFC} NV={NV} iters={ITERS} "
      f"on {jax.default_backend()}...", flush=True)
t0 = time.time()
x, f = fn(*args)
x.block_until_ready()
print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
n = 20
for _ in range(n):
    x, f = fn(*args)
x.block_until_ready()
dt = (time.time() - t0) / n
print(f"steady: {dt*1e3:.3f} ms/call  x[0,:3]={np.asarray(x)[0,:3]}")
