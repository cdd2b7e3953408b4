"""Compile + time the fused SPD-inverse kernel on the real chip."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from robogym_tpu.physics import factor_kernel

B = int(os.environ.get("B", 1024))
NV = int(os.environ.get("NV", 30))

rng = np.random.default_rng(0)
A = rng.standard_normal((B, NV, NV)).astype(np.float32)
M = A @ np.swapaxes(A, 1, 2) + 3.0 * np.eye(NV, dtype=np.float32)
Mj = jnp.asarray(M)

fn = jax.jit(factor_kernel.spd_inverse_batched)
print(f"compiling B={B} NV={NV} on {jax.default_backend()}...", flush=True)
t0 = time.time()
out = fn(Mj)
out.block_until_ready()
print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
n = 50
for _ in range(n):
    out = fn(Mj)
out.block_until_ready()
dt = (time.time() - t0) / n
err = np.abs(np.asarray(out) @ M - np.eye(NV)).max()
print(f"steady: {dt*1e3:.3f} ms/call  max|Ainv@A - I|={err:.2e}")
