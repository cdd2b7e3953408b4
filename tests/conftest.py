"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment
(XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT) so sharding tests exercise real
GSPMD partitioning without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Physics conformance math is validated in f64 before f32/bf16 tuning.
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The container pins jax_platforms programmatically (env var alone is
# ignored) — force CPU for the test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: physics step compiles are expensive on the
# single-core CPU runner; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
