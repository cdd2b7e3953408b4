"""Worker process for the 2-process jax.distributed test (test_multihost.py).

Each process owns 4 virtual CPU devices (xla_force_host_platform_device_count,
set by the launcher) and joins a 2-process jax.distributed cluster -> a
global 8-device mesh. This is the real multi-host runtime path documented in
robogym_tpu/parallel/rollout.py: `jax.distributed.initialize`, a global
`Mesh`, batch data constructed per-process with
`jax.make_array_from_callback`, physics stepped under `shard_map`, and
metrics reduced with `jax.lax.pmean` over dp (the collective rides the
cross-process CPU transport here; ICI/DCN on a real slice).

Run: python multihost_worker.py <process_id> <num_processes> <port>
Prints one JSON line {"qpos_mean": ..., "energy_mean": ..., "ndev": ...}.
"""

import json
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    # this container ignores the JAX_PLATFORMS env var; pin programmatically
    # before the first backend touch (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from robogym_tpu.mjcf.compiler import compile_xml
    from robogym_tpu.mjcf.model import make_data
    from robogym_tpu.parallel import mesh as mesh_lib
    from robogym_tpu.physics import step as step_lib

    assert jax.process_count() == nproc, jax.process_count()
    ndev = len(jax.devices())
    assert ndev == 4 * nproc, ndev

    xml = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.001" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" pos="0 0 0" damping="0"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0 0 -0.5" size="0.02"
            density="1000" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""
    m = compile_xml(xml, dtype=jnp.float64)
    mesh = mesh_lib.make_mesh(ndev, tp=1)
    B = ndev * 2

    # global batch: per-env initial angle is a pure function of the GLOBAL
    # index, assembled per-process from local shards
    qpos0 = (0.1 + 0.05 * np.arange(B, dtype=np.float64))[:, None]
    sharding = NamedSharding(mesh, P("dp"))
    qpos_b = jax.make_array_from_callback(
        (B, 1), sharding, lambda idx: qpos0[idx]
    )

    def local_rollout(qpos):
        d = make_data(m, dtype=jnp.float64)
        d = jax.vmap(lambda q: d.replace(qpos=q))(qpos)
        # the closure-built Data leaves are replicated; mark the whole carry
        # dp-varying so the lax.scan carry types match under shard_map
        d = jax.vmap(lambda dd: step_lib.step_n(m, dd, 50))(d)
        qpos_mean = jax.lax.pmean(jnp.mean(d.qpos), axis_name="dp")
        energy = jnp.mean(0.5 * d.qvel[:, 0] ** 2)
        energy_mean = jax.lax.pmean(energy, axis_name="dp")
        return qpos_mean, energy_mean

    fn = jax.jit(
        shard_map(
            local_rollout, mesh=mesh, in_specs=P("dp"),
            out_specs=(P(), P()), check_vma=False,
        )
    )
    qpos_mean, energy_mean = fn(qpos_b)
    print(json.dumps({
        "qpos_mean": float(qpos_mean),
        "energy_mean": float(energy_mean),
        "ndev": ndev,
        "process_count": jax.process_count(),
    }))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
