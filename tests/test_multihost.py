"""True multi-process jax.distributed test (VERDICT r1 item 10).

Launches 2 worker processes, each with 4 virtual CPU devices, that join a
jax.distributed cluster and run a shard_map physics rollout over the global
8-device mesh with pmean metric reduction (tests/multihost_worker.py). The
same computation is then reproduced on this process's local 8-virtual-device
mesh; the pmean-reduced metrics must agree across (a) the two worker
processes and (b) the multi-process vs single-process runs.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_rollout():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu programmatically
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1100)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    for o in outs:
        assert o["ndev"] == 8
        assert o["process_count"] == 2
        assert np.isfinite(o["qpos_mean"]) and np.isfinite(o["energy_mean"])
    # pmean over dp -> every process sees the identical global metric
    assert outs[0]["qpos_mean"] == pytest.approx(outs[1]["qpos_mean"], abs=0)
    assert outs[0]["energy_mean"] == pytest.approx(
        outs[1]["energy_mean"], abs=0
    )

    # single-process reference on this process's own 8 virtual devices
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robogym_tpu.mjcf.compiler import compile_xml
    from robogym_tpu.mjcf.model import make_data
    from robogym_tpu.parallel import mesh as mesh_lib
    from robogym_tpu.physics import step as step_lib

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
    mesh = mesh_lib.make_mesh(8, tp=1)
    B = 16
    qpos0 = 0.1 + 0.05 * np.arange(B, dtype=np.float64)
    qpos_b = jax.device_put(
        qpos0[:, None], NamedSharding(mesh, P("dp"))
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
        shard_map(local_rollout, mesh=mesh, in_specs=P("dp"),
                  out_specs=(P(), P()), check_vma=False)
    )
    qpos_mean, energy_mean = fn(qpos_b)
    assert float(qpos_mean) == pytest.approx(outs[0]["qpos_mean"], rel=1e-12)
    assert float(energy_mean) == pytest.approx(
        outs[0]["energy_mean"], rel=1e-12
    )
