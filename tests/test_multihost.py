"""Multi-host (DCN) path: jax.distributed over 2 CPU processes.

The reference is single-process multi-GPU only (GPUWorker.h); the TPU
framework scales across hosts with jax.distributed + the same shard_map
program (SURVEY §2.4: psum rides ICI within a host and DCN across hosts).
This test launches 2 local processes, each with 2 virtual CPU devices,
builds the 4-device global `slices` mesh, and checks a sharded EM/SR
collective result against the single-process value.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    port = sys.argv[2]
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fetalreconstruction_tpu.parallel import sharded

    assert jax.device_count() == 4, jax.device_count()
    mesh = sharded.make_mesh(jax.devices())

    # deterministic per-slice data, sharded over the global mesh
    n, h, w = 8, 6, 6
    data = np.arange(n * h * w, dtype=np.float32).reshape(n, h, w)

    try:
        from jax import shard_map
        kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}

    def body(x):
        # per-slice partial + global psum: the cross-host collective
        return jax.lax.psum(jnp.sum(x ** 2), "slices")

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("slices"),
                          out_specs=P(), **kw))
    # each process supplies only its ADDRESSABLE shards
    order = {d: i for i, d in enumerate(mesh.devices.flat)}
    local = [jax.device_put(data[2 * order[d]:2 * order[d] + 2], d)
             for d in jax.local_devices()]
    x = jax.make_array_from_single_device_arrays(
        (n, h, w), NamedSharding(mesh, P("slices")), local)
    got = float(f(x))
    want = float((data ** 2).sum())
    assert abs(got - want) < 1e-3 * want, (got, want)
    if pid == 0:
        print("MULTIHOST_OK", got)
""")


def _free_port() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # the worker script lives in tmp_path; make the repo importable
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    port = str(_free_port())
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              env=env, cwd=repo_root)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    assert procs[0].returncode == 0, outs[0][-2000:]
    assert procs[1].returncode == 0, outs[1][-2000:]
    assert "MULTIHOST_OK" in outs[0], outs[0][-2000:]
