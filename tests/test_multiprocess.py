"""Multi-process distributed init (parallel/mesh.multihost_init): a real
2-process rendezvous over loopback, global mesh spanning both processes'
devices, and a cross-process psum — the analogue of the reference's
multi-process NCCL-uid handshake path (`parallel.cpp:125-137`,
`python/train.py`), which its test suite never exercised."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from caffe_escoin_tpu.parallel import mesh as mesh_lib

    coord, pid = sys.argv[1], int(sys.argv[2])
    mesh_lib.multihost_init(coordinator_address=coord, num_processes=2,
                            process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())  # global: both processes' cpu devices
    mesh = Mesh(devs, ("data",))
    sharding = NamedSharding(mesh, P("data"))
    n = len(devs)
    # each process contributes its local shard; psum crosses the process
    # boundary through the distributed runtime
    local = jnp.full((len(jax.local_devices()), 8), jax.process_index() + 1.0)
    arr = jax.make_array_from_process_local_data(sharding, np.asarray(local),
                                                 (n, 8))
    total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(
        mesh, P()))(arr)
    expected = 8.0 * (n // 2) * (1.0 + 2.0)
    assert float(total) == expected, (float(total), expected)
    print(f"proc {pid}: global psum ok ({float(total)})")
""")


def test_two_process_rendezvous_and_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True,
                         cwd=repo_root)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and ("UNIMPLEMENTED" in out
                                  or "not supported" in out.lower()):
            pytest.skip(f"multi-process CPU collectives unsupported: "
                        f"{out[-200:]}")
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "global psum ok" in out
