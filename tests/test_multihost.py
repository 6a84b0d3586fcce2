"""Two-process jax.distributed test for parallel/multihost.py.

Exercises the initialize()/global_mesh() path that single-process CI cannot:
two real OS processes, each with 2 virtual CPU devices, form one 4-device
global mesh via jax.distributed, then run a psum over it (the collective the
distributed Schur reduction rides — parallel/sharded.py all-reduces the
reduced camera system the same way). The reference has no distributed code at
all (SURVEY.md section 2.4); this guards our from-scratch multi-host layer.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys

    port = sys.argv[1]
    pid = int(sys.argv[2])

    import jax

    # The harness may pre-import jax on a TPU platform (see tests/conftest.py);
    # the env var alone is then too late — force the config directly.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from bundleadjustment_benchmarks_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()

    mesh = multihost.global_mesh()
    assert mesh.devices.size == 4, mesh.devices

    # One psum over the global mesh: every process contributes its local
    # shards' values; all processes must agree on the reduced result.
    sharding = NamedSharding(mesh, P("obs"))
    global_vals = np.arange(8.0).reshape(4, 2)  # shard s holds row s

    def make_local(idx):
        return global_vals[idx]

    x = jax.make_array_from_callback((4, 2), sharding, make_local)

    @jax.jit
    def reduce(x):
        return shard_map(
            lambda a: jax.lax.psum(a, "obs"),
            mesh=mesh, in_specs=P("obs"), out_specs=P("obs"),
        )(x)

    y = reduce(x)
    local = [np.asarray(s.data) for s in y.addressable_shards]
    expect = global_vals.sum(axis=0)
    for arr in local:
        np.testing.assert_allclose(arr[0], expect)

    print(f"MULTIHOST_OK process={jax.process_index()} "
          f"coordinator={multihost.is_coordinator()}")
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_initialize_and_psum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Platform/device flags must be in the environment BEFORE the worker's
    # interpreter starts (jax may be imported by site hooks at startup).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "MULTIHOST_OK" in out, out
    assert any("coordinator=True" in out for _, out, _ in outs)
    assert any("coordinator=False" in out for _, out, _ in outs)
