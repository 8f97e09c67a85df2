"""True multi-process (multi-controller) validation of the distributed layer:
two OS processes form one jax.distributed process group over localhost
(Gloo = the CPU stand-in for DCN), build a global 8-device mesh, feed it
host-sharded batches, and run the data-parallel ranker step — the loss must
equal the single-process run bit-for-bit (same global batch, same pmean).

This is the multi-host story of SURVEY §5.8 actually executed, not just
dryrun-compiled: jax.distributed init, per-process input sharding
(host_shard_sessions semantics), host_local_array_to_global_array, and a
cross-process psum inside the jitted step."""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

sys.path.insert(0, sys.argv[4])
from otto_tpu.models.ranker import init_tower
from otto_tpu.parallel.data_parallel import make_dp_ranker_step
from otto_tpu.parallel.mesh import host_shard_sessions

assert jax.process_count() == nproc
devs = jax.devices()
mesh = Mesh(np.asarray(devs).reshape(len(devs), 1), ("data", "model"))

B, C, F = 16, 8, 6
rng = np.random.default_rng(0)  # same on every process: global batch
x = rng.normal(size=(B, C, F)).astype(np.float32)
y = (rng.random((B, C)) < 0.3).astype(np.int8)
m = np.ones((B, C), bool)

# each process contributes its host-local slice of the global batch
rows = host_shard_sessions(B)
assert len(rows) == B // nproc

def to_global(a):
    return multihost_utils.host_local_array_to_global_array(
        a[rows], mesh, P("data"))

params = init_tower(jax.random.PRNGKey(1), F, (16, 8))
opt = optax.sgd(0.1)
step = make_dp_ranker_step(mesh, opt, loss_name="lambdarank", dropout=0.0)
params, _, loss = step(params, opt.init(params), to_global(x), to_global(y),
                       to_global(m), jax.random.PRNGKey(2))
print(f"LOSS {pid} {float(loss):.10f}", flush=True)
leaf0 = float(np.asarray(jax.tree.leaves(params)[0]).ravel()[0])
print(f"LEAF {pid} {leaf0:.10f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_ranker_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = {}
    leaves = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS"):
                _, pid, v = line.split()
                losses[int(pid)] = float(v)
            if line.startswith("LEAF"):
                _, pid, v = line.split()
                leaves[int(pid)] = float(v)
    assert set(losses) == {0, 1}
    assert losses[0] == losses[1]
    assert leaves[0] == leaves[1]

    # single-process reference on this process's own 8 virtual devices
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, PartitionSpec as P  # noqa: F401

    from otto_tpu.models.ranker import init_tower
    from otto_tpu.parallel.data_parallel import make_dp_ranker_step

    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs).reshape(8, 1), ("data", "model"))
    B, C, F = 16, 8, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, C, F)).astype(np.float32))
    y = jnp.asarray((rng.random((B, C)) < 0.3).astype(np.int8))
    m = jnp.ones((B, C), bool)
    params = init_tower(jax.random.PRNGKey(1), F, (16, 8))
    opt = optax.sgd(0.1)
    step = make_dp_ranker_step(mesh, opt, loss_name="lambdarank", dropout=0.0)
    _, _, ref_loss = step(params, opt.init(params), x, y, m, jax.random.PRNGKey(2))
    assert abs(losses[0] - float(ref_loss)) < 1e-6
