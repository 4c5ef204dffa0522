"""Multi-host smoke: 2-process jax.distributed CPU run through
init_distributed + make_multihost_mesh + a GSPMD-sharded matmul and a
cross-host collective (VERDICT r2 item 5 — the last de-risk available
before real multi-host v5e time; the reference has no multi-node story
at all, SURVEY §2.7).

Each subprocess is one "host" with 2 virtual CPU devices; the global mesh
is (dp=2 over DCN) x (tp=2 inside the host), matching multihost_factors'
layout (tp inside a host, hosts data-parallel)."""

import os
import socket
import subprocess
import sys
import tempfile

import pytest

_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
coord = sys.argv[2]
out_path = sys.argv[3]

from inferflow_tpu.parallel.mesh import init_distributed, make_multihost_mesh

init_distributed(coord, num_processes=2, process_id=proc_id)

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

mesh = make_multihost_mesh(tp=2)
assert mesh.shape == {"dp": 2, "pp": 1, "tp": 2}, mesh.shape

B, K, N = 8, 32, 16
rng = np.random.default_rng(0)  # same seed on both hosts
x_np = rng.standard_normal((B, K)).astype(np.float32)
w_np = rng.standard_normal((K, N)).astype(np.float32)

x_sh = NamedSharding(mesh, P("dp", None))
w_sh = NamedSharding(mesh, P(None, "tp"))
x = jax.make_array_from_callback((B, K), x_sh, lambda idx: x_np[idx])
w = jax.make_array_from_callback((K, N), w_sh, lambda idx: w_np[idx])

@jax.jit
def f(x, w):
    return jnp.tanh(x @ w)

y = f(x, w)  # (B, N) sharded (dp, tp) — XLA inserts the collectives
from jax.experimental import multihost_utils
y_full = multihost_utils.process_allgather(y, tiled=True)
ref = np.tanh(x_np @ w_np)
err = float(np.max(np.abs(np.asarray(y_full).reshape(B, N) - ref)))
assert err < 1e-5, err

# explicit cross-host collective: psum over 'dp' rides DCN
from jax.experimental.shard_map import shard_map
@jax.jit
def g(x):
    def body(xs):
        return jax.lax.psum(xs, "dp")
    return shard_map(body, mesh=mesh, in_specs=P("dp", None),
                     out_specs=P(None, None))(x)

s = g(x)
s_local = np.asarray(s.addressable_shards[0].data)
ref_s = x_np.reshape(2, B // 2, K).sum(axis=0)
assert np.allclose(s_local, ref_s, atol=1e-5)

with open(out_path + f".{proc_id}", "w") as fh:
    fh.write("ok")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = str(tmp_path / "result")
    coord = f"127.0.0.1:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # replace any inherited PYTHONPATH entries so the worker imports THIS
    # repo's package (site-packages dirs are unaffected; JAX_PLATFORMS=cpu
    # is what forces CPU devices)
    env.update({
        "PYTHONPATH": repo,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_NUM_CPU_DEVICES": "2",
    })
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), coord, out],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(2)]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout.decode("utf-8", "replace"))
    for i, (p, text) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {i} failed:\n{text[-3000:]}"
        assert os.path.isfile(out + f".{i}")
