"""True multi-process jax.distributed tests (2 'hosts' on CPU).

SURVEY §4's lesson: the reference never tests multi-GPU behavior (only
manual mpirun, examples/gpt/README.md:164-196); this harness does what it
couldn't — spawn two real processes, bootstrap them through
parallel.multihost.initialize (the MPI/NCCL-unique-id-broadcast analogue,
allreducePlugin.cpp:126-160), build the global pod mesh, and run jitted
cross-process collectives + a TP-sharded matmul, asserting identical
results on every process.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # sitecustomize forces axon
import jax.numpy as jnp

pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from trtllm_llama_tpu.parallel.multihost import (
    initialize, is_scheduler_host, pod_mesh)

initialize(coordinator_address=addr, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid
assert is_scheduler_host() == (pid == 0)

mesh = pod_mesh()           # dp = processes (DCN analogue), tp = local devs
n = jax.device_count()
assert mesh.shape["dp"] * mesh.shape["tp"] == n
assert mesh.shape["dp"] == nproc

from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

# 1. global psum across every device of every process
ones = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp", "tp")),
    np.ones((mesh.shape["dp"] // nproc, mesh.shape["tp"]), np.float32),
    (mesh.shape["dp"], mesh.shape["tp"]))
total = jax.jit(shard_map(
    lambda x: jax.lax.psum(jnp.sum(x), ("dp", "tp")),
    mesh=mesh, in_specs=P("dp", "tp"), out_specs=P()))(ones)
assert float(np.asarray(total)) == float(n), total

# 2. TP-sharded matmul (ColumnLinear pattern, linear.py:79-95): w sharded
#    over 'tp', output replicated — every process must hold the full,
#    identical product.
rng = np.random.default_rng(0)          # same seed everywhere
x_np = rng.standard_normal((4, 16)).astype(np.float32)
w_np = rng.standard_normal((16, 8 * mesh.shape["tp"])).astype(np.float32)

repl = NamedSharding(mesh, P())
x = jax.make_array_from_process_local_data(repl, x_np, x_np.shape)
w = jax.device_put(
    jax.make_array_from_process_local_data(repl, w_np, w_np.shape),
    NamedSharding(mesh, P(None, "tp")))
y = jax.jit(lambda a, b: a @ b, out_shardings=repl)(x, w)
np.testing.assert_allclose(np.asarray(y), x_np @ w_np, atol=1e-4)

# 3. the engine's own model forward, jitted over the global mesh: every
#    process must produce the same logits as a purely-local run.
from trtllm_llama_tpu.config import ModelConfig
from trtllm_llama_tpu.models import llama

cfg = ModelConfig.tiny(dtype="float32")
params = llama.init_params(cfg, jax.random.PRNGKey(0))   # same seed -> same
ids = np.asarray(np.random.default_rng(0).integers(3, 250, (2, 8)))

# local single-device reference (addressable device 0)
caches = llama.init_caches(cfg, 2, 16)
ref_logits, _ = llama.forward_prefill(
    params, cfg, jnp.asarray(ids), jnp.full((2,), 8, jnp.int32), caches)
ref_logits = np.asarray(ref_logits)

# global replicated run across both processes
def glob(a):
    return jax.make_array_from_process_local_data(repl, np.asarray(a),
                                                  np.shape(a))
g_params = jax.tree.map(glob, params)
g_caches = jax.tree.map(glob, llama.init_caches(cfg, 2, 16))
g_logits, _ = jax.jit(
    lambda p, i, l, c: llama.forward_prefill(p, cfg, i, l, c),
    out_shardings=(repl, repl))(
        g_params, glob(ids), glob(np.full((2,), 8, np.int32)), g_caches)
np.testing.assert_allclose(np.asarray(g_logits), ref_logits, atol=1e-4)

print(f"WORKER_OK {pid}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    nproc = 2
    addr = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 2 virtual devices per process: global mesh = 2 hosts x 2 devices
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(nproc), addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=root) for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()       # exact PIDs we spawned, never by pattern
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
