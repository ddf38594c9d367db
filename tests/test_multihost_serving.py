"""Multi-host continuous batching: true 2-process serving test.

The last north-star clause — "continuous batching scheduled across hosts"
(reference GptManager.h:48-89 drives requests from one rank; the engine's
design doc is docs/serving.md): process 0 owns submit()/cancel() and
broadcasts the op stream at step boundaries (_sync_ops); both processes
execute the identical SPMD step over a tp mesh spanning the two hosts.

Assertions:
  * both processes produce bit-identical finished streams,
  * the streams equal a single-process unsharded reference engine's,
  * a cancel and a late submit ride the same broadcast protocol,
  * shutdown() releases the follower's follow loop.
"""

import json
import os
import socket
import subprocess
import sys

_WORKER = r"""
import json
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # sitecustomize forces axon
import jax.numpy as jnp

pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ref_mode = pid < 0          # pid -1: single-process unsharded reference

if not ref_mode:      # must precede any backend-touching JAX call
    from trtllm_llama_tpu.parallel.multihost import (
        initialize, pod_mapping, pod_mesh)
    initialize(coordinator_address=addr, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.serving import ServingEngine

cfg = ModelConfig.tiny(dtype="float32")
params = llama.init_params(cfg, jax.random.PRNGKey(5))
ecfg = EngineConfig(max_batch_size=3, max_input_len=16, max_seq_len=32)
scfg = SamplingConfig(end_id=-1)
rng = np.random.default_rng(7)
prompts = [rng.integers(3, 250, (n,)).tolist() for n in (5, 9, 12, 6)]
budgets = [6, 5, 7, 4]

if ref_mode:
    engine = ServingEngine(cfg, params, ecfg, sampling=scfg, decode_chunk=3)
else:
    mesh = pod_mesh(tp=jax.device_count(), dp=1)   # tp spans both hosts
    engine = ServingEngine(cfg, params, ecfg, sampling=scfg, decode_chunk=3,
                           mapping=pod_mapping(mesh), mesh=mesh)
    assert engine.multihost

done = {}
if ref_mode or pid == 0:
    # submit 3, step once, cancel one mid-flight, submit a 4th, drain
    rids = [engine.submit(p, b) for p, b in zip(prompts[:3], budgets[:3])]
    for fr in engine.step():
        done[fr.request_id] = fr
    engine.cancel(rids[1])           # multihost: applies at next step
    rids.append(engine.submit(prompts[3], budgets[3]))
    done.update(engine.run_to_completion())
    if not ref_mode:
        engine.shutdown()
    assert rids[1] not in done       # cancelled
    out = {str(r): [done[r].output_ids, done[r].finished_reason]
           for r in rids if r in done}
else:
    # follower: lockstep steps until process 0 broadcasts shutdown
    while not engine._stopped:
        for fr in engine.step():
            done[fr.request_id] = fr
    out = {str(r): [done[r].output_ids, done[r].finished_reason]
           for r in sorted(done)}
print("RESULT " + json.dumps(out, sort_keys=True))
print(f"WORKER_OK {pid}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in:\n{out}")


def test_two_process_serving(tmp_path):
    nproc = 2
    addr = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    # single-process unsharded reference first (pid -1)
    ref = subprocess.run(
        [sys.executable, str(script), "-1", "1", "unused"],
        capture_output=True, text=True, env=env, cwd=root, timeout=300)
    assert ref.returncode == 0, ref.stdout + ref.stderr
    ref_out = _result(ref.stdout)
    assert len(ref_out) == 3         # 4 submitted, 1 cancelled

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(nproc), addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=root) for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()       # exact PIDs we spawned, never by pattern
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
    res = [_result(o) for o in outs]
    # scheduler host and follower saw bit-identical finished streams...
    assert res[0] == res[1]
    # ...equal to the single-process unsharded engine's
    assert res[0] == ref_out
