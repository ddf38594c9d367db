"""Multi-host execution: process bootstrap + pod-slice meshes.

Replaces the reference's MPI/Slurm orchestration (mpi4py rank bootstrap
_utils.py:181-192, NCCL unique-id broadcast allreducePlugin.cpp:126-160,
Slurm launch examples/gpt/README.md:164-196) with the JAX-native flow:

  1. every host calls `initialize()` (jax.distributed under the hood —
     coordinator discovery via args or TPU pod metadata, no MPI),
  2. builds the same global mesh with `pod_mesh()`: intra-host/slice chips
     on the fast 'tp' (ICI) axis, hosts/slices on the 'dp' (DCN) axis,
  3. runs the same SPMD jitted program; GSPMD keeps TP collectives on ICI
     and only batch-parallel traffic crosses DCN.

There is no rank-0 special casing for compute: all hosts trace and run the
identical program. Host-side serving (runtime/serving.py) designates
process_index 0 as the scheduler; slot assignments ride to other hosts as
replicated scalars inside the jitted step inputs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from .mapping import Mapping


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Bootstrap the multi-host runtime. On TPU pods all arguments are
    auto-discovered from the metadata server; set them explicitly for
    CPU/GPU multi-process tests."""
    # Detect prior initialization WITHOUT touching jax.process_count():
    # process_count() instantiates the local backend, after which
    # jax.distributed.initialize() raises — every host would then silently
    # fall through to single-process mode on a real pod.
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return                      # already initialized
    explicit = coordinator_address is not None
    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        if explicit:
            raise                   # caller asked for a real cluster — fail loud
        # auto-discovery on a single host (tests, one process): nothing to do


def pod_mesh(tp: Optional[int] = None, dp: Optional[int] = None,
             sp: int = 1, pp: int = 1, ep: int = 1) -> Mesh:
    """Global mesh over all devices of all hosts.

    Defaults: 'tp' spans the devices of one host/slice (ICI-connected),
    'dp' spans hosts (DCN). Pass tp/dp/sp/pp to override (dp*pp*sp*tp must
    equal the global device count; sp*tp should divide the per-slice chip
    count so the TP/SP collectives never cross DCN — 'pp' and 'dp' are the
    axes meant to span slices, pipeline transfers and batch traffic being
    the DCN-tolerant ones).
    """
    n = jax.device_count()
    local = max(jax.local_device_count(), 1)
    tp = tp or local // (sp * ep) or local
    dp = dp or n // (pp * sp * ep * tp)
    if dp * pp * sp * ep * tp != n:
        raise ValueError(
            f"dp*pp*sp*ep*tp = {dp}*{pp}*{sp}*{ep}*{tp} "
            f"!= device_count {n}")
    devices = np.array(jax.devices()).reshape(dp, pp, sp, ep, tp)
    return Mesh(devices, axis_names=("dp", "pp", "sp", "ep", "tp"))


def pod_mapping(mesh: Mesh) -> Mapping:
    shape = dict(mesh.shape)
    return Mapping(dp=shape["dp"], tp=shape["tp"], sp=shape.get("sp", 1),
                   pp=shape.get("pp", 1), ep=shape.get("ep", 1))


def overlap_xla_flags(chunk_bytes: int = 1 << 20, apply: bool = False,
                      backend: str = "gpu") -> str:
    """The XLA flag that preserves collective/compute overlap.

    The sharded row-parallel matmuls emit `overlap_chunks` independent
    all-reduces (ops/linear.py::_row_overlap) so the latency-hiding
    scheduler can overlap chunk c's reduce with chunk c+1's compute. XLA's
    all-reduce COMBINER can re-merge them; capping its threshold at ~1 MB
    keeps the multi-MB prefill chunks separate while still letting tiny
    decode-step reduces combine.

    Flag spellings are backend-specific and an UNKNOWN flag in $XLA_FLAGS
    aborts the process at parse time, so nothing is applied automatically:
    call with apply=True (before the first backend-touching JAX call) with
    the backend whose spelling your build accepts — this jaxlib registers
    the 'xla_gpu_' spelling; TPU builds take the combiner threshold through
    libtpu's flag set. Returns the flag string either way."""
    import os

    flag = (f"--xla_{backend}_all_reduce_combine_threshold_bytes"
            f"={chunk_bytes}")
    cur = os.environ.get("XLA_FLAGS", "")
    if apply and "all_reduce_combine_threshold_bytes" not in cur:
        os.environ["XLA_FLAGS"] = (cur + " " + flag).strip()
    return flag


def is_scheduler_host() -> bool:
    """The serving layer's scheduler runs on process 0 (SPMD compute is
    identical everywhere; only host-side request bookkeeping is pinned)."""
    return jax.process_index() == 0
