"""Device mesh + parallel layout.

TPU-native replacement for the reference's `Mapping` (tensorrt_llm/mapping.py,
TP-only, world_size == tp_size) and its NCCL/MPI machinery
(plugins/ncclPlugin, _utils.py:181-192). On TPU there is no comm bootstrap:
we build one `jax.sharding.Mesh` and annotate arrays with `NamedSharding`;
XLA/GSPMD inserts the collectives over ICI (intra-slice) / DCN (inter-slice).

Axis convention:
  'dp'  — data/batch replicas (reference has none; we support it)
  'sp'  — sequence parallel: prefill activations sharded over the prompt
          axis (reference has none — its long-context story is packed
          inputs + multi-block decode, SURVEY §2.6; here long prompts can
          additionally spread over chips). With `shard_kv_seq` the KV cache
          S axis is sharded too (distributed flash-decode: GSPMD reduces
          the attention over sp).
  'pp'  — pipeline parallel: the layer stack sharded over stages
          (reference has send/recv graph ops but pp_size=1 hardcoded,
          runtime/generation.py:179 — never used). Stages exchange
          activations with ppermute inside a shard_map pipeline
          (parallel/pipeline.py), microbatched over the batch axis.
  'tp'  — tensor parallel (the reference's only axis)
The PartitionSpec helpers below are the single source of truth for how every
tensor in the engine is laid out.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class Mapping:
    """Parallel layout description: how many ways each axis is sharded."""

    dp: int = 1
    tp: int = 1
    sp: int = 1
    pp: int = 1
    # expert parallel: MoE expert weights ([L, E, ...]) sharded over 'ep'
    # on the E axis (models/moe.py); GSPMD turns the expert-summed combine
    # einsum into a psum over ep. Non-MoE models ignore the axis.
    ep: int = 1
    # Shard the KV cache sequence axis over 'sp' (context-parallel decode:
    # each sp shard holds an S/sp cache slab; attention scores psum/concat
    # over sp is GSPMD-inserted). Off by default — the scatter KV writes
    # cross shard boundaries and cost collectives per step.
    shard_kv_seq: bool = False

    @property
    def world_size(self) -> int:
        return self.dp * self.pp * self.sp * self.ep * self.tp

    def make_mesh(self, devices=None) -> Mesh:
        devices = np.asarray(devices if devices is not None else jax.devices())
        if devices.size < self.world_size:
            raise ValueError(
                f"need {self.world_size} devices, have {devices.size}")
        devices = devices.reshape(self.dp, self.pp, self.sp, self.ep,
                                  self.tp)
        return Mesh(devices, axis_names=("dp", "pp", "sp", "ep", "tp"))

    # ---- PartitionSpecs: the engine-wide sharding contract ----
    # Weight layouts follow the reference's column/row pattern
    # (layers/linear.py:79-95,131-137): column-parallel shards the output
    # features over tp; row-parallel shards the input features over tp and the
    # output is psum-reduced (XLA inserts the reduce from these annotations).

    @staticmethod
    def col(ndim: int = 2) -> P:
        """Column-parallel weight [in, out]: shard out (last dim) over tp."""
        return P(*([None] * (ndim - 1) + ["tp"]))

    @staticmethod
    def row(ndim: int = 2) -> P:
        """Row-parallel weight [in, out]: shard in (second-to-last) over tp."""
        return P(*([None] * (ndim - 2) + ["tp", None]))

    @staticmethod
    def replicated(ndim: int = 1) -> P:
        return P(*([None] * ndim))

    @staticmethod
    def activations(ndim: int = 3) -> P:
        """[batch, seq, hidden]: batch over dp, hidden replicated."""
        return P(*(["dp"] + [None] * (ndim - 1)))

    def seq_activations(self, ndim: int = 3) -> P:
        """Prefill activations [batch, seq, ...]: batch over dp, seq over sp."""
        return P("dp" if self.dp > 1 else None,
                 "sp" if self.sp > 1 else None,
                 *([None] * (ndim - 2)))

    def kv_cache(self) -> P:
        """Stacked KV cache [L, B, H_kv, S, D]: heads over tp, batch over dp,
        optionally S over sp (context-parallel decode)."""
        return P(None, "dp", "tp",
                 "sp" if (self.sp > 1 and self.shard_kv_seq) else None, None)

    def shardings(self, mesh: Mesh, specs):
        """Map a pytree of PartitionSpecs to NamedShardings."""
        return jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))


def single_device_mapping() -> Mapping:
    return Mapping(dp=1, tp=1)


def local_mesh_1x1() -> Mesh:
    return Mapping().make_mesh(jax.devices()[:1])
