"""Param/cache sharding rules: the engine-wide TP layout.

The TPU-native equivalent of the reference's ColumnLinear/RowLinear weight
splitting (layers/linear.py, examples/llama/weight.py TP shard logic): instead
of physically splitting weights per rank at build time, every param leaf gets
a PartitionSpec and GSPMD materializes the shards + inserts the collectives:

  wq/wk/wv, w_gate/w_up : column-parallel — output features over 'tp'
                          (heads shard for attention, ffn shard for MLP)
  wo, w_down            : row-parallel — input features over 'tp'; XLA emits
                          the psum the reference does with ncclAllReduce
  lm_head               : column-parallel over vocab
  embed, norms          : replicated
  KV cache              : kv-heads over 'tp', batch over 'dp'

Quantized containers shard coherently: qweight shards like the fp weight it
replaces; per-channel scales shard with the output dim on column-parallel
weights and stay replicated on row-parallel ones; grouped scales follow the
qweight's K blocking.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..quantization.tensors import SQWeight, WOQWeight

_COL_KEYS = ("wq", "wk", "wv", "w_gate", "w_up")
_ROW_KEYS = ("wo", "w_down")


def _leaf_spec(path, leaf, pp: bool = False, ep: bool = False) -> P:
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    name = next((k for k in keys if k in _COL_KEYS + _ROW_KEYS
                 + ("embed", "lm_head")), None)
    field = keys[-1] if keys else None   # dataclass field for quant containers
    # pipeline parallel: every stacked layer leaf ([L, ...]) shards its
    # leading L axis over 'pp' (each stage holds only its own layers)
    stacked = pp and "layers" in keys
    # expert parallel: MoE expert weights are [L, E, in, out] — 4D col/row
    # leaves shard their E axis over 'ep' (models/moe.py). Their container
    # scales are 3D [L, E, channels]: under an ep mesh, any 3D scale leaf
    # is an expert scale (expert quantization is per-channel only, and
    # dense projections' scales are 2D), so its axis 1 is E, not K/g.
    expert = ep and "layers" in keys and (
        leaf.ndim == 4
        or (leaf.ndim == 3 and field in ("scale", "scale_w")))

    def spec(*axes):
        axes = list(axes)
        if stacked and axes[0] is None:
            axes[0] = "pp"
        if expert and len(axes) >= 2:
            axes[1] = "ep"
        return P(*axes)

    nd = leaf.ndim
    if name in _COL_KEYS:
        if field in ("scale", "scale_w"):
            # per-channel [L, N] or grouped [L, K/g, N]: N is sharded
            return spec(*([None] * (nd - 1)), "tp")
        if field in ("scale_x", "scale_y"):
            return spec(*([None] * nd))
        return spec(*([None] * (nd - 1)), "tp")       # [L, K, N] col
    if name in _ROW_KEYS:
        if field in ("scale", "scale_w"):
            if nd >= 3:                               # grouped [L, K/g, N]
                return spec(*([None] * (nd - 2)), "tp", None)
            return spec(*([None] * nd))               # per-channel: replicated
        if field in ("scale_x", "scale_y"):
            return spec(*([None] * nd))
        return spec(*([None] * (nd - 2)), "tp", None)  # [L, K, N] row
    if name == "lm_head":
        return P(None, "tp")
    if stacked:                                       # norms under layers
        return spec(*([None] * nd))
    return P(*([None] * nd))                          # embed, norms: replicated


def param_specs(params, pp: bool = False, ep: bool = False):
    """Pytree of PartitionSpecs matching the params structure."""
    import functools
    return jax.tree_util.tree_map_with_path(
        functools.partial(_leaf_spec, pp=pp, ep=ep), params)


def param_shardings(cfg: ModelConfig, mesh, params=None):
    """NamedShardings for params. When params is None, returns a function
    applied lazily by jax.device_put via tree mapping on the real pytree."""
    shape = dict(mesh.shape)
    pp = shape.get("pp", 1) > 1
    ep = shape.get("ep", 1) > 1
    if params is None:
        def make(p):
            specs = param_specs(p, pp=pp, ep=ep)
            return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                is_leaf=lambda x: isinstance(x, P))
        return make
    specs = param_specs(params, pp=pp, ep=ep)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
