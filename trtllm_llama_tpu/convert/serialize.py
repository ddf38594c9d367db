"""Engine checkpoint directory format.

The TPU analogue of the reference's engine artifacts: where TensorRT-LLM
serializes a per-rank TRT engine + config.json (builder.py:240-267), our
"engine" is the weight artifact — a directory of pre-quantized, pre-packed
arrays plus config.json. XLA compilation is cached separately by JAX; no
graph is serialized.

Layout:
  <dir>/config.json      ModelConfig (+ engine metadata: kv_scales, format)
  <dir>/manifest.json    leaf name -> {dtype, shape, container meta}
  <dir>/arrays/<name>.npy

bfloat16 leaves are stored as uint16 bit patterns (npy has no bf16) and
restored by view; int4 weights are stored in their packed int8 form.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from ..config import ModelConfig
from ..quantization.tensors import FP8Weight, SQWeight, WOQWeight

# v2: int4 pack layout changed to the bit-plant quartered interleave and
# fp8 weights gained interleave_block row permutation (both consumed by the
# SWAR bf16 bit-plant matmul decodes) — v1 dirs hold the old byte order and
# must be re-converted.
_FORMAT_VERSION = 2


def _leaf_name(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return ".".join(parts)


def _save_array(arrays_dir, name, arr):
    arr = np.asarray(arr)
    meta = {"shape": list(arr.shape)}
    if arr.dtype == ml_dtypes.bfloat16:
        meta["dtype"] = "bfloat16"
        arr = arr.view(np.uint16)
    else:
        meta["dtype"] = str(arr.dtype)
    np.save(os.path.join(arrays_dir, name + ".npy"), arr)
    return meta


def _load_array(arrays_dir, name, meta):
    arr = np.load(os.path.join(arrays_dir, name + ".npy"))
    if meta["dtype"] == "bfloat16":
        arr = arr.view(ml_dtypes.bfloat16)
    return arr


def save_engine(out_dir: str, cfg: ModelConfig, params,
                kv_scales: Optional[np.ndarray] = None):
    arrays_dir = os.path.join(out_dir, "arrays")
    os.makedirs(arrays_dir, exist_ok=True)

    manifest = {"format_version": _FORMAT_VERSION, "leaves": {},
                "containers": {}}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = _leaf_name(path)
        manifest["leaves"][name] = _save_array(arrays_dir, name, leaf)

    def check_encodable(tree, prefix=""):
        # leaf names are '.'-joined dict keys; anything else (keys with
        # '.', list/tuple nodes holding quant containers) would round-trip
        # into a DIFFERENT structure — fail at save time, not at load
        if isinstance(tree, (WOQWeight, SQWeight, FP8Weight, dict)):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    if not isinstance(k, str) or "." in k:
                        raise ValueError(
                            f"engine dir cannot encode dict key {k!r} "
                            f"under {prefix!r} (string keys without '.' "
                            "only)")
                    check_encodable(v, f"{prefix}.{k}" if prefix else k)
            return
        if isinstance(tree, (list, tuple)):
            raise ValueError(
                f"engine dir cannot encode list/tuple node under "
                f"{prefix!r} — use dicts (the name<->path mapping is "
                "dict-key based)")

    check_encodable(params)

    def record_containers(tree, prefix=""):
        if isinstance(tree, WOQWeight):
            manifest["containers"][prefix] = {
                "type": "WOQWeight", "w_bits": tree.w_bits,
                "group_size": tree.group_size, "pack_block": tree.pack_block}
        elif isinstance(tree, SQWeight):
            manifest["containers"][prefix] = {
                "type": "SQWeight", "per_channel": tree.per_channel,
                "per_token": tree.per_token}
        elif isinstance(tree, FP8Weight):
            manifest["containers"][prefix] = {
                "type": "FP8Weight",
                "interleave_block": tree.interleave_block}
        elif isinstance(tree, dict):
            for k, v in tree.items():
                record_containers(v, f"{prefix}.{k}" if prefix else k)

    record_containers(params)

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    engine_meta = {"model_config": json.loads(cfg.to_json())}
    if kv_scales is not None:
        engine_meta["kv_scales"] = np.asarray(kv_scales).tolist()
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(engine_meta, f, indent=1)


def load_engine(engine_dir: str
                ) -> Tuple[ModelConfig, dict, Optional[np.ndarray]]:
    with open(os.path.join(engine_dir, "manifest.json")) as f:
        _mf_version = json.load(f).get("format_version")
    if _mf_version != _FORMAT_VERSION:
        raise ValueError(
            f"engine dir format_version {_mf_version} != supported "
            f"{_FORMAT_VERSION} — re-run convert_checkpoint.py")
    with open(os.path.join(engine_dir, "config.json")) as f:
        engine_meta = json.load(f)
    cfg = ModelConfig.from_json(json.dumps(engine_meta["model_config"]))
    kv_scales = (np.asarray(engine_meta["kv_scales"], np.float32)
                 if "kv_scales" in engine_meta else None)
    with open(os.path.join(engine_dir, "manifest.json")) as f:
        manifest = json.load(f)
    arrays_dir = os.path.join(engine_dir, "arrays")

    # rebuild nested dict of raw leaves
    root: dict = {}
    for name, meta in manifest["leaves"].items():
        parts = name.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(_load_array(arrays_dir, name, meta))

    # re-wrap containers
    def wrap(node, prefix=""):
        if isinstance(node, dict):
            cmeta = manifest["containers"].get(prefix)
            if cmeta is not None:
                if cmeta["type"] == "WOQWeight":
                    return WOQWeight(node["qweight"], node["scale"],
                                     cmeta["w_bits"], cmeta["group_size"],
                                     cmeta["pack_block"])
                if cmeta["type"] == "SQWeight":
                    return SQWeight(node["qweight"], node["scale_w"],
                                    node["scale_x"], node["scale_y"],
                                    cmeta["per_channel"], cmeta["per_token"])
                if cmeta["type"] == "FP8Weight":
                    return FP8Weight(node["qweight"], node["scale"],
                                     cmeta.get("interleave_block", 0))
            return {k: wrap(v, f"{prefix}.{k}" if prefix else k)
                    for k, v in node.items()}
        return node

    params = wrap(root)
    return cfg, params, kv_scales
