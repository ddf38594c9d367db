"""ChatGLM-6B state dict -> engine params (models/chatglm.py layout).

transformers has no ChatGLM class (upstream THUDM/chatglm-6b is
trust_remote_code), so this converter works on the raw state dict — the
layout the reference's example consumes through its vendored
modeling_chatglm.py (examples/chatglm6b/hf_chatglm6b_convert.py semantics):
`transformer.layers.N.attention.query_key_value` is head-interleaved
[head, (q,k,v), head_dim] on the output axis, de-interleaved here into the
engine's separate stacked wq/wk/wv.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from .hf import _n
from .hf_families import _split_fused_qkv, _stack


def config_from_chatglm(num_layers=28, hidden_size=4096, num_heads=32,
                        vocab_size=130528, max_positions=2048,
                        layernorm_eps=1e-5, **over) -> ModelConfig:
    d = dict(
        vocab_size=vocab_size, hidden_size=hidden_size,
        intermediate_size=4 * hidden_size, num_layers=num_layers,
        num_heads=num_heads, num_kv_heads=num_heads,
        head_dim=hidden_size // num_heads,
        max_position_embeddings=max_positions, rms_norm_eps=layernorm_eps)
    d.update(over)
    return ModelConfig(**d)


def params_from_chatglm_state_dict(sd, cfg: ModelConfig, dtype=None):
    dt = jnp.dtype(dtype) if dtype else cfg.jnp_dtype
    l = cfg.num_layers
    pre = "transformer.layers.{}."

    w_qkv = _stack(sd, pre + "attention.query_key_value.weight", l)
    b_qkv = _stack(sd, pre + "attention.query_key_value.bias", l)
    (wq, wk, wv), (bq, bk, bv) = _split_fused_qkv(
        w_qkv, b_qkv, cfg.num_heads, cfg.head_dim)

    def tr(fmt):
        return np.stack([_n(sd[fmt.format(i)]).T for i in range(l)])

    layers = {
        "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
        "wo": tr(pre + "attention.dense.weight"),
        "bo": _stack(sd, pre + "attention.dense.bias", l),
        "ln1_w": _stack(sd, pre + "input_layernorm.weight", l),
        "ln1_b": _stack(sd, pre + "input_layernorm.bias", l),
        "ln2_w": _stack(sd, pre + "post_attention_layernorm.weight", l),
        "ln2_b": _stack(sd, pre + "post_attention_layernorm.bias", l),
        "w_fc": tr(pre + "mlp.dense_h_to_4h.weight"),
        "b_fc": _stack(sd, pre + "mlp.dense_h_to_4h.bias", l),
        "w_proj": tr(pre + "mlp.dense_4h_to_h.weight"),
        "b_proj": _stack(sd, pre + "mlp.dense_4h_to_h.bias", l),
    }
    return {
        "embedding": jnp.asarray(_n(sd["transformer.word_embeddings.weight"]),
                                 dt),
        "layers": {k: jnp.asarray(v, dt) for k, v in layers.items()},
        "final_norm_w": jnp.asarray(
            _n(sd["transformer.final_layernorm.weight"]), dt),
        "final_norm_b": jnp.asarray(
            _n(sd["transformer.final_layernorm.bias"]), dt),
        "lm_head": jnp.asarray(_n(sd["lm_head.weight"]).T, dt),
    }
