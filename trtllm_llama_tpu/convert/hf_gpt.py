"""HF GPT-2 checkpoint -> engine params (models/gpt.py layout).

Note HF GPT-2 uses Conv1D modules whose weights are already [in, out]
(no transpose needed, unlike nn.Linear), and a fused c_attn [D, 3D] that we
split into wq/wk/wv.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from .hf import _n


def config_from_hf_gpt2(hf_cfg, **over) -> ModelConfig:
    d = dict(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.n_embd,
        intermediate_size=4 * hf_cfg.n_embd,
        num_layers=hf_cfg.n_layer,
        num_heads=hf_cfg.n_head,
        num_kv_heads=hf_cfg.n_head,
        head_dim=hf_cfg.n_embd // hf_cfg.n_head,
        max_position_embeddings=hf_cfg.n_positions,
        tie_word_embeddings=True,
    )
    d.update(over)
    return ModelConfig(**d)


def params_from_hf_gpt2(hf_model, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    l, d = cfg.num_layers, cfg.hidden_size

    def stack(fmt):
        return np.stack([_n(sd[fmt.format(i)]) for i in range(l)])

    c_attn_w = stack("transformer.h.{}.attn.c_attn.weight")    # [L, D, 3D]
    c_attn_b = stack("transformer.h.{}.attn.c_attn.bias")      # [L, 3D]
    wq, wk, wv = np.split(c_attn_w, 3, axis=-1)
    bq, bk, bv = np.split(c_attn_b, 3, axis=-1)

    layers = {
        "ln1_w": stack("transformer.h.{}.ln_1.weight"),
        "ln1_b": stack("transformer.h.{}.ln_1.bias"),
        "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
        "wo": stack("transformer.h.{}.attn.c_proj.weight"),
        "bo": stack("transformer.h.{}.attn.c_proj.bias"),
        "ln2_w": stack("transformer.h.{}.ln_2.weight"),
        "ln2_b": stack("transformer.h.{}.ln_2.bias"),
        "w_fc": stack("transformer.h.{}.mlp.c_fc.weight"),
        "b_fc": stack("transformer.h.{}.mlp.c_fc.bias"),
        "w_proj": stack("transformer.h.{}.mlp.c_proj.weight"),
        "b_proj": stack("transformer.h.{}.mlp.c_proj.bias"),
    }
    embed = _n(sd["transformer.wte.weight"])
    return {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": jnp.asarray(_n(sd["transformer.wpe.weight"]), dtype),
        "layers": {k: jnp.asarray(v, dtype) for k, v in layers.items()},
        "final_ln_w": jnp.asarray(_n(sd["transformer.ln_f.weight"]), dtype),
        "final_ln_b": jnp.asarray(_n(sd["transformer.ln_f.bias"]), dtype),
        "lm_head": jnp.asarray(embed.T, dtype),
    }
